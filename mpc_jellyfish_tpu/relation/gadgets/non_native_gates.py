"""Non-native power/linear circuits built on FpElemVar mod_arith.

Mirror of `relation/src/gadgets/ultraplonk/non_native_gates.rs:24-195`:
x^5 / x^11 over a smaller target field T (used by the non-native Rescue
gadget) and inner-product-plus-constant.
"""

from __future__ import annotations

from .mod_arith import FpElem, FpElemVar
from ..circuit import PlonkCircuit, CircuitError


def _target_fp_elem(cs: PlonkCircuit, t_modulus: int, m: int) -> FpElem:
    if t_modulus.bit_length() >= cs.p.bit_length():
        raise CircuitError("target field not smaller than native field")
    return FpElem.new(t_modulus, m, cs.p.bit_length())


def non_native_power_11_gate(cs: PlonkCircuit, t_modulus: int, x: FpElemVar,
                             x_to_11: FpElemVar):
    """Enforce x^11 == x_to_11 over F_t (non_native_gates.rs:24-46)."""
    y = non_native_power_11_gen(cs, t_modulus, x)
    cs.enforce_equal(x_to_11.v0, y.v0)
    cs.enforce_equal(x_to_11.v1, y.v1)


def non_native_power_11_gen(cs: PlonkCircuit, t_modulus: int,
                            x: FpElemVar) -> FpElemVar:
    """x^11 over F_t in 5 mod_mul (non_native_gates.rs:56-87)."""
    p = _target_fp_elem(cs, t_modulus, x.m)
    x2 = cs.mod_mul(x, x, p)
    x3 = cs.mod_mul(x2, x, p)
    x4 = cs.mod_mul(x2, x2, p)
    x8 = cs.mod_mul(x4, x4, p)
    return cs.mod_mul(x3, x8, p)


def non_native_power_5_gen(cs: PlonkCircuit, t_modulus: int,
                           x: FpElemVar) -> FpElemVar:
    """x^5 over F_t in 3 mod_mul (non_native_gates.rs:96-124)."""
    p = _target_fp_elem(cs, t_modulus, x.m)
    x2 = cs.mod_mul(x, x, p)
    x3 = cs.mod_mul(x2, x, p)
    return cs.mod_mul(x2, x3, p)


def non_native_linear_gen(cs: PlonkCircuit, t_modulus: int, x, y, c) -> FpElemVar:
    """inner_product(x, y) + c over F_t; y, c are FpElem constants
    (non_native_gates.rs:133-194)."""
    if len(x) != len(y):
        raise CircuitError("x/y length mismatch")
    m = c.m
    p = _target_fp_elem(cs, t_modulus, m)
    xiyi = [cs.mod_mul_constant(xi, yi, p) for xi, yi in zip(x, y)]
    s = cs.mod_add_vec(xiyi, p)
    return cs.mod_add_constant(s, c, p)


for _f in (non_native_power_11_gate, non_native_power_11_gen,
           non_native_power_5_gen, non_native_linear_gen):
    setattr(PlonkCircuit, _f.__name__, _f)
