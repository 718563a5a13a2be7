"""Arithmetic gadget extras: power-11 and truncation.

Mirror of `relation/src/gadgets/arithmetic.rs:78-290` (power_11_gen/gate use
the q_hash FifthRoot selector; truncate proves b == a mod 2^bit_length via a
quotient decomposition with lookup-backed range checks).
"""

from __future__ import annotations

from .. import gates as G
from ..circuit import PlonkCircuit, CircuitError


def power_11_gen(cs: PlonkCircuit, x: int) -> int:
    """x^11 in 3 constraints (arithmetic.rs:78-90)."""
    cs.check_var(x)
    x5 = cs.pow5(x)
    x10 = cs.mul(x5, x5)
    return cs.mul(x10, x)


def power_11_gate(cs: PlonkCircuit, x: int, x_to_11: int):
    """Constrain x_to_11 == x^11 (arithmetic.rs:94-108)."""
    cs.check_vars([x, x_to_11])
    x5 = cs.pow5(x)
    x10 = cs.mul(x5, x5)
    cs.mul_gate(x10, x, x_to_11)


def truncate(cs: PlonkCircuit, a: int, bit_length: int) -> int:
    """b = a mod 2^bit_length (arithmetic.rs:112-122)."""
    cs.check_var(a)
    b_val = cs.witness_of(a) % (1 << bit_length)
    b = cs.create_variable(b_val)
    truncate_gate(cs, a, b, bit_length)
    return b


def truncate_gate(cs: PlonkCircuit, a: int, b: int, bit_length: int):
    """Constrain b == a mod 2^bit_length (arithmetic.rs:127-290).

    Write a = b + z * 2^bit_length with z < 2^(nbits - bit_length); split b
    and z into lookup-range-checked low parts and binary-range-checked
    leftovers.
    """
    if not cs.support_lookup():
        raise CircuitError("truncate requires an UltraPlonk circuit")
    cs.check_vars([a, b])
    modulus = 1 << bit_length
    a_val, b_val = cs.witness_of(a), cs.witness_of(b)
    if b_val >= modulus:
        raise CircuitError("truncate: b >= 2^bit_length")
    nbits = cs.p.bit_length()
    if nbits <= bit_length:
        raise CircuitError("truncate: bit_length >= field bits")

    rbl = cs.range_bit_len()
    bl_non_lookup = bit_length % rbl
    bl_lookup = bit_length - bl_non_lookup
    delta = nbits - bit_length
    dl_non_lookup = delta % rbl
    dl_lookup = delta - dl_non_lookup

    b1 = b_val % (1 << bl_lookup)
    b2 = b_val >> bl_lookup
    z = (a_val - b_val) // modulus
    z1 = z % (1 << dl_lookup)
    z2 = z >> dl_lookup

    b1_var = cs.create_variable(b1)
    b2_var = cs.create_variable(b2)
    z1_var = cs.create_variable(z1)
    z2_var = cs.create_variable(z2)

    # b = b1 + b2 * 2^bl_lookup
    cs.lc_gate([b1_var, b2_var, 0, 0, b], [1, 1 << bl_lookup, 0, 0])
    # a = b + 2^bit_length * z1 + 2^bit_length * 2^dl_lookup * z2
    cs.lc_gate([b, z1_var, z2_var, 0, a],
               [1, modulus, modulus * (1 << dl_lookup) % cs.p, 0])
    if bl_lookup:
        cs.range_gate_with_lookup(b1_var, bl_lookup)
    if bl_non_lookup:
        cs.enforce_in_range(b2_var, bl_non_lookup)
    if dl_lookup:
        cs.range_gate_with_lookup(z1_var, dl_lookup)
    if dl_non_lookup:
        cs.enforce_in_range(z2_var, dl_non_lookup)


for _f in (power_11_gen, power_11_gate, truncate, truncate_gate):
    setattr(PlonkCircuit, _f.__name__, _f)
