"""Comparison gadgets: lt / leq / gt / geq (+ constant variants).

Mirror of the reference `relation/src/gadgets/cmp.rs:14-150`.  The scheme
splits the field at (p-1)/2: compare MSB-halves first, and when both operands
fall in the same half compare `a - b` against (p-1)/2 (a wraparound detector).
All building blocks are existing PlonkCircuit gadgets (unpack, logic ops), so
this module is pure host-side circuit construction.
"""

from __future__ import annotations

from ..circuit import PlonkCircuit, BoolVar


def _half(p: int) -> int:
    return (p - 1) // 2


def _msb_check_internal(cs: PlonkCircuit, a: int, b: int):
    """(a <= (p-1)/2 and b > (p-1)/2, both-in-same-half) — cmp.rs:186-205."""
    half = _half(cs.p)
    a_gt = _is_gt_constant_internal(cs, a, half)
    b_gt = _is_gt_constant_internal(cs, b, half)
    a_leq = cs.logic_neg(a_gt)
    msb_check = cs.logic_and(a_leq, b_gt)
    msb_eq = cs.is_equal(int(a_gt), int(b_gt))
    return msb_check, msb_eq


def _is_lt_internal(cs: PlonkCircuit, a: int, b: int) -> BoolVar:
    """cmp.rs:208-217."""
    msb_check, msb_eq = _msb_check_internal(cs, a, b)
    c = cs.sub(a, b)
    cmp_result = _is_gt_constant_internal(cs, c, _half(cs.p))
    cmp_result = cs.logic_and(msb_eq, cmp_result)
    return cs.logic_or(msb_check, cmp_result)


def _enforce_lt_internal(cs: PlonkCircuit, a: int, b: int):
    """cmp.rs:220-228."""
    msb_check, msb_eq = _msb_check_internal(cs, a, b)
    c = cs.sub(a, b)
    cmp_result = _is_gt_constant_internal(cs, c, _half(cs.p))
    cmp_result = cs.logic_and(msb_eq, cmp_result)
    cs.logic_or_gate(msb_check, cmp_result)


def _is_gt_constant_internal(cs: PlonkCircuit, a: int, constant: int) -> BoolVar:
    """Bitwise ladder comparison against a constant (cmp.rs:231-263).

    Walk bits LSB->MSB, skipping the run of low 1-bits of the constant; then
    OR for constant-bit 0, AND for constant-bit 1.
    """
    nbits = cs.p.bit_length()
    a_bits_le = cs.unpack(a, nbits)
    const_bits = [(constant >> i) & 1 for i in range(nbits)]
    i = 0
    while i < nbits and const_bits[i]:
        i += 1
    if i >= nbits:
        return BoolVar(cs.zero())
    current = a_bits_le[i]
    for j in range(i + 1, nbits):
        if const_bits[j]:
            current = cs.logic_and(a_bits_le[j], current)
        else:
            current = cs.logic_or(a_bits_le[j], current)
    return current


# -- public API (methods on PlonkCircuit) ------------------------------------

def enforce_lt(cs: PlonkCircuit, a: int, b: int):
    cs.check_vars([a, b])
    _enforce_lt_internal(cs, a, b)


def enforce_leq(cs: PlonkCircuit, a: int, b: int):
    c = cs.is_lt(b, a)
    cs.enforce_constant(int(c), 0)


def enforce_gt(cs: PlonkCircuit, a: int, b: int):
    cs.enforce_lt(b, a)


def enforce_geq(cs: PlonkCircuit, a: int, b: int):
    c = cs.is_lt(a, b)
    cs.enforce_constant(int(c), 0)


def is_lt(cs: PlonkCircuit, a: int, b: int) -> BoolVar:
    cs.check_vars([a, b])
    return _is_lt_internal(cs, a, b)


def is_gt(cs: PlonkCircuit, a: int, b: int) -> BoolVar:
    return cs.is_lt(b, a)


def is_leq(cs: PlonkCircuit, a: int, b: int) -> BoolVar:
    c = _is_lt_internal(cs, b, a)
    return cs.logic_neg(c)


def is_geq(cs: PlonkCircuit, a: int, b: int) -> BoolVar:
    c = _is_lt_internal(cs, a, b)
    return cs.logic_neg(c)


def is_lt_constant(cs: PlonkCircuit, a: int, val: int) -> BoolVar:
    b = cs.create_constant_variable(val)
    return cs.is_lt(a, b)


def is_leq_constant(cs: PlonkCircuit, a: int, val: int) -> BoolVar:
    b = cs.create_constant_variable(val)
    return cs.is_leq(a, b)


def is_gt_constant(cs: PlonkCircuit, a: int, val: int) -> BoolVar:
    cs.check_var(a)
    return _is_gt_constant_internal(cs, a, val % cs.p)


def is_geq_constant(cs: PlonkCircuit, a: int, val: int) -> BoolVar:
    b = cs.create_constant_variable(val)
    return cs.is_geq(a, b)


def enforce_lt_constant(cs: PlonkCircuit, a: int, val: int):
    b = cs.create_constant_variable(val)
    cs.enforce_lt(a, b)


def enforce_leq_constant(cs: PlonkCircuit, a: int, val: int):
    b = cs.create_constant_variable(val)
    cs.enforce_leq(a, b)


def enforce_gt_constant(cs: PlonkCircuit, a: int, val: int):
    b = cs.create_constant_variable(val)
    cs.enforce_gt(a, b)


def enforce_geq_constant(cs: PlonkCircuit, a: int, val: int):
    b = cs.create_constant_variable(val)
    cs.enforce_geq(a, b)


for _f in (enforce_lt, enforce_leq, enforce_gt, enforce_geq, is_lt, is_gt,
           is_leq, is_geq, is_lt_constant, is_leq_constant, is_gt_constant,
           is_geq_constant, enforce_lt_constant, enforce_leq_constant,
           enforce_gt_constant, enforce_geq_constant):
    setattr(PlonkCircuit, _f.__name__, _f)
