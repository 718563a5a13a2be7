"""Native twisted-Edwards ECC gadgets + in-circuit MSM.

Mirror of `relation/src/gadgets/ecc/mod.rs:29-498` (TEPoint, PointVariable,
point select / equality / neutral / on-curve / add, fixed-base and
variable-base scalar mul) and `relation/src/gadgets/ecc/msm.rs:20-345`
(naive + Pippenger in-circuit MSM with lookup-backed point tables).

The curve is passed explicitly as a `TECurve` (utils/te_curve.py) instead of
a Rust type parameter; point witnesses are host ints, so this is pure
host-side circuit construction.
"""

from __future__ import annotations

from typing import NamedTuple

from .. import gates as G
from ..circuit import PlonkCircuit, BoolVar, CircuitError
from ...utils.te_curve import TECurve


class PointVariable(NamedTuple):
    """Witness indices of a TE point's (x, y) coordinates."""
    x: int
    y: int


# -- point variable management (ecc/mod.rs:134-263) ---------------------------

def point_witness(cs: PlonkCircuit, pv: PointVariable):
    return (cs.witness_of(pv.x), cs.witness_of(pv.y))


def create_point_variable(cs: PlonkCircuit, pt) -> PointVariable:
    return PointVariable(cs.create_variable(pt[0]), cs.create_variable(pt[1]))


def create_constant_point_variable(cs: PlonkCircuit, pt) -> PointVariable:
    return PointVariable(cs.create_constant_variable(pt[0]),
                         cs.create_constant_variable(pt[1]))


def create_public_point_variable(cs: PlonkCircuit, pt) -> PointVariable:
    return PointVariable(cs.create_public_variable(pt[0]),
                         cs.create_public_variable(pt[1]))


def quaternary_point_select(cs: PlonkCircuit, b0: BoolVar, b1: BoolVar,
                            p1, p2, p3) -> PointVariable:
    """Select P_{b0+2 b1} from (neutral, p1, p2, p3) constant points
    (ecc/mod.rs:179-215)."""
    cs.check_vars([int(b0), int(b1)])
    w0 = cs.witness_of(int(b0)) == 1
    w1 = cs.witness_of(int(b1)) == 1
    sel = {(False, False): (0, 1), (True, False): tuple(p1),
           (False, True): tuple(p2), (True, True): tuple(p3)}[(w0, w1)]
    out = create_point_variable(cs, sel)
    p = cs.p
    cs.insert_gate([int(b0), int(b1), 0, 0, out.x],
                   G.QuaternaryPointSelectXGate(p, p1[0], p2[0], p3[0]))
    cs.insert_gate([int(b0), int(b1), 0, 0, out.y],
                   G.QuaternaryPointSelectYGate(p, p1[1], p2[1], p3[1]))
    return out


def binary_point_vars_select(cs: PlonkCircuit, b: BoolVar,
                             point0: PointVariable,
                             point1: PointVariable) -> PointVariable:
    """b ? point1 : point0 (ecc/mod.rs:221-234)."""
    return PointVariable(cs.mux(b, point1.x, point0.x),
                         cs.mux(b, point1.y, point0.y))


def enforce_point_equal(cs: PlonkCircuit, p0: PointVariable, p1: PointVariable):
    cs.enforce_equal(p0.x, p1.x)
    cs.enforce_equal(p0.y, p1.y)


def is_point_equal(cs: PlonkCircuit, p0: PointVariable,
                   p1: PointVariable) -> BoolVar:
    x_eq = cs.is_equal(p0.x, p1.x)
    y_eq = cs.is_equal(p0.y, p1.y)
    return cs.logic_and(x_eq, y_eq)


def inverse_point(cs: PlonkCircuit, pv: PointVariable) -> PointVariable:
    return PointVariable(cs.sub(cs.zero(), pv.x), pv.y)


def neutral_point_variable(cs: PlonkCircuit) -> PointVariable:
    return PointVariable(cs.zero(), cs.one())


def neutral_point_gate(cs: PlonkCircuit, pv: PointVariable,
                       expected_neutral: BoolVar):
    """expected = (x == 0) * (y == 1) (ecc/mod.rs:286-301)."""
    b_x = cs.is_equal(pv.x, cs.zero())
    b_y = cs.is_equal(pv.y, cs.one())
    cs.mul_gate(int(b_x), int(b_y), int(expected_neutral))


def is_neutral_point(cs: PlonkCircuit, pv: PointVariable) -> BoolVar:
    b = cs.create_boolean_variable(point_witness(cs, pv) == (0, 1))
    neutral_point_gate(cs, pv, b)
    return b


def enforce_on_curve(cs: PlonkCircuit, curve: TECurve, pv: PointVariable):
    """a x^2 + y^2 = 1 + d x^2 y^2 in one gate (ecc/mod.rs:332-345)."""
    cs.insert_gate([pv.x, pv.x, pv.y, pv.y, cs.one()],
                   G.EdwardsCurveEquationGate(cs.p, curve.a, curve.d))


# -- point addition (ecc/mod.rs:352-401) --------------------------------------

def ecc_add_gate(cs: PlonkCircuit, curve: TECurve, pa: PointVariable,
                 pb: PointVariable, pc: PointVariable):
    p = cs.p
    cs.insert_gate([pa.x, pb.y, pb.x, pa.y, pc.x],
                   G.CurvePointXAdditionGate(p, curve.a, curve.d))
    cs.insert_gate([pa.x, pb.x, pa.y, pb.y, pc.y],
                   G.CurvePointYAdditionGate(p, curve.a, curve.d))


def ecc_add(cs: PlonkCircuit, curve: TECurve, pa: PointVariable,
            pb: PointVariable) -> PointVariable:
    p3 = curve.add(point_witness(cs, pa), point_witness(cs, pb))
    pc = create_point_variable(cs, p3)
    ecc_add_gate(cs, curve, pa, pb, pc)
    return pc


# -- fixed-base scalar mul (ecc/mod.rs:405-448, 518-578) ----------------------

def _compute_base_points(curve: TECurve, base, n: int):
    """{4^i B}, {2*4^i B}, {3*4^i B} for i in 0..n-1."""
    b2 = curve.add(base, base)
    b3 = curve.add(b2, base)
    out = [[base], [b2], [b3]]
    for row in out:
        for _ in range(1, n):
            dbl = curve.add(row[-1], row[-1])
            row.append(curve.add(dbl, dbl))
    return out


def fixed_base_scalar_mul(cs: PlonkCircuit, curve: TECurve, scalar: int,
                          base) -> PointVariable:
    """scalar * Base with 2-bit windowed precomputed tables
    (ecc/mod.rs:405-448)."""
    cs.check_var(scalar)
    num_bits = curve.order.bit_length()
    num_bits += num_bits & 1
    bits_le = cs.unpack(scalar, num_bits)
    bases = _compute_base_points(curve, tuple(base), num_bits // 2)
    accum = neutral_point_variable(cs)
    for i in range(num_bits // 2):
        sel = quaternary_point_select(cs, bits_le[2 * i], bits_le[2 * i + 1],
                                      bases[0][i], bases[1][i], bases[2][i])
        accum = ecc_add(cs, curve, accum, sel)
    return accum


# -- variable-base scalar mul (ecc/mod.rs:454-498) ----------------------------

def variable_base_scalar_mul(cs: PlonkCircuit, curve: TECurve, scalar: int,
                             base: PointVariable) -> PointVariable:
    cs.check_vars([scalar, base.x, base.y])
    return msm_gadget(cs, curve, [base], [scalar])


def variable_base_binary_scalar_mul(cs: PlonkCircuit, curve: TECurve,
                                    scalar_bits_le, base: PointVariable
                                    ) -> PointVariable:
    """Double-and-add over an explicit little-endian bit vector
    (ecc/mod.rs:480-498)."""
    neutral = neutral_point_variable(cs)
    accum = neutral
    for i in reversed(range(len(scalar_bits_le))):
        z = binary_point_vars_select(cs, scalar_bits_le[i], neutral, base)
        accum = ecc_add(cs, curve, accum, accum)
        accum = ecc_add(cs, curve, accum, z)
    return accum


# -- in-circuit MSM (ecc/msm.rs) ----------------------------------------------

def msm_gadget(cs: PlonkCircuit, curve: TECurve, bases, scalars,
               scalar_bit_length: int | None = None) -> PointVariable:
    """sum_i scalars[i] * bases[i]; Pippenger under UltraPlonk lookup,
    naive double-and-add otherwise (msm.rs:49-84)."""
    if len(bases) != len(scalars):
        raise CircuitError("msm: bases/scalars length mismatch")
    if scalar_bit_length is None:
        scalar_bit_length = curve.order.bit_length()
    if cs.support_lookup():
        return _msm_pippenger(cs, curve, bases, scalars, scalar_bit_length)
    return _msm_naive(cs, curve, bases, scalars, scalar_bit_length)


def _msm_naive(cs: PlonkCircuit, curve: TECurve, bases, scalars,
               scalar_bit_length: int) -> PointVariable:
    """msm.rs:125-150."""
    bits0 = cs.unpack(scalars[0], scalar_bit_length)
    res = variable_base_binary_scalar_mul(cs, curve, bits0, bases[0])
    for base, scalar in zip(bases[1:], scalars[1:]):
        bits = cs.unpack(scalar, scalar_bit_length)
        tmp = variable_base_binary_scalar_mul(cs, curve, bits, base)
        res = ecc_add(cs, curve, res, tmp)
    return res


def _ln_without_floats(a: int) -> int:
    # ark_std::log2(a) * 69 / 100 (msm.rs:352-356)
    log2 = (a - 1).bit_length() if a > 1 else 0
    return max(1, log2 * 69 // 100)


def _decompose_scalar_var(cs: PlonkCircuit, scalar_var: int, c: int,
                          scalar_bit_length: int):
    """s = sum 2^{cj} s_j with c-bit digits (msm.rs:299-327)."""
    m = (scalar_bit_length - 1) // c + 1
    val = cs.witness_of(scalar_var)
    digits = []
    for _ in range(m):
        digits.append(cs.create_variable(val % (1 << c)))
        val >>= c
    cs.decomposition_gate(digits, scalar_var, 1 << c)
    return digits


def _msm_pippenger(cs: PlonkCircuit, curve: TECurve, bases, scalars,
                   scalar_bit_length: int) -> PointVariable:
    """Windowed MSM with per-base lookup point tables (msm.rs:189-276)."""
    c = 3 if scalar_bit_length < 32 else _ln_without_floats(scalar_bit_length)
    zero_pt = neutral_point_variable(cs)
    window_sums: list = []
    for base_var, scalar_var in zip(bases, scalars):
        digit_vars = _decompose_scalar_var(cs, scalar_var, c,
                                           scalar_bit_length)
        # table [0*B, 1*B, ..., (2^c - 1)*B] as point variables
        table = [zero_pt, base_var]
        for _ in range((1 << c) - 2):
            table.append(ecc_add(cs, curve, base_var, table[-1]))
        # looked-up digit*B points (witness only; constrained by the table)
        base_pt = point_witness(cs, base_var)
        lookup_pts = []
        for dv in digit_vars:
            pt = curve.mul(base_pt, cs.witness_of(dv))
            lookup_pts.append(create_point_variable(cs, pt))
        cs.create_table_and_lookup_variables(
            [(dv, pv.x, pv.y) for dv, pv in zip(digit_vars, lookup_pts)],
            [(pv.x, pv.y) for pv in table])
        if not window_sums:
            window_sums = lookup_pts
        else:
            window_sums = [ecc_add(cs, curve, ws, lp)
                           for ws, lp in zip(window_sums, lookup_pts)]
    lowest = window_sums[0]
    total = zero_pt
    for sum_i in reversed(window_sums[1:]):
        total = ecc_add(cs, curve, total, sum_i)
        for _ in range(c):
            total = ecc_add(cs, curve, total, total)
    return ecc_add(cs, curve, lowest, total)


for _f in (point_witness, create_point_variable, create_constant_point_variable,
           create_public_point_variable, quaternary_point_select,
           binary_point_vars_select, enforce_point_equal, is_point_equal,
           inverse_point, neutral_point_variable, neutral_point_gate,
           is_neutral_point, enforce_on_curve, ecc_add_gate, ecc_add,
           fixed_base_scalar_mul, variable_base_scalar_mul,
           variable_base_binary_scalar_mul, msm_gadget):
    setattr(PlonkCircuit, _f.__name__, _f)
