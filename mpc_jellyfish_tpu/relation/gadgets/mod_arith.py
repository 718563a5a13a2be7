"""UltraPlonk 2-limb non-native modular arithmetic (FpElem / FpElemVar).

Mirror of `relation/src/gadgets/ultraplonk/mod_arith.rs:26-850`.  A non-native
value q is split q = q0 + 2^m q1 so cross-limb products stay below the native
modulus; mod_add/mod_mul prove z + w*p = x*y with lookup-range-checked limbs,
quotient and carries.  Used by the recursive Plonk verifier circuit
(`plonk/src/circuit/plonk_verifier/`).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..circuit import PlonkCircuit, CircuitError


@dataclass(frozen=True)
class FpElem:
    """p = p0 + 2^m * p1 (host ints; mod_arith.rs:33-80)."""
    p0: int
    p1: int
    m: int

    @classmethod
    def new(cls, val: int, m: int, field_bits: int) -> "FpElem":
        if m > field_bits // 2:
            raise CircuitError("FpElem: m > field bits / 2")
        return cls(p0=val % (1 << m) if m else val, p1=val >> m, m=m)

    def field_elem(self) -> int:
        return self.p0 + (self.p1 << self.m)


class FpElemVar:
    """Variables (v0, v1) with value w[v0] + 2^m w[v1] (mod_arith.rs:87)."""

    __slots__ = ("v0", "v1", "m")

    def __init__(self, v0: int, v1: int, m: int):
        self.v0, self.v1, self.m = v0, v1, m

    @classmethod
    def new_unchecked(cls, cs: PlonkCircuit, var: int, m: int) -> "FpElemVar":
        fe = FpElem.new(cs.witness_of(var), m, cs.p.bit_length())
        v0 = cs.create_variable(fe.p0)
        v1 = cs.create_variable(fe.p1)
        cs.lc_gate([v0, v1, 0, 0, var], [1, pow(2, m, cs.p), 0, 0])
        return cls(v0, v1, m)

    @classmethod
    def new_from_field_element(cls, cs: PlonkCircuit, f: int,
                               m: int) -> "FpElemVar":
        fe = FpElem.new(f, m, cs.p.bit_length())
        return cls.new_from_fp_elem(cs, fe, m)

    @classmethod
    def new_from_fp_elem(cls, cs: PlonkCircuit, fe: FpElem,
                         m: int) -> "FpElemVar":
        v0 = cs.create_variable(fe.p0)
        v1 = cs.create_variable(fe.p1)
        cs.range_gate_with_lookup(v0, m)
        cs.range_gate_with_lookup(v1, m)
        return cls(v0, v1, m)

    @classmethod
    def zero(cls, cs: PlonkCircuit, m: int) -> "FpElemVar":
        return cls(cs.zero(), cs.zero(), m)

    @classmethod
    def one(cls, cs: PlonkCircuit, m: int) -> "FpElemVar":
        return cls(cs.one(), cs.zero(), m)

    def convert_to_var(self, cs: PlonkCircuit) -> int:
        return cs.lc([self.v0, self.v1, 0, 0], [1, pow(2, self.m, cs.p), 0, 0])

    def witness(self, cs: PlonkCircuit) -> int:
        return (cs.witness_of(self.v0)
                + (cs.witness_of(self.v1) << self.m)) % cs.p

    def witness_fp_elem(self, cs: PlonkCircuit) -> FpElem:
        return FpElem(cs.witness_of(self.v0), cs.witness_of(self.v1), self.m)

    def components(self):
        return (self.v0, self.v1)

    def enforce_equal(self, cs: PlonkCircuit, other: "FpElemVar"):
        if self.m != other.m:
            raise CircuitError("FpElemVar m mismatch")
        cs.enforce_equal(self.v0, other.v0)
        cs.enforce_equal(self.v1, other.v1)


def num_range_blocks(cs: PlonkCircuit) -> int:
    """Minimal l with range_size^l >= p (ultraplonk/range.rs:60)."""
    return cs.p.bit_length() // cs.range_bit_len() + 1


def _check_m(cs, *elems):
    m = elems[0].m
    for e in elems[1:]:
        if e.m != m:
            raise CircuitError("FpElem split parameters do not match")
    if m % cs.range_bit_len() != 0:
        raise CircuitError("m is not a multiple of range_bit_len")
    return m


def mod_add_internal(cs: PlonkCircuit, vars_, p: int, l_p: int) -> int:
    """y = sum(vars) mod p with a range-checked quotient
    (mod_arith.rs:238-293)."""
    rbl = cs.range_bit_len()
    sum_x = sum(cs.witness_of(v) for v in vars_) % cs.p
    z, y = sum_x // p, sum_x % p
    if z >= cs.range_size():
        raise CircuitError("mod_add quotient out of range")
    z_var = cs.create_variable(z)
    cs.range_gate_with_lookup(z_var, rbl)
    y_var = cs.create_variable(y)
    cs.range_gate_with_lookup(y_var, rbl * l_p)

    padded = [z_var] + list(vars_)
    rate = 3
    padded_len = ((len(padded) - 1 + rate - 1) // rate) * rate + 1
    padded += [cs.zero()] * (padded_len - len(padded))
    accum = padded[padded_len - 1]
    for i in range(1, padded_len // rate):
        accum = cs.lc([accum, padded[padded_len - 1 - rate * i + 2],
                       padded[padded_len - 1 - rate * i + 1],
                       padded[padded_len - 1 - rate * i]], [1, 1, 1, 1])
    cs.lc_gate([accum, padded[2], padded[1], padded[0], y_var],
               [1, 1, 1, (-p) % cs.p])
    return y_var


def mod_add(cs: PlonkCircuit, x: FpElemVar, y: FpElemVar,
            p: FpElem) -> FpElemVar:
    """z = x + y mod p (mod_arith.rs:297-336)."""
    m = _check_m(cs, x, y, p)
    x_var = x.convert_to_var(cs)
    y_var = y.convert_to_var(cs)
    res = mod_add_internal(cs, [x_var, y_var], p.field_elem(),
                           num_range_blocks(cs))
    return FpElemVar.new_unchecked(cs, res, m)


def mod_add_constant(cs: PlonkCircuit, x: FpElemVar, y: FpElem,
                     p: FpElem) -> FpElemVar:
    """z = x + const_y mod p (mod_arith.rs:345-426)."""
    m = _check_m(cs, x, y, p)
    x_var = x.convert_to_var(cs)
    y_f, p_f = y.field_elem(), p.field_elem()
    s = cs.witness_of(x_var) + y_f
    divisor, remainder = s // p_f, s % p_f
    if divisor >= cs.range_size():
        raise CircuitError("mod_add_constant quotient out of range")
    divisor_var = cs.create_variable(divisor)
    cs.range_gate_with_lookup(divisor_var, cs.range_bit_len())
    remainder_var = cs.create_variable(remainder)
    cs.range_gate_with_lookup(remainder_var,
                              cs.range_bit_len() * num_range_blocks(cs))
    # x - remainder - p*divisor + y = 0
    cs.quad_poly_gate([x_var, remainder_var, divisor_var, 0, 0],
                      [1, -1, -p_f, 0], [0, 0], 0, y_f)
    return FpElemVar.new_unchecked(cs, remainder_var, m)


def mod_add_vec(cs: PlonkCircuit, xs, p: FpElem) -> FpElemVar:
    """z = sum xs mod p (mod_arith.rs:430-465)."""
    m = _check_m(cs, *xs, p)
    x_vars = [x.convert_to_var(cs) for x in xs]
    res = mod_add_internal(cs, x_vars, p.field_elem(), num_range_blocks(cs))
    return FpElemVar.new_unchecked(cs, res, m)


def mod_mul(cs: PlonkCircuit, x: FpElemVar, y: FpElemVar,
            p: FpElem) -> FpElemVar:
    """z = x * y mod p via z + w p = x y with 2-limb carries
    (mod_arith.rs:471-645)."""
    m = _check_m(cs, x, y, p)
    rbl = cs.range_bit_len()
    fp = cs.p
    two_m = 1 << m
    fbits = fp.bit_length()

    x0, x1 = cs.witness_of(x.v0), cs.witness_of(x.v1)
    y0, y1 = cs.witness_of(y.v0), cs.witness_of(y.v1)
    p0, p1 = p.p0, p.p1
    x_int, y_int, p_int = x0 + two_m * x1, y0 + two_m * y1, p.field_elem()
    xy = x_int * y_int
    w_int = xy // p_int
    z_int = xy - w_int * p_int
    w = FpElem.new(w_int, m, fbits)
    z = FpElem.new(z_int, m, fbits)

    # carries (nonneg by construction; mod_arith.rs:529-560)
    x0y0 = x0 * y0
    z0_p0w0 = z.p0 + p0 * w.p0
    if z0_p0w0 >= x0y0:
        c0 = two_m + (z0_p0w0 - x0y0) // two_m
    else:
        c0 = two_m - (x0y0 - z0_p0w0) // two_m
    a_int = x0 * y1 + x1 * y0 + two_m
    b_int = z.p1 + p0 * w.p1 + p1 * w.p0 + c0
    if b_int >= a_int:
        c1 = 2 * two_m + (b_int - a_int) // two_m
    else:
        c1 = 2 * two_m - (a_int - b_int) // two_m

    w0v = cs.create_variable(w.p0)
    w1v = cs.create_variable(w.p1)
    z0v = cs.create_variable(z.p0)
    z1v = cs.create_variable(z.p1)
    c0v = cs.create_variable(c0)
    c1v = cs.create_variable(c1)
    for v in (w0v, w1v, z0v, z1v):
        cs.range_gate_with_lookup(v, m)
    cs.range_gate_with_lookup(c0v, m + rbl)
    cs.range_gate_with_lookup(c1v, m + rbl)

    tm = two_m % fp
    # Eq.(3): x0y0 - p0w0 + 2^m c0 - 2^{2m} = z0
    cs.quad_poly_gate([x.v0, y.v0, w0v, c0v, z0v],
                      [0, 0, -p0, tm], [1, 0], 1, -(tm * tm) % fp)
    # Eq.(4.2): t1 = x0y1 + x1y0
    t1 = cs.mul_add([x.v0, y.v1, x.v1, y.v0], [1, 1])
    # Eq.(4.3): t2 = p0w1 + p1w0
    t2 = cs.lc([w1v, w0v, 0, 0], [p0, p1, 0, 0])
    # Eq.(4.1): t1 - t2 - c0 + 2^m c1 - 2^{2m+1} + 2^m = z1
    cs.quad_poly_gate([t1, t2, c0v, c1v, z1v],
                      [1, -1, -1, tm], [0, 0], 1,
                      (tm - 2 * tm * tm) % fp)
    # Eq.(5): x1y1 - p1w1 + 2^{m+1} = c1
    cs.quad_poly_gate([x.v1, y.v1, w1v, 0, c1v],
                      [0, 0, -p1, 0], [1, 0], 1, 2 * tm % fp)
    return FpElemVar(z0v, z1v, m)


def mod_mul_constant(cs: PlonkCircuit, x: FpElemVar, y: FpElem,
                     p: FpElem) -> FpElemVar:
    """z = x * const_y mod p (mod_arith.rs:649-815)."""
    m = _check_m(cs, x, y, p)
    rbl = cs.range_bit_len()
    fp = cs.p
    two_m = 1 << m
    fbits = fp.bit_length()

    x0, x1 = cs.witness_of(x.v0), cs.witness_of(x.v1)
    y0, y1 = y.p0, y.p1
    p0, p1 = p.p0, p.p1
    x_int, y_int, p_int = x0 + two_m * x1, y.field_elem(), p.field_elem()
    xy = x_int * y_int
    w_int = xy // p_int
    z_int = xy - w_int * p_int
    w = FpElem.new(w_int, m, fbits)
    z = FpElem.new(z_int, m, fbits)

    x0y0 = x0 * y0
    z0_p0w0 = z.p0 + p0 * w.p0
    if z0_p0w0 >= x0y0:
        c0 = two_m + (z0_p0w0 - x0y0) // two_m
    else:
        c0 = two_m - (x0y0 - z0_p0w0) // two_m
    a_int = x0 * y1 + x1 * y0 + two_m
    b_int = z.p1 + p0 * w.p1 + p1 * w.p0 + c0
    if b_int >= a_int:
        c1 = 2 * two_m + (b_int - a_int) // two_m
    else:
        c1 = 2 * two_m - (a_int - b_int) // two_m

    w0v = cs.create_variable(w.p0)
    w1v = cs.create_variable(w.p1)
    z0v = cs.create_variable(z.p0)
    z1v = cs.create_variable(z.p1)
    c0v = cs.create_variable(c0)
    c1v = cs.create_variable(c1)
    for v in (w0v, w1v, z0v, z1v):
        cs.range_gate_with_lookup(v, m)
    cs.range_gate_with_lookup(c0v, m + rbl)
    cs.range_gate_with_lookup(c1v, m + rbl)

    tm = two_m % fp
    # Eq.(3): y0 x0 - p0 w0 + 2^m c0 - z0 - 2^{2m} = 0
    cs.quad_poly_gate([x.v0, w0v, c0v, z0v, 0],
                      [y0, -p0, tm, -1], [0, 0], 0, -(tm * tm) % fp)
    # Eq.(4.2): t = y1 x0 + y0 x1 - p0 w1 - p1 w0
    t1 = cs.lc([x.v0, x.v1, w1v, w0v], [y1, y0, -p0, -p1])
    # Eq.(4.1): t - z1 - c0 + 2^m c1 - 2^{2m+1} + 2^m = 0
    cs.quad_poly_gate([t1, z1v, c0v, c1v, 0],
                      [1, -1, -1, tm], [0, 0], 0,
                      (tm - 2 * tm * tm) % fp)
    # Eq.(5): y1 x1 - p1 w1 - c1 + 2^{m+1} = 0
    cs.quad_poly_gate([x.v1, w1v, c1v, 0, 0],
                      [y1, -p1, -1, 0], [0, 0], 0, 2 * tm % fp)
    return FpElemVar(z0v, z1v, m)


def mod_negate(cs: PlonkCircuit, x: FpElemVar, p: int) -> FpElemVar:
    """-x mod p (mod_arith.rs:817-848)."""
    if x.m % cs.range_bit_len() != 0:
        raise CircuitError("m is not a multiple of range_bit_len")
    x_int = cs.witness_of(x.v0) + (cs.witness_of(x.v1) << x.m)
    if x_int >= p:
        raise CircuitError("non native field overflow")
    x_var = x.convert_to_var(cs)
    x_neg = cs.create_variable(p - x_int)
    cs.lc_gate([x_var, x_neg, cs.one(), 0, 0], [1, 1, (-p) % cs.p, 0])
    return FpElemVar.new_unchecked(cs, x_neg, x.m)


for _f in (mod_add_internal, mod_add, mod_add_constant, mod_add_vec, mod_mul,
           mod_mul_constant, mod_negate, num_range_blocks):
    setattr(PlonkCircuit, _f.__name__, _f)
