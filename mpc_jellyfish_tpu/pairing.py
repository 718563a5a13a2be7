"""Host-side pairing for BN254 / BLS12-381 (verification path).

TPU-native framework design choice: the prover never computes pairings; they
appear only in `verify` (2-pairing product check, SURVEY.md §3.2 /
`utilities/src/multi_pairing.rs:13`).  We therefore run them on the host with
exact integer arithmetic, using the **Tate pairing** with a full-exponent
final exponentiation:

    e(P, Q) = f_{r,P}(psi(Q)) ^ ((q^12 - 1) / r)

where psi untwists a G2 point onto E(Fq12).  This avoids the optimal-ate
Frobenius/twist-correction subtleties entirely at the cost of a ~2x longer
Miller loop and a large (but host-cheap) final pow.  Bilinearity and
non-degeneracy are the only properties the verifier needs.  A C++
optimal-ate custom call is the planned speedup (SURVEY.md §7 step 3).
"""

from __future__ import annotations

import functools

from .curves import CurveSpec
from .utils import fq_tower as T
from .utils.ec_host import AffinePoint


class G2Point:
    """Affine G2 point over Fq2: coords are (c0, c1) int pairs."""

    __slots__ = ("x", "y", "inf")

    def __init__(self, x=(0, 0), y=(0, 0), inf=False):
        self.x, self.y, self.inf = tuple(x), tuple(y), inf

    @staticmethod
    def infinity():
        return G2Point((0, 0), (0, 0), True)

    def __eq__(self, other):
        if self.inf or other.inf:
            return self.inf == other.inf
        return self.x == other.x and self.y == other.y

    def __repr__(self):
        return "G2Inf" if self.inf else f"G2({self.x}, {self.y})"


def _xi(curve: CurveSpec):
    """Fq6 = Fq2[v]/(v^3 - xi): the sextic-twist element per curve."""
    if curve.name == "bn254":
        return (9, 1)
    if curve.name == "bls12_381":
        return (1, 1)
    if curve.name == "bls12_377":
        return (0, 1)     # xi = u (u^2 = -5)
    raise ValueError(curve.name)


def _twist_type(curve: CurveSpec) -> str:
    return "M" if curve.name == "bls12_381" else "D"


# -- G2 host arithmetic over Fq2 --------------------------------------------

def g2_add(curve: CurveSpec, a: G2Point, b: G2Point) -> G2Point:
    p = curve.fq.p
    if a.inf:
        return b
    if b.inf:
        return a
    if a.x == b.x:
        if T.f2_add(p, a.y, b.y) == T.F2_ZERO:
            return G2Point.infinity()
        num = T.f2_scalar(p, T.f2_mul(p, a.x, a.x), 3)
        den = T.f2_scalar(p, a.y, 2)
    else:
        num = T.f2_sub(p, b.y, a.y)
        den = T.f2_sub(p, b.x, a.x)
    lam = T.f2_mul(p, num, T.f2_inv(p, den))
    x3 = T.f2_sub(p, T.f2_sub(p, T.f2_mul(p, lam, lam), a.x), b.x)
    y3 = T.f2_sub(p, T.f2_mul(p, lam, T.f2_sub(p, a.x, x3)), a.y)
    return G2Point(x3, y3)


def g2_neg(curve: CurveSpec, a: G2Point) -> G2Point:
    if a.inf:
        return a
    return G2Point(a.x, T.f2_neg(curve.fq.p, a.y))


def g2_mul(curve: CurveSpec, a: G2Point, k: int) -> G2Point:
    if k < 0:
        return g2_mul(curve, g2_neg(curve, a), -k)
    result = G2Point.infinity()
    base = a
    while k:
        if k & 1:
            result = g2_add(curve, result, base)
        base = g2_add(curve, base, base)
        k >>= 1
    return result


def g2_generator(curve: CurveSpec) -> G2Point:
    (x0, x1), (y0, y1) = curve.g2_gen
    return G2Point((x0, x1), (y0, y1))


def g2_on_curve(curve: CurveSpec, pt: G2Point) -> bool:
    if pt.inf:
        return True
    p = curve.fq.p
    lhs = T.f2_mul(p, pt.y, pt.y)
    rhs = T.f2_add(p, T.f2_mul(p, pt.x, T.f2_mul(p, pt.x, pt.x)), tuple(c % p for c in curve.b2))
    return lhs == rhs


# -- untwist G2 -> E(Fq12) ---------------------------------------------------

def _embed_fq2(a):
    return ((tuple(a), T.F2_ZERO, T.F2_ZERO), T.F6_ZERO)


_W = (T.F6_ZERO, T.F6_ONE)  # w


@functools.lru_cache(maxsize=None)
def _untwist_factors(curve: CurveSpec):
    p, xi = curve.fq.p, _xi(curve)
    w2 = T.f12_mul(p, xi, _W, _W)
    w3 = T.f12_mul(p, xi, w2, _W)
    if _twist_type(curve) == "D":
        return w2, w3
    return T.f12_inv(p, xi, w2), T.f12_inv(p, xi, w3)


def untwist(curve: CurveSpec, q: G2Point):
    """Map a G2 point to (x, y) in E(Fq12)."""
    p, xi = curve.fq.p, _xi(curve)
    fx, fy = _untwist_factors(curve)
    x = T.f12_mul(p, xi, _embed_fq2(q.x), fx)
    y = T.f12_mul(p, xi, _embed_fq2(q.y), fy)
    return x, y


# -- Tate Miller loop --------------------------------------------------------

def _miller_tate(curve: CurveSpec, P: AffinePoint, Qx, Qy):
    """f_{r,P} evaluated at the Fq12 point (Qx, Qy)."""
    p, xi = curve.fq.p, _xi(curve)
    r = curve.fr.p
    f = T.F12_ONE
    Tpt = P
    bits = bin(r)[3:]  # skip leading '1'
    for b in bits:
        # doubling step
        if not Tpt.inf:
            lam = (3 * Tpt.x * Tpt.x) * pow(2 * Tpt.y, -1, p) % p
            # l = lam*xQ - yQ + (yT - lam*xT)
            const = (Tpt.y - lam * Tpt.x) % p
            l = T.f12_add(
                p,
                T.f12_sub(p, _f12_scale(p, xi, Qx, lam), Qy),
                T.f12_scalar_base(p, const),
            )
            f = T.f12_mul(p, xi, T.f12_sqr(p, xi, f), l)
            from .utils.ec_host import ec_add
            Tpt = ec_add(p, Tpt, Tpt)
        else:
            f = T.f12_sqr(p, xi, f)
        if b == "1":
            from .utils.ec_host import ec_add
            if Tpt.inf:
                Tpt = P
            elif Tpt.x == P.x and (Tpt.y + P.y) % p == 0:
                # vertical line: value in Fq6 subfield, killed by final exp
                Tpt = AffinePoint.infinity()
            else:
                if Tpt.x == P.x:
                    lam = (3 * Tpt.x * Tpt.x) * pow(2 * Tpt.y, -1, p) % p
                else:
                    lam = (P.y - Tpt.y) * pow(P.x - Tpt.x, -1, p) % p
                const = (Tpt.y - lam * Tpt.x) % p
                l = T.f12_add(
                    p,
                    T.f12_sub(p, _f12_scale(p, xi, Qx, lam), Qy),
                    T.f12_scalar_base(p, const),
                )
                f = T.f12_mul(p, xi, f, l)
                Tpt = ec_add(p, Tpt, P)
    return f


def _f12_scale(p, xi, a, k: int):
    """k * a for int k, Fq12 a."""
    return tuple(
        tuple(tuple(c * k % p for c in f2) for f2 in f6) for f6 in a
    )


@functools.lru_cache(maxsize=None)
def _final_exponent(curve: CurveSpec) -> int:
    q = curve.fq.p
    return (q ** 12 - 1) // curve.fr.p


# -- optimal ate pairing (verification hot path) ------------------------------
#
# Mirrors arkworks' BN/BLS pairing engines as consumed by the reference
# verifier (`verifier.rs:195-252`, `utilities/src/multi_pairing.rs:13`):
# short Miller loop (~65 doubling steps over the curve parameter instead of
# 254 over r) + Frobenius-decomposed final exponentiation.  Q is iterated in
# untwisted E(Fq12) affine coordinates; P in G1(Fq) is where lines evaluate.

def _ate_line(p, xi, Tx, Ty, lam, xP, yP):
    """l(P) = yP - Ty - lam*(xP - Tx) as an Fq12 element."""
    l = T.f12_sub(p, T.f12_mul(p, xi, lam, Tx), Ty)
    l = T.f12_add(p, l, T.f12_scalar_base(p, yP))
    return T.f12_sub(p, l, _f12_scale(p, xi, lam, xP))


def _ate_dbl(p, xi, Tq, xP, yP):
    """(2T, line_{T,T}(P))."""
    Tx, Ty = Tq
    lam = T.f12_mul(p, xi, _f12_scale(p, xi, T.f12_mul(p, xi, Tx, Tx), 3),
                    T.f12_inv(p, xi, _f12_scale(p, xi, Ty, 2)))
    l = _ate_line(p, xi, Tx, Ty, lam, xP, yP)
    x3 = T.f12_sub(p, T.f12_mul(p, xi, lam, lam), _f12_scale(p, xi, Tx, 2))
    y3 = T.f12_sub(p, T.f12_mul(p, xi, lam, T.f12_sub(p, Tx, x3)), Ty)
    return (x3, y3), l


def _ate_add(p, xi, Tq, Qq, xP, yP):
    """(T+Q, line_{T,Q}(P)); T != +-Q assumed (loop scalars < r)."""
    Tx, Ty = Tq
    Qx, Qy = Qq
    lam = T.f12_mul(p, xi, T.f12_sub(p, Qy, Ty),
                    T.f12_inv(p, xi, T.f12_sub(p, Qx, Tx)))
    l = _ate_line(p, xi, Tx, Ty, lam, xP, yP)
    x3 = T.f12_sub(p, T.f12_sub(p, T.f12_mul(p, xi, lam, lam), Tx), Qx)
    y3 = T.f12_sub(p, T.f12_mul(p, xi, lam, T.f12_sub(p, Tx, x3)), Ty)
    return (x3, y3), l


def _miller_ate(curve: CurveSpec, P: AffinePoint, Qq, s: int):
    """f_{s,Q}(P) and T = s*Q (s > 0)."""
    p, xi = curve.fq.p, _xi(curve)
    f = T.F12_ONE
    Tq = Qq
    for b in bin(s)[3:]:
        Tq, l = _ate_dbl(p, xi, Tq, P.x, P.y)
        f = T.f12_mul(p, xi, T.f12_sqr(p, xi, f), l)
        if b == "1":
            Tq, l = _ate_add(p, xi, Tq, Qq, P.x, P.y)
            f = T.f12_mul(p, xi, f, l)
    return f, Tq


def _ate_miller_full(curve: CurveSpec, P: AffinePoint, Q: G2Point):
    """Complete Miller part of the optimal ate pairing (before final exp)."""
    p, xi = curve.fq.p, _xi(curve)
    Qq = untwist(curve, Q)
    x = curve.x_param
    if curve.name == "bn254":
        # loop 6x+2, then the two Frobenius correction lines
        f, Tq = _miller_ate(curve, P, Qq, 6 * x + 2)
        q1 = (T.f12_frobenius(p, xi, Qq[0]), T.f12_frobenius(p, xi, Qq[1]))
        q2 = (T.f12_frobenius(p, xi, Qq[0], 2),
              T.f12_neg(p, T.f12_frobenius(p, xi, Qq[1], 2)))  # -pi^2(Q)
        Tq, l = _ate_add(p, xi, Tq, q1, P.x, P.y)
        f = T.f12_mul(p, xi, f, l)
        _, l = _ate_add(p, xi, Tq, q2, P.x, P.y)
        return T.f12_mul(p, xi, f, l)
    if curve.name.startswith("bls12"):
        # BLS optimal ate: f_{|x|,Q}(P), conjugated when x < 0
        f, _ = _miller_ate(curve, P, Qq, abs(x))
        return T.f12_conj(p, f) if x < 0 else f
    raise ValueError(curve.name)


@functools.lru_cache(maxsize=None)
def _hard_part_digits(curve: CurveSpec) -> tuple:
    """(p^4 - p^2 + 1)/r in base p: f^hard = prod_i frob(f, i)^digit_i."""
    q = curve.fq.p
    e = (q ** 4 - q ** 2 + 1) // curve.fr.p
    digits = []
    while e:
        digits.append(e % q)
        e //= q
    return tuple(digits)


def final_exponentiation(curve: CurveSpec, f):
    """f^((q^12-1)/r): easy part, then base-p multi-exp for the hard part."""
    p, xi = curve.fq.p, _xi(curve)
    # easy: f^((p^6-1)(p^2+1))
    f = T.f12_mul(p, xi, T.f12_conj(p, f), T.f12_inv(p, xi, f))
    f = T.f12_mul(p, xi, T.f12_frobenius(p, xi, f, 2), f)
    # hard: shared-squaring multi-exponentiation over Frobenius powers of f
    digits = _hard_part_digits(curve)
    bases = [f]
    for i in range(1, len(digits)):
        bases.append(T.f12_frobenius(p, xi, f, i))
    acc = T.F12_ONE
    for bit in range(max(d.bit_length() for d in digits) - 1, -1, -1):
        acc = T.f12_sqr(p, xi, acc)
        for d, b in zip(digits, bases):
            if (d >> bit) & 1:
                acc = T.f12_mul(p, xi, acc, b)
    return acc


def pairing_tate(curve: CurveSpec, P: AffinePoint, Q: G2Point):
    """Reduced Tate pairing (slow; retained as a correctness oracle)."""
    p, xi = curve.fq.p, _xi(curve)
    if P.inf or Q.inf:
        return T.F12_ONE
    Qx, Qy = untwist(curve, Q)
    f = _miller_tate(curve, P, Qx, Qy)
    return T.f12_pow(p, xi, f, _final_exponent(curve))


def pairing(curve: CurveSpec, P: AffinePoint, Q: G2Point):
    """Reduced pairing e(P, Q) (optimal ate in Fq12 for k=12 curves,
    Tate in Fq6 for k=6 / BW6)."""
    if getattr(curve, "k_embed", 12) == 6:
        from . import pairing_bw6 as B6
        return B6.pairing(curve, P, B6.g2_xy(Q))
    if P.inf or Q.inf:
        return T.F12_ONE
    return final_exponentiation(curve, _ate_miller_full(curve, P, Q))


def multi_pairing(curve: CurveSpec, g1s: list, g2s: list):
    """prod_i e(P_i, Q_i) with one shared final exponentiation.

    Reference parity: `utilities/src/multi_pairing.rs:13`.  Routes through
    the C host runtime (native/mpcjf_native.c) when the base field fits 4x64
    limbs; the Python tower below is the exact fallback/oracle.
    """
    if getattr(curve, "k_embed", 12) == 6:
        from . import pairing_bw6 as B6
        return B6.multi_pairing(curve, g1s, [B6.g2_xy(q) for q in g2s])
    from .utils import native as _nv
    res = _nv.multi_pairing(curve, g1s, g2s)
    if res is not None:
        return res
    p, xi = curve.fq.p, _xi(curve)
    f = T.F12_ONE
    for P, Q in zip(g1s, g2s):
        if P.inf or Q.inf:
            continue
        f = T.f12_mul(p, xi, f, _ate_miller_full(curve, P, Q))
    return final_exponentiation(curve, f)


def pairing_check(curve: CurveSpec, g1s: list, g2s: list) -> bool:
    """prod_i e(P_i, Q_i) == 1."""
    if getattr(curve, "k_embed", 12) == 6:
        from . import pairing_bw6 as B6
        return multi_pairing(curve, g1s, g2s) == B6.ONE6
    if len(g1s) == 2 and len(g2s) == 2:
        # every single-proof verify ends in this 2-pairing check
        # (verifier.rs:195-252): fused C path, threaded Miller loops,
        # one shared final exp, one Python<->C crossing
        from .utils import native as _nv
        r = _nv.pair_check2(curve, g1s, g2s)
        if r is not None:
            return r
    return multi_pairing(curve, g1s, g2s) == T.F12_ONE
