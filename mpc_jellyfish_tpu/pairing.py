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
    if curve.name == "bn254":
        return (9, 1)
    if curve.name == "bls12_381":
        return (1, 1)
    raise ValueError(curve.name)


def _twist_type(curve: CurveSpec) -> str:
    return "D" if curve.name == "bn254" else "M"


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


def pairing(curve: CurveSpec, P: AffinePoint, Q: G2Point):
    """Reduced Tate pairing e(P, Q) in Fq12 (1 element)."""
    p, xi = curve.fq.p, _xi(curve)
    if P.inf or Q.inf:
        return T.F12_ONE
    Qx, Qy = untwist(curve, Q)
    f = _miller_tate(curve, P, Qx, Qy)
    return T.f12_pow(p, xi, f, _final_exponent(curve))


def multi_pairing(curve: CurveSpec, g1s: list, g2s: list):
    """prod_i e(P_i, Q_i) with one shared final exponentiation.

    Reference parity: `utilities/src/multi_pairing.rs:13`.
    """
    p, xi = curve.fq.p, _xi(curve)
    f = T.F12_ONE
    for P, Q in zip(g1s, g2s):
        if P.inf or Q.inf:
            continue
        Qx, Qy = untwist(curve, Q)
        f = T.f12_mul(p, xi, f, _miller_tate(curve, P, Qx, Qy))
    return T.f12_pow(p, xi, f, _final_exponent(curve))


def pairing_check(curve: CurveSpec, g1s: list, g2s: list) -> bool:
    """prod_i e(P_i, Q_i) == 1."""
    return multi_pairing(curve, g1s, g2s) == T.F12_ONE
