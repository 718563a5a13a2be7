"""Host-side (exact Python int) short-Weierstrass curve arithmetic.

Serves as (a) the correctness oracle for the device EC/MSM kernels and
(b) the scalar-path implementation for non-hot operations (SRS generation,
verifier-side points).  Pairing lives in `pairing.py` on top of this.

Reference parity: arkworks `ark-ec` affine/projective ops as consumed by the
reference (`primitives/src/pcs/univariate_kzg/mod.rs`,
`plonk/src/proof_system/verifier.rs`).
"""

from __future__ import annotations


class AffinePoint:
    """Affine point on y^2 = x^3 + b over Fp; None coords = infinity."""

    __slots__ = ("x", "y", "inf")

    def __init__(self, x=0, y=0, inf=False):
        self.x, self.y, self.inf = x, y, inf

    @staticmethod
    def infinity():
        return AffinePoint(0, 0, True)

    def __eq__(self, other):
        if self.inf or other.inf:
            return self.inf == other.inf
        return self.x == other.x and self.y == other.y

    def __repr__(self):
        return "Inf" if self.inf else f"({self.x}, {self.y})"


def ec_add(p: int, a: AffinePoint, b: AffinePoint) -> AffinePoint:
    """Affine addition over Fp (complete, slow - host only)."""
    if a.inf:
        return b
    if b.inf:
        return a
    if a.x == b.x:
        if (a.y + b.y) % p == 0:
            return AffinePoint.infinity()
        # doubling (a-coefficient is 0 for our curves)
        lam = (3 * a.x * a.x) * pow(2 * a.y, -1, p) % p
    else:
        lam = (b.y - a.y) * pow(b.x - a.x, -1, p) % p
    x3 = (lam * lam - a.x - b.x) % p
    y3 = (lam * (a.x - x3) - a.y) % p
    return AffinePoint(x3, y3)


def ec_neg(p: int, a: AffinePoint) -> AffinePoint:
    if a.inf:
        return a
    return AffinePoint(a.x, (-a.y) % p)


def ec_mul(p: int, a: AffinePoint, k: int) -> AffinePoint:
    """Scalar multiplication (double-and-add, host)."""
    if k < 0:
        return ec_mul(p, ec_neg(p, a), -k)
    result = AffinePoint.infinity()
    base = a
    while k:
        if k & 1:
            result = ec_add(p, result, base)
        base = ec_add(p, base, base)
        k >>= 1
    return result


def ec_msm(p: int, points: list, scalars: list) -> AffinePoint:
    """Naive host MSM (oracle for the device Pippenger)."""
    acc = AffinePoint.infinity()
    for pt, s in zip(points, scalars):
        acc = ec_add(p, acc, ec_mul(p, pt, s))
    return acc


def on_curve(p: int, b: int, pt: AffinePoint) -> bool:
    if pt.inf:
        return True
    return (pt.y * pt.y - pt.x * pt.x * pt.x - b) % p == 0
