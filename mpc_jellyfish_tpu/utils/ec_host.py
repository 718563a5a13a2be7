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


# -- Jacobian coordinates (inversion-free; verifier-side MSM) -----------------
#
# (X, Y, Z) represents (X/Z^2, Y/Z^3); Z == 0 is infinity.  Mirrors the
# arkworks projective ops the reference verifier relies on
# (`verifier.rs:195-252` MSM + `structs.rs:891 multi_scalar_mul`).

JAC_INF = (1, 1, 0)


def jac_from_affine(a: AffinePoint):
    return JAC_INF if a.inf else (a.x, a.y, 1)


def jac_to_affine(p: int, pt) -> AffinePoint:
    X, Y, Z = pt
    if Z == 0:
        return AffinePoint.infinity()
    zi = pow(Z, -1, p)
    zi2 = zi * zi % p
    return AffinePoint(X * zi2 % p, Y * zi2 * zi % p)


def jac_double(p: int, pt):
    X, Y, Z = pt
    if Z == 0 or Y == 0:   # Y == 0 is 2-torsion: only infinity on our curves
        return JAC_INF
    A = X * X % p
    B = Y * Y % p
    C = B * B % p
    D = 2 * ((X + B) * (X + B) - A - C) % p
    E = 3 * A % p
    F = E * E % p
    X3 = (F - 2 * D) % p
    Y3 = (E * (D - X3) - 8 * C) % p
    Z3 = 2 * Y * Z % p
    return (X3, Y3, Z3)


def jac_add(p: int, a, b):
    if a[2] == 0:
        return b
    if b[2] == 0:
        return a
    X1, Y1, Z1 = a
    X2, Y2, Z2 = b
    Z1Z1 = Z1 * Z1 % p
    Z2Z2 = Z2 * Z2 % p
    U1 = X1 * Z2Z2 % p
    U2 = X2 * Z1Z1 % p
    S1 = Y1 * Z2 * Z2Z2 % p
    S2 = Y2 * Z1 * Z1Z1 % p
    if U1 == U2:
        if S1 != S2:
            return JAC_INF
        return jac_double(p, a)
    H = (U2 - U1) % p
    I = 4 * H * H % p
    J = H * I % p
    rr = 2 * (S2 - S1) % p
    V = U1 * I % p
    X3 = (rr * rr - J - 2 * V) % p
    Y3 = (rr * (V - X3) - 2 * S1 * J) % p
    Z3 = ((Z1 + Z2) * (Z1 + Z2) - Z1Z1 - Z2Z2) * H % p
    return (X3, Y3, Z3)


def jac_add_affine(p: int, a, b: AffinePoint):
    """Mixed addition (b affine)."""
    if b.inf:
        return a
    if a[2] == 0:
        return (b.x, b.y, 1)
    X1, Y1, Z1 = a
    Z1Z1 = Z1 * Z1 % p
    U2 = b.x * Z1Z1 % p
    S2 = b.y * Z1 * Z1Z1 % p
    if X1 == U2:
        if Y1 != S2:
            return JAC_INF
        return jac_double(p, a)
    H = (U2 - X1) % p
    HH = H * H % p
    I = 4 * HH % p
    J = H * I % p
    rr = 2 * (S2 - Y1) % p
    V = X1 * I % p
    X3 = (rr * rr - J - 2 * V) % p
    Y3 = (rr * (V - X3) - 2 * Y1 * J) % p
    Z3 = ((Z1 + H) * (Z1 + H) - Z1Z1 - HH) % p
    return (X3, Y3, Z3)


def ec_msm_fast(p: int, points: list, scalars: list,
                order: int | None = None) -> AffinePoint:
    """Windowed Pippenger over Jacobian coordinates (host ints).

    One final inversion; per-window bucket accumulation + suffix sums.
    Used by the verifier's `ScalarsAndBases.multi_scalar_mul` — the
    reference's `VariableBaseMSM::msm_bigint` analog for host-side work.
    """
    pairs = [(s if order is None else s % order, pt)
             for s, pt in zip(scalars, points)
             if not pt.inf and (s if order is None else s % order)]
    if not pairs:
        return AffinePoint.infinity()
    if len(pairs) == 1:
        s, pt = pairs[0]
        return ec_mul(p, pt, s)
    from . import native as _nv
    res = _nv.msm(p, [pt for _, pt in pairs], [s for s, _ in pairs])
    if res is not None:
        return res
    maxbits = max(s.bit_length() for s, _ in pairs)
    c = 3 if len(pairs) < 32 else max(3, maxbits.bit_length())
    nwin = (maxbits + c - 1) // c
    total = JAC_INF
    for w in range(nwin - 1, -1, -1):
        shift = w * c
        buckets = [JAC_INF] * ((1 << c) - 1)
        for s, pt in pairs:
            d = (s >> shift) & ((1 << c) - 1)
            if d:
                buckets[d - 1] = jac_add_affine(p, buckets[d - 1], pt)
        run = JAC_INF
        win = JAC_INF
        for bkt in reversed(buckets):
            run = jac_add(p, run, bkt)
            win = jac_add(p, win, run)
        if total[2] != 0:
            for _ in range(c):
                total = jac_double(p, total)
        total = jac_add(p, total, win)
    return jac_to_affine(p, total)
