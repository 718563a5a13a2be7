"""Host pairing for embedding-degree-6 curves (BW6-761).

BW6-761 (reference bench curve, `bench.md:17,25`; pulled upstream from the
external ark-bw6-761 crate) has k = 6: G2 is a sextic M-twist over Fq
itself (E': y^2 = x^3 + 4 for E: y^2 = x^3 - 1, twist scalar zeta = -4),
so G2 group ops reuse the generic code with zero imaginary parts and only
the pairing needs a dedicated tower.

Fp6 = Fp[w]/(w^6 - zeta).  Untwist (M-type): psi(x, y) = (x/w^2, y/w^3) =
(x zeta^{-1} w^4, y zeta^{-1} w^3).  The pairing is the reduced Tate
pairing e(P, Q) = f_{r,P}(psi(Q))^((p^6-1)/r) — bilinear and
non-degenerate, which is all the KZG verifier needs (DESIGN.md: the
pairing itself is verification-side host work).  Final exponentiation is
split (p^3-1)(p+1) easy part (Frobenius + one inverse) and the
(p^2-p+1)/r hard part (~1145-bit exponent), so a full pairing is a few
hundred Fp6 mults of 761-bit bigints.

Constants derived + verified in-environment by scripts/derive_bw6_761.py
(seed-polynomial check vs pinned BLS12-377 moduli, Miller-Rabin, CM /
Cornacchia order derivation, random-point order checks).
"""

from __future__ import annotations

import functools

from .curves import CurveSpec
from .utils.ec_host import AffinePoint

# Fp6 element = tuple of 6 ints (coefficients of 1, w, ..., w^5)

ONE6 = (1, 0, 0, 0, 0, 0)
ZERO6 = (0, 0, 0, 0, 0, 0)


def _zeta(curve: CurveSpec) -> int:
    """Twist scalar: E' = y^2 = x^3 + b*zeta (M-twist) => zeta = b2/b."""
    return curve.b2[0] * pow(curve.b, -1, curve.fq.p) % curve.fq.p


def f6_add(p, a, b):
    return tuple((x + y) % p for x, y in zip(a, b))


def f6_sub(p, a, b):
    return tuple((x - y) % p for x, y in zip(a, b))


def f6_mul(p, zeta, a, b):
    acc = [0] * 11
    for i, ai in enumerate(a):
        if not ai:
            continue
        for j, bj in enumerate(b):
            if bj:
                acc[i + j] += ai * bj
    out = list(acc[:6])
    for k in range(6, 11):
        out[k - 6] += acc[k] * zeta
    return tuple(v % p for v in out)


def f6_sqr(p, zeta, a):
    return f6_mul(p, zeta, a, a)


def f6_scalar(p, a, k):
    return tuple(v * k % p for v in a)


def f6_pow(p, zeta, a, e: int):
    result = ONE6
    base = a
    while e:
        if e & 1:
            result = f6_mul(p, zeta, result, base)
        base = f6_sqr(p, zeta, base)
        e >>= 1
    return result


@functools.lru_cache(maxsize=8)
def _frob_gamma(p: int, zeta: int, power: int) -> tuple:
    """gamma_i = zeta^(i*(p^power - 1)/6): w^(p^power) = gamma_1 * w."""
    e = (pow(p, power) - 1) // 6  # p = 1 mod 6 for a sextic twist to exist
    g1 = pow(zeta, e % (p - 1), p)
    return tuple(pow(g1, i, p) for i in range(6))


def f6_frobenius(p, zeta, a, power: int = 1):
    g = _frob_gamma(p, zeta, power)
    return tuple(ai * g[i] % p for i, ai in enumerate(a))


def f6_inv(p, zeta, a):
    """Inverse via the norm map: a^-1 = (prod_{i=1..5} a^(p^i)) / N(a),
    N(a) = prod_{i=0..5} a^(p^i) in Fp."""
    conj = ONE6
    for i in range(1, 6):
        conj = f6_mul(p, zeta, conj, f6_frobenius(p, zeta, a, i))
    norm6 = f6_mul(p, zeta, a, conj)
    assert all(v == 0 for v in norm6[1:]), "norm not in Fp"
    return f6_scalar(p, conj, pow(norm6[0], -1, p))


def _untwist(curve: CurveSpec, Q) -> tuple:
    """E'(Fp) point (x, y) -> E(Fp6): (x/w^2, y/w^3)."""
    p = curve.fq.p
    zeta = _zeta(curve)
    zinv = pow(zeta, -1, p)
    x, y = Q
    Qx = (0, 0, 0, 0, x * zinv % p, 0)   # x * zeta^-1 * w^4
    Qy = (0, 0, 0, y * zinv % p, 0, 0)   # y * zeta^-1 * w^3
    return Qx, Qy


def _miller_tate(curve: CurveSpec, P: AffinePoint, Qx, Qy):
    """f_{r,P} evaluated at the untwisted Q (line coefficients in Fp).

    Denominator elimination (BKLS/GHS): Qx lies in the cubic subfield
    Fp3 = <1, w^2, w^4>, so every vertical-line factor (Qx - x0) is in
    Fp3 and is annihilated by the (p^3 - 1) factor of the final
    exponentiation — verticals (and their inverses) are dropped."""
    p = curve.fq.p
    zeta = _zeta(curve)
    r = curve.fr.p
    f = ONE6
    Tx, Ty = P.x, P.y

    def line_eval(lam, x0, y0):
        # l(Q) = Qy - y0 - lam*(Qx - x0): Fp6 with two Fp-coeff terms
        t = f6_scalar(p, Qx, lam)
        const = (-y0 + lam * x0) % p
        out = list(f6_sub(p, Qy, t))
        out[0] = (out[0] + const) % p
        return tuple(out)

    for bit in range(r.bit_length() - 2, -1, -1):
        lam = 3 * Tx * Tx % p * pow(2 * Ty, -1, p) % p
        f = f6_mul(p, zeta, f6_sqr(p, zeta, f), line_eval(lam, Tx, Ty))
        x2 = (lam * lam - 2 * Tx) % p
        Ty = (lam * (Tx - x2) - Ty) % p
        Tx = x2
        if (r >> bit) & 1:
            if Tx == P.x and (Ty + P.y) % p == 0:
                # T + P = O: the line is the vertical at P (eliminated)
                continue
            lam = (P.y - Ty) * pow(P.x - Tx, -1, p) % p
            f = f6_mul(p, zeta, f, line_eval(lam, Tx, Ty))
            x2 = (lam * lam - Tx - P.x) % p
            Ty = (lam * (Tx - x2) - Ty) % p
            Tx = x2
    return f


@functools.lru_cache(maxsize=4)
def _hard_exponent(p: int, r: int) -> int:
    """(p^2 - p + 1) / r — the cyclotomic hard part of (p^6-1)/r."""
    phi6 = p * p - p + 1
    assert phi6 % r == 0, "r must divide Phi_6(p) (embedding degree 6)"
    return phi6 // r


def final_exponentiation(curve: CurveSpec, f):
    p = curve.fq.p
    zeta = _zeta(curve)
    # easy part: f^((p^3-1)(p+1))
    f_p3 = f6_frobenius(p, zeta, f, 3)
    f = f6_mul(p, zeta, f_p3, f6_inv(p, zeta, f))           # f^(p^3-1)
    f = f6_mul(p, zeta, f6_frobenius(p, zeta, f, 1), f)     # ^(p+1)
    # hard part: f^((p^2-p+1)/r)
    return f6_pow(p, zeta, f, _hard_exponent(p, curve.fr.p))


def pairing(curve: CurveSpec, P: AffinePoint, Q) -> tuple:
    """Reduced Tate pairing e(P, Q); Q = (x, y) ints on the twist."""
    if P.inf or Q is None:
        return ONE6
    Qx, Qy = _untwist(curve, Q)
    f = _miller_tate(curve, P, Qx, Qy)
    return final_exponentiation(curve, f)


def multi_pairing(curve: CurveSpec, g1s: list, g2s: list) -> tuple:
    """prod_i e(P_i, Q_i) with one shared final exponentiation."""
    p = curve.fq.p
    zeta = _zeta(curve)
    f = ONE6
    for P, Q in zip(g1s, g2s):
        if P.inf or Q is None:
            continue
        Qx, Qy = _untwist(curve, Q)
        f = f6_mul(p, zeta, f, _miller_tate(curve, P, Qx, Qy))
    return final_exponentiation(curve, f)


def g2_xy(q2) -> tuple | None:
    """Generic-G2Point (Fq2 coords with zero imaginary parts) -> (x, y)."""
    if getattr(q2, "inf", False):
        return None
    (x0, x1), (y0, y1) = q2.x, q2.y
    assert x1 == 0 and y1 == 0, "BW6 G2 must have Fq coordinates"
    return (x0, y0)
