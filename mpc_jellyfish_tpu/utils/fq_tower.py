"""Host-side Fq2/Fq6/Fq12 tower arithmetic (exact Python ints).

Tower: Fq2 = Fq[u]/(u^2 - beta), Fq6 = Fq2[v]/(v^3 - xi),
Fq12 = Fq6[w]/(w^2 - v) - the standard construction for BN254 (xi = 9+u)
and BLS12-381 (xi = 1+u), both with beta = -1.

Elements are nested tuples of ints; all ops take the modulus p and xi.
Used only by the host pairing (verification path, SURVEY.md §3.2) - the
prover never touches extension fields.
"""

from __future__ import annotations

# Fq2 element: (c0, c1) meaning c0 + c1*u, u^2 = beta.  beta defaults to -1
# (BN254, BLS12-381); other curves register theirs via `set_beta`
# (BLS12-377: u^2 = -5).

_BETA: dict = {}


def set_beta(p: int, beta: int):
    _BETA[p] = beta % p


def _beta(p: int) -> int:
    return _BETA.get(p, p - 1)


def f2_add(p, a, b):
    return ((a[0] + b[0]) % p, (a[1] + b[1]) % p)


def f2_sub(p, a, b):
    return ((a[0] - b[0]) % p, (a[1] - b[1]) % p)


def f2_neg(p, a):
    return ((-a[0]) % p, (-a[1]) % p)


def f2_mul(p, a, b):
    # (a0 + a1 u)(b0 + b1 u) = a0b0 + beta a1b1 + (a0b1 + a1b0) u
    t0 = a[0] * b[0] % p
    t1 = a[1] * b[1] % p
    t2 = (a[0] + a[1]) * (b[0] + b[1]) % p
    return ((t0 + _beta(p) * t1) % p, (t2 - t0 - t1) % p)


def f2_scalar(p, a, k: int):
    return (a[0] * k % p, a[1] * k % p)


def f2_inv(p, a):
    # 1/(a0 + a1 u) = (a0 - a1 u)/(a0^2 - beta a1^2)
    norm = (a[0] * a[0] - _beta(p) * a[1] * a[1]) % p
    ninv = pow(norm, -1, p)
    return (a[0] * ninv % p, (-a[1]) * ninv % p)


F2_ZERO = (0, 0)
F2_ONE = (1, 0)

# Fq6 element: (c0, c1, c2) over Fq2 meaning c0 + c1 v + c2 v^2, v^3 = xi.


def f6_add(p, a, b):
    return tuple(f2_add(p, x, y) for x, y in zip(a, b))


def f6_sub(p, a, b):
    return tuple(f2_sub(p, x, y) for x, y in zip(a, b))


def f6_neg(p, a):
    return tuple(f2_neg(p, x) for x in a)


def f6_mul(p, xi, a, b):
    a0, a1, a2 = a
    b0, b1, b2 = b
    m = lambda x, y: f2_mul(p, x, y)
    t0, t1, t2 = m(a0, b0), m(a1, b1), m(a2, b2)
    c0 = f2_add(p, t0, f2_mul(p, xi, f2_sub(p, f2_mul(p, f2_add(p, a1, a2), f2_add(p, b1, b2)), f2_add(p, t1, t2))))
    c1 = f2_add(p, f2_sub(p, f2_mul(p, f2_add(p, a0, a1), f2_add(p, b0, b1)), f2_add(p, t0, t1)), f2_mul(p, xi, t2))
    c2 = f2_add(p, f2_sub(p, f2_mul(p, f2_add(p, a0, a2), f2_add(p, b0, b2)), f2_add(p, t0, t2)), t1)
    return (c0, c1, c2)


def f6_mul_by_v(p, xi, a):
    # v * (c0 + c1 v + c2 v^2) = xi*c2 + c0 v + c1 v^2
    return (f2_mul(p, xi, a[2]), a[0], a[1])


def f6_inv(p, xi, a):
    a0, a1, a2 = a
    m = lambda x, y: f2_mul(p, x, y)
    c0 = f2_sub(p, m(a0, a0), f2_mul(p, xi, m(a1, a2)))
    c1 = f2_sub(p, f2_mul(p, xi, m(a2, a2)), m(a0, a1))
    c2 = f2_sub(p, m(a1, a1), m(a0, a2))
    t = f2_add(p, f2_mul(p, xi, f2_add(p, m(a1, c2), m(a2, c1))), m(a0, c0))
    tinv = f2_inv(p, t)
    return (m(c0, tinv), m(c1, tinv), m(c2, tinv))


F6_ZERO = (F2_ZERO, F2_ZERO, F2_ZERO)
F6_ONE = (F2_ONE, F2_ZERO, F2_ZERO)

# Fq12 element: (c0, c1) over Fq6 meaning c0 + c1 w, w^2 = v.


def f12_add(p, a, b):
    return (f6_add(p, a[0], b[0]), f6_add(p, a[1], b[1]))


def f12_sub(p, a, b):
    return (f6_sub(p, a[0], b[0]), f6_sub(p, a[1], b[1]))


def f12_neg(p, a):
    return (f6_neg(p, a[0]), f6_neg(p, a[1]))


def f12_mul(p, xi, a, b):
    a0, a1 = a
    b0, b1 = b
    t0 = f6_mul(p, xi, a0, b0)
    t1 = f6_mul(p, xi, a1, b1)
    c0 = f6_add(p, t0, f6_mul_by_v(p, xi, t1))
    t2 = f6_mul(p, xi, f6_add(p, a0, a1), f6_add(p, b0, b1))
    c1 = f6_sub(p, t2, f6_add(p, t0, t1))
    return (c0, c1)


def f12_sqr(p, xi, a):
    # complex squaring: c0 = (a0+a1)(a0+v*a1) - t - v*t, c1 = 2t, t = a0*a1
    a0, a1 = a
    t = f6_mul(p, xi, a0, a1)
    va1 = f6_mul_by_v(p, xi, a1)
    c0 = f6_mul(p, xi, f6_add(p, a0, a1), f6_add(p, a0, va1))
    c0 = f6_sub(p, c0, f6_add(p, t, f6_mul_by_v(p, xi, t)))
    c1 = f6_add(p, t, t)
    return (c0, c1)


def f12_inv(p, xi, a):
    a0, a1 = a
    t = f6_sub(p, f6_mul(p, xi, a0, a0), f6_mul_by_v(p, xi, f6_mul(p, xi, a1, a1)))
    tinv = f6_inv(p, xi, t)
    return (f6_mul(p, xi, a0, tinv), f6_neg(p, f6_mul(p, xi, a1, tinv)))


def f12_pow(p, xi, a, e: int):
    if e < 0:
        return f12_pow(p, xi, f12_inv(p, xi, a), -e)
    result = F12_ONE
    base = a
    while e:
        if e & 1:
            result = f12_mul(p, xi, result, base)
        base = f12_sqr(p, xi, base)
        e >>= 1
    return result


def f2_conj(p, a):
    """a^p in Fq2 (u -> -u)."""
    return (a[0], (-a[1]) % p)


def f2_pow(p, a, e: int):
    r, b = (1, 0), a
    while e:
        if e & 1:
            r = f2_mul(p, r, b)
        b = f2_mul(p, b, b)
        e >>= 1
    return r


def f12_conj(p, a):
    """a^(p^6): negate the odd-w part (cyclotomic inverse after easy part)."""
    return (a[0], f6_neg(p, a[1]))


def _f12_coeffs(a):
    """Fq2 coefficients of w^0..w^5 (w^2 = v)."""
    a0, a1 = a
    return [a0[0], a1[0], a0[1], a1[1], a0[2], a1[2]]


def _f12_from_coeffs(c):
    return ((c[0], c[2], c[4]), (c[1], c[3], c[5]))


_FROB_G: dict = {}


def _frob_gammas(p, xi):
    """g^j for j=0..5 with g = xi^((p-1)/6): the w^j Frobenius twists."""
    key = (p, xi)
    if key not in _FROB_G:
        g = f2_pow(p, xi, (p - 1) // 6)
        out = [(1, 0)]
        for _ in range(5):
            out.append(f2_mul(p, out[-1], g))
        _FROB_G[key] = out
    return _FROB_G[key]


def f12_frobenius(p, xi, a, n: int = 1):
    """a^(p^n) via coefficient-wise conjugation + gamma scaling
    (w^p = xi^((p-1)/6) * w; requires 6 | p-1, true for BN254/BLS12-381)."""
    g = _frob_gammas(p, xi)
    for _ in range(n):
        cs = _f12_coeffs(a)
        cs = [f2_mul(p, f2_conj(p, c), g[j]) for j, c in enumerate(cs)]
        a = _f12_from_coeffs(cs)
    return a


def f12_scalar_base(p, k: int):
    """Embed an Fq element into Fq12."""
    return (((k % p, 0), F2_ZERO, F2_ZERO), F6_ZERO)


F12_ZERO = (F6_ZERO, F6_ZERO)
F12_ONE = (F6_ONE, F6_ZERO)
