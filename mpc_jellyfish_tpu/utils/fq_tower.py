"""Host-side Fq2/Fq6/Fq12 tower arithmetic (exact Python ints).

Tower: Fq2 = Fq[u]/(u^2 - beta), Fq6 = Fq2[v]/(v^3 - xi),
Fq12 = Fq6[w]/(w^2 - v) - the standard construction for BN254 (xi = 9+u)
and BLS12-381 (xi = 1+u), both with beta = -1.

Elements are nested tuples of ints; all ops take the modulus p and xi.
Used only by the host pairing (verification path, SURVEY.md §3.2) - the
prover never touches extension fields.
"""

from __future__ import annotations

# Fq2 element: (c0, c1) meaning c0 + c1*u, u^2 = -1.


def f2_add(p, a, b):
    return ((a[0] + b[0]) % p, (a[1] + b[1]) % p)


def f2_sub(p, a, b):
    return ((a[0] - b[0]) % p, (a[1] - b[1]) % p)


def f2_neg(p, a):
    return ((-a[0]) % p, (-a[1]) % p)


def f2_mul(p, a, b):
    # (a0 + a1 u)(b0 + b1 u) = a0b0 - a1b1 + (a0b1 + a1b0) u
    t0 = a[0] * b[0] % p
    t1 = a[1] * b[1] % p
    t2 = (a[0] + a[1]) * (b[0] + b[1]) % p
    return ((t0 - t1) % p, (t2 - t0 - t1) % p)


def f2_scalar(p, a, k: int):
    return (a[0] * k % p, a[1] * k % p)


def f2_inv(p, a):
    # 1/(a0 + a1 u) = (a0 - a1 u)/(a0^2 + a1^2)
    norm = (a[0] * a[0] + a[1] * a[1]) % p
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
    return f12_mul(p, xi, a, a)


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


def f12_scalar_base(p, k: int):
    """Embed an Fq element into Fq12."""
    return (((k % p, 0), F2_ZERO, F2_ZERO), F6_ZERO)


F12_ZERO = (F6_ZERO, F6_ZERO)
F12_ONE = (F6_ONE, F6_ZERO)
