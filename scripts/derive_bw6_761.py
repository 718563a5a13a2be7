#!/usr/bin/env python
"""Derive and VERIFY the BW6-761 curve constants from the BLS12-377 seed.

BW6-761 (Housni-Guillevic, "Optimized and secure pairing-friendly elliptic
curves suitable for one layer proof composition") is the outer curve of
BLS12-377: its scalar field r equals BLS12-377's base field q, and its base
field p is given by a fixed degree-12 polynomial in the same seed
x = 0x8508c00000000001.  Nothing is trusted from memory: every derived
value is checked in-environment —

  1. the seed is confirmed by re-deriving BLS12-377's q and r polynomials
     against the constants already pinned in curves.py;
  2. p is checked for size and primality (Miller-Rabin, 64 rounds);
  3. the curve order N = p + 1 - t comes from solving 4p = t^2 + 3y^2
     (Cornacchia, j = 0 CM), picking the unique j=0 twist order divisible
     by r, and is then validated by N*P = O on random points;
  4. generators are produced by cofactor-clearing small-x points and
     checked to have exact order r.

Prints a python snippet of constants for curves.py.
"""

import random
import sys

# BLS12-377 pinned constants (mpc_jellyfish_tpu/curves.py)
BLS12_377_FR_MOD = 8444461749428370424248824938781546531375899335154063827935233455917409239041
BLS12_377_FQ_MOD = 258664426012969094010652733694893533536393512754914660539884262666720468348340822774968888139573360124440321458177

X = 0x8508C00000000001


def is_prime(n, rounds=64):
    if n < 2:
        return False
    for sp in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % sp == 0:
            return n == sp
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    rng = random.Random(0xB76)
    for _ in range(rounds):
        a = rng.randrange(2, n - 1)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def sqrt_mod(a, p):
    a %= p
    if pow(a, (p - 1) // 2, p) != 1:
        raise ValueError("not a QR")
    if p % 4 == 3:
        return pow(a, (p + 1) // 4, p)
    # Tonelli-Shanks
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
    while t != 1:
        i, tt = 0, t
        while tt != 1:
            tt = tt * tt % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c = i, b * b % p
        t, r = t * c % p, r * b % p
    return r


def cornacchia_3(p):
    """Solve 4p = t^2 + 3*y^2 (j=0 CM equation)."""
    # solve u^2 = -3 mod p, then lattice/Euclid descent on (u, p)
    u = sqrt_mod(p - 3, p)
    if u % 2 == 0:
        u = p - u  # make u odd so parity can work out
    a, b = 2 * p, u
    limit = int((4 * p) ** 0.5) if p < (1 << 50) else _isqrt(4 * p)
    while b * b > 4 * p:
        a, b = b, a % b
    t = b
    rem = 4 * p - t * t
    if rem % 3 != 0:
        raise ValueError("no solution with this unit choice")
    y2, y = rem // 3, _isqrt(rem // 3)
    if y * y != y2:
        raise ValueError("non-square residue in Cornacchia")
    return t, y


def _isqrt(n):
    import math
    return math.isqrt(n)


def ec_add(p, P, Q):
    if P is None:
        return Q
    if Q is None:
        return P
    x1, y1 = P
    x2, y2 = Q
    if x1 == x2 and (y1 + y2) % p == 0:
        return None
    if P == Q:
        lam = (3 * x1 * x1) * pow(2 * y1, -1, p) % p
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, p) % p
    x3 = (lam * lam - x1 - x2) % p
    return (x3, (lam * (x1 - x3) - y1) % p)


def ec_mul(p, P, k):
    R = None
    while k:
        if k & 1:
            R = ec_add(p, R, P)
        P = ec_add(p, P, P)
        k >>= 1
    return R


def find_order(p, b, candidates, r, tag):
    """The unique candidate order divisible by r that kills random points."""
    rng = random.Random(1)
    hits = []
    for N in candidates:
        if N % r != 0:
            continue
        ok = True
        for _ in range(4):
            while True:
                x = rng.randrange(p)
                y2 = (x * x * x + b) % p
                try:
                    y = sqrt_mod(y2, p)
                    break
                except ValueError:
                    continue
            if ec_mul(p, (x, y), N) is not None:
                ok = False
                break
        if ok:
            hits.append(N)
    assert len(hits) == 1, f"{tag}: expected exactly one order, got {len(hits)}"
    return hits[0]


def small_x_generator(p, b, N, r, tag):
    h = N // r
    x = 0
    while True:
        y2 = (x * x * x + b) % p
        try:
            y = sqrt_mod(y2, p)
        except ValueError:
            x += 1
            continue
        y = min(y, p - y)
        G = ec_mul(p, (x, y), h)
        if G is not None and ec_mul(p, G, r) is None:
            # exact order r (r is prime)
            print(f"{tag}: generator from x={x}, cofactor-cleared")
            return G
        x += 1


def main():
    x = X
    # 1. confirm the seed against pinned BLS12-377 moduli
    r377 = x**4 - x**2 + 1
    q377 = ((x - 1) ** 2 * r377) // 3 + x
    assert r377 == BLS12_377_FR_MOD, "seed check failed (r377)"
    assert q377 == BLS12_377_FQ_MOD, "seed check failed (q377)"
    print("seed confirmed: q377/r377 polynomials match pinned moduli")

    r = q377  # BW6-761 scalar field == BLS12-377 base field

    # 2. p from the published BW6-761 polynomial
    num = (103 * x**12 - 379 * x**11 + 250 * x**10 + 691 * x**9
           - 911 * x**8 - 79 * x**7 + 623 * x**6 - 640 * x**5
           + 274 * x**4 + 763 * x**3 + 73 * x**2 + 254 * x + 229)
    assert num % 9 == 0, "p polynomial not divisible by 9"
    p = num // 9
    print(f"p bits: {p.bit_length()}")
    assert p.bit_length() == 761
    assert is_prime(p), "p not prime"
    assert is_prime(r), "r not prime"
    print("p is prime (MR-64)")

    # 3. CM: 4p = t^2 + 3y^2; six j=0 twist orders
    t, y = cornacchia_3(p)
    assert t * t + 3 * y * y == 4 * p
    print(f"cornacchia: t bits {t.bit_length()}, y bits {y.bit_length()}")
    cands = set()
    for tt in (t, -t):
        cands.add(p + 1 - tt)
        cands.add(p + 1 - (tt + 3 * y) // 2 if (tt + 3 * y) % 2 == 0 else 0)
        cands.add(p + 1 - (tt - 3 * y) // 2 if (tt - 3 * y) % 2 == 0 else 0)
    cands.discard(0)

    N1 = find_order(p, (-1) % p, sorted(cands), r, "G1 (b=-1)")
    h1 = N1 // r
    print(f"G1 order found; cofactor h1 bits {h1.bit_length()}")

    # 4. G2 = sextic twist over Fp (k=6, D=-3): arkworks uses b' = 4
    N2 = find_order(p, 4, sorted(cands), r, "G2 (b'=4)")
    h2 = N2 // r
    print(f"G2 order found; cofactor h2 bits {h2.bit_length()}")

    g1 = small_x_generator(p, (-1) % p, N1, r, "G1")
    g2 = small_x_generator(p, 4, N2, r, "G2")

    print("\n# ---- constants for curves.py ----")
    print(f"BW6_761_FQ_MOD = {p}")
    print(f"BW6_761_FR_MOD = {r}  # == BLS12_377_FQ_MOD")
    print(f"BW6_761_G1_GEN = ({g1[0]},\n  {g1[1]})")
    print(f"BW6_761_G2_GEN = ({g2[0]},\n  {g2[1]})")
    print(f"BW6_761_G1_COFACTOR = {h1}")
    print(f"BW6_761_G2_COFACTOR = {h2}")
    print(f"BW6_761_TRACE_T = {t}")
    print(f"BW6_761_CM_Y = {y}")


if __name__ == "__main__":
    sys.exit(main())
