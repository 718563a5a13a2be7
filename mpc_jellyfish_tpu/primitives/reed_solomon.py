"""Reed-Solomon erasure code + Toeplitz/circulant fast multiplication.

Mirror of `primitives/src/reed_solomon_code/mod.rs:37-148` (erasure
encode/decode over domain points) and `primitives/src/toeplitz.rs:27-118`
(`CirculantMatrix`/`ToeplitzMatrix::fast_vec_mul` - the FK23 kernel).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import field as F
from ..ops import ntt as N
from ..ops.field import FieldSpec


def rs_encode(p: int, data: list, num_shares: int) -> list:
    """Systematic-style RS: interpolate data as poly coefficients and
    evaluate at points 1..num_shares (reference reed_solomon encode)."""
    return [(sum(c * pow(x, j, p) for j, c in enumerate(data)) % p)
            for x in range(1, num_shares + 1)]


def rs_decode(p: int, shares: list, k: int) -> list:
    """Decode from any k (point, value) pairs by Lagrange interpolation
    (reference reed_solomon decode)."""
    pts = shares[:k]
    coeffs = [0] * k
    for i, (xi, yi) in enumerate(pts):
        # numerator poly prod_{j!=i} (X - xj), denominator prod (xi - xj)
        num = [1]
        den = 1
        for j, (xj, _) in enumerate(pts):
            if j == i:
                continue
            num = _poly_mul_linear(p, num, (-xj) % p)
            den = den * (xi - xj) % p
        scale = yi * pow(den, -1, p) % p
        for d, c in enumerate(num):
            coeffs[d] = (coeffs[d] + scale * c) % p
    return coeffs


def _poly_mul_linear(p: int, poly: list, c0: int) -> list:
    """poly(X) * (X + c0)."""
    out = [0] * (len(poly) + 1)
    for i, c in enumerate(poly):
        out[i] = (out[i] + c * c0) % p
        out[i + 1] = (out[i + 1] + c) % p
    return out


class CirculantMatrix:
    """Circulant matrix given its first column; fast_vec_mul via NTT
    (reference toeplitz.rs:27-70)."""

    def __init__(self, spec: FieldSpec, col: list):
        n = len(col)
        assert n & (n - 1) == 0
        self.spec = spec
        self.n = n
        self.domain = N.Domain(spec, n)
        self.col_fft = N.ntt(self.domain, spec.to_device(col))

    def fast_vec_mul(self, vec: list) -> list:
        """M @ v = iNTT(NTT(col) . NTT(v))."""
        spec = self.spec
        v_fft = N.ntt(self.domain, spec.to_device(vec))
        prod = F.mul(spec, self.col_fft, v_fft)
        return spec.from_device(N.intt(self.domain, prod))


class ToeplitzMatrix:
    """Toeplitz matrix from first column c and first row r; multiplied by
    embedding into a 2n circulant (reference toeplitz.rs:72-118, the FK23
    amortized-KZG kernel)."""

    def __init__(self, spec: FieldSpec, col: list, row: list):
        assert col[0] == row[0]
        n = len(col)
        assert n & (n - 1) == 0 and len(row) == n
        self.spec = spec
        self.n = n
        # circulant embedding: first column = [col, c0, rev(row[1:])]
        emb = list(col) + [col[0]] + list(reversed(row[1:]))
        self.circ = CirculantMatrix(spec, emb)

    def fast_vec_mul(self, vec: list) -> list:
        assert len(vec) == self.n
        padded = list(vec) + [0] * self.n
        return self.circ.fast_vec_mul(padded)[:self.n]
