"""Radix-2 NTT / iNTT / coset-NTT over prime-field limb tensors.

TPU-native replacement for arkworks ``Radix2EvaluationDomain::{fft, ifft,
coset_fft}`` (SURVEY.md L0, hot loops in
`plonk/src/proof_system/prover.rs:512-675` and
`relation/src/constraint_system.rs:1225-1259`).

Layout: coefficient/evaluation vectors are ``uint32[L, n]`` limb-major
tensors (n on the minor axis -> TPU lanes).  The transform is an iterative
decimation-in-frequency butterfly over the trailing axis followed by a single
bit-reversal gather, with all twiddle tables precomputed per domain in
Montgomery form.  log2(n) stages, each one vectorized field mul + add/sub on
n/2 lanes.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import field as F
from .field import FieldSpec
from ..utils.bigint import ints_to_limbs


class Domain:
    """Radix-2 evaluation domain of size n (mirror of Radix2EvaluationDomain).

    Precomputes, on host: group generator w (n-th root of unity), its inverse,
    1/n, per-stage twiddle tables (Montgomery form, device arrays), and the
    bit-reversal permutation.
    """

    def __init__(self, spec: FieldSpec, n: int):
        assert n & (n - 1) == 0, "domain size must be a power of two"
        self.spec = spec
        self.n = n
        self.log_n = n.bit_length() - 1
        self.w = spec.nth_root(n) if n > 1 else 1
        self.w_inv = pow(self.w, -1, spec.p)
        self.n_inv = pow(n, -1, spec.p)
        self.generator = spec.generator  # coset shift used by quotient domain

    @functools.cached_property
    def _bitrev(self) -> jnp.ndarray:
        idx = np.arange(self.n)
        rev = np.zeros(self.n, dtype=np.int32)
        for b in range(self.log_n):
            rev |= ((idx >> b) & 1) << (self.log_n - 1 - b)
        return jnp.asarray(rev)

    def _twiddles(self, root: int) -> list:
        """Per-stage twiddle tables for DIF with the given n-th root.

        Stage s (s = 0..log_n-1) has half-block size h = n >> (s+1) and uses
        w^(j * 2^s) for j in 0..h.
        """
        spec = self.spec
        tw = []
        for s in range(self.log_n):
            h = self.n >> (s + 1)
            stride = 1 << s
            ws = [pow(root, j * stride, spec.p) for j in range(h)]
            ws_mont = [spec.to_mont_int(x) for x in ws]
            tw.append(jnp.asarray(ints_to_limbs(ws_mont, spec.num_limbs)))
        return tw

    @functools.cached_property
    def twiddles_fwd(self):
        return self._twiddles(self.w)

    @functools.cached_property
    def twiddles_inv(self):
        return self._twiddles(self.w_inv)

    @functools.cached_property
    def elements_host(self) -> list:
        """Host list of domain elements 1, w, w^2, ... (normal form ints)."""
        out, cur = [], 1
        for _ in range(self.n):
            out.append(cur)
            cur = cur * self.w % self.spec.p
        return out

    def __hash__(self):
        return hash((self.spec, self.n))

    def __eq__(self, other):
        return isinstance(other, Domain) and self.spec == other.spec and self.n == other.n


def _dif(spec: FieldSpec, x: jnp.ndarray, twiddles: list, log_n: int) -> jnp.ndarray:
    """Iterative DIF butterflies; output in bit-reversed order."""
    L, n = x.shape
    for s in range(log_n):
        h = n >> (s + 1)          # half-block
        nb = n >> (log_n - s)     # actually number of blocks = 2^s
        nb = 1 << s
        # view as [L, nb, 2, h]
        xv = x.reshape(L, nb, 2, h)
        even = xv[:, :, 0, :]
        odd = xv[:, :, 1, :]
        t = F.sub(spec, even, odd)
        even2 = F.add(spec, even, odd)
        w = twiddles[s][:, None, :]           # [L, 1, h]
        odd2 = F.mul(spec, t, w)
        x = jnp.stack([even2, odd2], axis=2).reshape(L, n)
    return x


def ntt(domain: Domain, coeffs: jnp.ndarray) -> jnp.ndarray:
    """Forward NTT: coefficients -> evaluations on the domain (natural order)."""
    if domain.n == 1:
        return coeffs
    y = _dif(domain.spec, coeffs, domain.twiddles_fwd, domain.log_n)
    return y[:, domain._bitrev]


def intt(domain: Domain, evals: jnp.ndarray) -> jnp.ndarray:
    """Inverse NTT: evaluations -> coefficients."""
    if domain.n == 1:
        return evals
    spec = domain.spec
    y = _dif(spec, evals, domain.twiddles_inv, domain.log_n)
    y = y[:, domain._bitrev]
    return F.mul_const(spec, y, domain.n_inv)


def coset_scale(domain: Domain, coeffs: jnp.ndarray, g: int | None = None) -> jnp.ndarray:
    """Scale coefficient j by g^j (host int g; defaults to field generator)."""
    spec = domain.spec
    g = domain.generator if g is None else g
    pw = [pow(g, j, spec.p) for j in range(domain.n)]
    pw_d = jnp.asarray(ints_to_limbs([spec.to_mont_int(x) for x in pw], spec.num_limbs))
    return F.mul(spec, coeffs, pw_d)


class CosetTable:
    """Cached per-(domain, g) coset scaling powers (g^j and g^-j, Montgomery)."""

    def __init__(self, domain: Domain, g: int | None = None):
        spec = domain.spec
        self.domain = domain
        self.g = domain.generator if g is None else g
        g_inv = pow(self.g, -1, spec.p)
        pw = []
        pwi = []
        cur, curi = 1, 1
        for _ in range(domain.n):
            pw.append(spec.to_mont_int(cur))
            pwi.append(spec.to_mont_int(curi))
            cur = cur * self.g % spec.p
            curi = curi * g_inv % spec.p
        self.pows = jnp.asarray(ints_to_limbs(pw, spec.num_limbs))
        self.pows_inv = jnp.asarray(ints_to_limbs(pwi, spec.num_limbs))


def coset_ntt(domain: Domain, coeffs: jnp.ndarray, table: CosetTable) -> jnp.ndarray:
    """Evaluate poly on the coset g*H: NTT(coeff_j * g^j)."""
    scaled = F.mul(domain.spec, coeffs, table.pows)
    return ntt(domain, scaled)


def coset_intt(domain: Domain, evals: jnp.ndarray, table: CosetTable) -> jnp.ndarray:
    """Interpolate from evaluations on coset g*H back to coefficients."""
    coeffs = intt(domain, evals)
    return F.mul(domain.spec, coeffs, table.pows_inv)
