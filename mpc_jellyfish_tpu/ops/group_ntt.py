"""Radix-2 NTT over G1 point vectors (the FK23 group-FFT kernel).

TPU-native replacement for arkworks' FFT over `Vec<E::G1>` as used by
`GeneralDensePolynomial::batch_evaluate_rou` and `ToeplitzMatrix::fast_vec_mul`
on group vectors (reference `primitives/src/toeplitz.rs:27-118`,
`pcs/univariate_kzg/mod.rs:303-376`).

Same constant-geometry (Pease) DIF structure as `ops/ntt.py`, but each
butterfly's twiddle multiplication is an independent point scalar-mul
(`ec.batch_scalar_mul`, one 254-step scan vectorized over the n/2 lanes).
Cost: log(n) stages x one batched scalar-mul — fine for the VID-scale
vectors (hundreds to thousands of shares) this serves.

Point vectors are Jacobian tuples of [L, n] limb tensors.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import ec as E
from . import field as F
from .field import FieldSpec
from .ntt import Domain
from ..utils.bigint import ints_to_limbs


def _stage_twiddles_normal(domain: Domain, root: int, scalar_spec: FieldSpec):
    """Per-stage dense twiddles in NORMAL form (for scalar-mul bit scans)."""
    p = scalar_spec.p
    out = []
    for s in range(domain.log_n):
        stride = 1 << s
        cnt = domain.n >> (s + 1)
        step = pow(root, stride, p)
        vals, cur = [], 1
        for _ in range(cnt):
            vals.append(cur)
            cur = cur * step % p
        out.append(np.asarray(ints_to_limbs(vals, scalar_spec.num_limbs)))
    return out


@functools.lru_cache(maxsize=None)
def _gntt_tables(domain: Domain, scalar_spec: FieldSpec, inverse: bool):
    root = domain.w_inv if inverse else domain.w
    return _stage_twiddles_normal(domain, root, scalar_spec)


def _gdif(spec: FieldSpec, scalar_spec: FieldSpec, P, tables, log_n: int):
    """Constant-geometry DIF on point tuples; bit-reversed output order."""
    n = P[0].shape[-1]
    h = n // 2

    for s in range(log_n):
        a = tuple(t[..., :h] for t in P)
        b = tuple(t[..., h:] for t in P)
        s_ = E.jac_add(spec, a, b)
        d0 = E.jac_add(spec, a, E.jac_neg(spec, b))
        tw = jnp.asarray(tables[s])                       # [Lr, cnt]
        tw = jnp.repeat(tw, 1 << s, axis=1)               # [Lr, h]
        d_ = E.batch_scalar_mul(spec, d0, tw)
        P = tuple(jnp.stack([x, y], axis=-1).reshape(x.shape[:-1] + (n,))
                  for x, y in zip(s_, d_))
    return P


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _gntt_jit(curve_fq: FieldSpec, domain: Domain, scalar_spec: FieldSpec,
              inverse: bool, P):
    """Point coords live over curve_fq; twiddles over domain.spec (Fr)."""
    tables = _gntt_tables(domain, scalar_spec, inverse)
    out = _gdif(curve_fq, scalar_spec, P, tables, domain.log_n)
    bitrev = jnp.asarray(domain.bitrev)
    out = tuple(jnp.take(t, bitrev, axis=-1) for t in out)
    if inverse:
        out = E.scalar_mul_const(curve_fq, out, domain.n_inv,
                                 scalar_spec.num_limbs)
    return out


def group_ntt(curve_fq: FieldSpec, scalar_spec: FieldSpec, domain: Domain,
              P):
    """Point coefficients -> evaluations on the domain (natural order)."""
    if domain.n == 1:
        return P
    return _gntt_jit(curve_fq, domain, scalar_spec, False, P)


def group_intt(curve_fq: FieldSpec, scalar_spec: FieldSpec, domain: Domain,
               P):
    """Point evaluations -> coefficients."""
    if domain.n == 1:
        return P
    return _gntt_jit(curve_fq, domain, scalar_spec, True, P)


def toeplitz_group_mul(fq: FieldSpec, fr: FieldSpec, col: list, row: list,
                       P):
    """Toeplitz(col, row) @ P for a G1 vector P (jacobian [L, n]).

    Circulant embedding of size 2n; col/row are host field ints
    (reference toeplitz.rs:72-118)."""
    n = len(col)
    assert n & (n - 1) == 0 and len(row) == n and col[0] == row[0]
    from . import ntt as N
    dom2 = Domain(fr, 2 * n)
    emb = list(col) + [col[0]] + list(reversed(row[1:]))
    emb_fft = fr.from_device(N.ntt(dom2, fr.to_device(emb)))
    # pad P with n infinities, group-FFT, pointwise scalar-mul, inverse
    inf = E.jac_infinity(fq, (n,))
    P2 = tuple(jnp.concatenate([t, i], axis=-1) for t, i in zip(P, inf))
    fdom = Domain(fr, 2 * n)
    Pf = group_ntt(fq, fr, fdom, P2)
    sc = jnp.asarray(ints_to_limbs(emb_fft, fr.num_limbs))
    prod = E.batch_scalar_mul(fq, Pf, sc)
    out = group_intt(fq, fr, fdom, prod)
    return tuple(t[..., :n] for t in out)
