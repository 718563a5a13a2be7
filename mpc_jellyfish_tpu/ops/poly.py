"""Dense polynomial operations over prime-field limb tensors.

TPU-native replacement for the `ark-poly` ``DensePolynomial`` operations the
reference prover uses (SURVEY.md L0): evaluation, division by a linear factor
(X - z) for KZG openings (`plonk/src/proof_system/prover.rs:490-508`),
vanishing-polynomial mul for masking (`prover.rs:463-486`).

A polynomial is a ``uint32[L, n]`` limb tensor of coefficients (low-to-high,
Montgomery form).  All algorithms are log-depth (scan/reduce based) - no
sequential Horner loops on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import field as F
from .field import FieldSpec


@functools.partial(jax.jit, static_argnums=0)
def eval_at(spec: FieldSpec, coeffs: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Evaluate poly at point z.  coeffs [L, n] (or [L, k, n] batched over k),
    z [L] or [L, 1].  Returns [L] (or [L, k])."""
    n = coeffs.shape[-1]
    zp = F.powers(spec, z, n)                       # [L, n]
    if coeffs.ndim == 3:
        zp = zp[:, None, :]
    prod = F.mul(spec, coeffs, zp)
    return F.sum_reduce(spec, prod, axis=prod.ndim - 1)


@functools.partial(jax.jit, static_argnums=0)
def divide_by_linear(spec: FieldSpec, coeffs: jnp.ndarray, z: jnp.ndarray):
    """Divide a(X) by (X - z): return (q, r) with a = q*(X-z) + r.

    q_j = sum_{k>j} a_k z^{k-1-j}, computed as a suffix cumsum of a_k z^k
    scaled by z^{-(j+1)} - fully parallel (log-depth), exact field math.
    Requires z != 0.  coeffs [L, n] -> q [L, n] (top coefficient zero).
    """
    n = coeffs.shape[-1]
    ax = coeffs.ndim - 1                            # poly axis (supports
    zp = F.powers(spec, z, n)                       # [L, B, n] batches)
    zinv = F.inv(spec, z.reshape(spec.num_limbs, 1))
    zpi = F.powers(spec, zinv, n + 1)               # z^-k, k in [0, n]
    if coeffs.ndim == 3:
        zp = zp[:, None, :]
        zpi = zpi[:, None, :]
    b = F.mul(spec, coeffs, zp)                     # a_k z^k
    # T_j = sum_{k>=j} b_k  (inclusive suffix sum)
    t = jnp.flip(F.cumsum(spec, jnp.flip(b, axis=ax), axis=ax), axis=ax)
    r = t[..., 0]                                   # a(z) (since b_0 sum = sum a_k z^k)
    # suffix-exclusive: S_j = T_{j+1} (S_{n-1} = 0)
    s = jnp.concatenate(
        [t[..., 1:], F.zeros(spec, coeffs.shape[1:-1] + (1,))], axis=ax)
    q = F.mul(spec, s, zpi[..., 1:n + 1])           # S_j * z^-(j+1)
    return q, r


def mul_by_vanishing(spec: FieldSpec, coeffs: jnp.ndarray, domain_n: int) -> jnp.ndarray:
    """Multiply m(X) by Z_H(X) = X^n - 1: shift up by n and subtract.

    Output length = len(m) + n.
    """
    L, k = coeffs.shape
    lo = F.neg(spec, coeffs)                        # -m(X)
    out = jnp.concatenate([lo, F.zeros(spec, (domain_n,))], axis=1)
    hi = jnp.concatenate([F.zeros(spec, (domain_n,)), coeffs], axis=1)
    return F.add(spec, out, hi)


def add_padded(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Add two coefficient tensors of possibly different length."""
    la, lb = a.shape[1], b.shape[1]
    n = max(la, lb)
    if la < n:
        a = jnp.concatenate([a, F.zeros(spec, (n - la,))], axis=1)
    if lb < n:
        b = jnp.concatenate([b, F.zeros(spec, (n - lb,))], axis=1)
    return F.add(spec, a, b)
