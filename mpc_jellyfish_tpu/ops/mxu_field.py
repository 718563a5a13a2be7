"""MXU (systolic-array) field linear algebra: constant-matrix field matmul.

The VPU Montgomery kernels pay ~2*L^2 = 512 u32-madds per field mul; the
MXU does int8 matmuls at ~50x the VPU's u32 throughput but only for SHARED
matrices.  DFT/NTT passes, Toeplitz products and other structured maps are
exactly that shape, so this module computes

    Y[a, c] = sum_k A[a, k] * X[k, c]  (mod p)

with A a CONSTANT field matrix (normal form) and X Montgomery limb tensors,
via 4-bit digit decomposition:

  1. decompose A (host) and X (device) into base-16 digits (int8);
  2. for each of A's 64 digit planes i: one int8 matmul
     A_i[r, r] @ XD[r, c*64] -> int32, shift-added into the digit
     convolution C[a, c, 127] (every entry < 128 * 15 * 15 * 64 = 2^21);
  3. fold C back to a field element: split the 508-bit value V into
     V_lo + 2^256 V_hi (per-limb carries in u32) and compute
     V mod p = V_lo + mont_mul(V_hi, R^2) with ONE Montgomery mul -- the
     only VPU-heavy step, amortized over r MXU-muls per output.

Because A is normal-form and X Montgomery, the result stays Montgomery
(sum a * (x R) = (sum a x) R): no extra REDC factor.

Reference parity: replaces per-element loops of
`Radix2EvaluationDomain::fft` butterflies (L0) for matrix-form NTT passes.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import field as F
from .field import FieldSpec

DIGITS = 64          # 4-bit digits per 256-bit value
DIG_BITS = 4
CONV = 2 * DIGITS - 1


def const_matrix_digits(spec: FieldSpec, a_rows) -> np.ndarray:
    """Host: field matrix (list of rows of ints, normal form) ->
    int8[DIGITS, r, k] digit planes."""
    r = len(a_rows)
    k = len(a_rows[0])
    out = np.zeros((DIGITS, r, k), dtype=np.int8)
    for i, row in enumerate(a_rows):
        for j, v in enumerate(row):
            v = int(v) % spec.p
            for d in range(DIGITS):
                out[d, i, j] = (v >> (DIG_BITS * d)) & 0xF
    return out


def digit_decompose(spec: FieldSpec, x: jnp.ndarray) -> jnp.ndarray:
    """[L, ...] u32 16-bit limbs -> [..., L*4] int8 4-bit digits
    (digit axis minor, least significant first)."""
    L = spec.num_limbs
    # [L, ...] -> [..., L]
    xt = jnp.moveaxis(x, 0, -1)
    d0 = (xt & 0xF).astype(jnp.int8)
    d1 = ((xt >> 4) & 0xF).astype(jnp.int8)
    d2 = ((xt >> 8) & 0xF).astype(jnp.int8)
    d3 = ((xt >> 12) & 0xF).astype(jnp.int8)
    return jnp.stack([d0, d1, d2, d3], axis=-1).reshape(
        xt.shape[:-1] + (L * 4,))


def _conv_matmul(a_digits: jnp.ndarray, xd: jnp.ndarray) -> jnp.ndarray:
    """a_digits int8[DIGITS, r, k]; xd int8[k, C, DIGITS] ->
    conv int32[r, C, CONV]."""
    r = a_digits.shape[1]
    k = a_digits.shape[0] and a_digits.shape[2]
    Cc = xd.shape[1]
    xflat = xd.reshape(k, Cc * DIGITS)

    def body(i, acc):
        ai = jax.lax.dynamic_index_in_dim(a_digits, i, axis=0,
                                          keepdims=False)
        pi = jax.lax.dot_general(
            ai, xflat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)          # [r, C*DIGITS]
        pi = pi.reshape(r, Cc, DIGITS)
        pad = jnp.zeros((r, Cc, CONV - DIGITS), jnp.int32)
        shifted = jnp.roll(jnp.concatenate([pi, pad], axis=2), i, axis=2)
        return acc + shifted

    acc = jnp.zeros((r, Cc, CONV), jnp.int32)
    return jax.lax.fori_loop(0, DIGITS, body, acc)


def _fold_to_field(spec: FieldSpec, conv: jnp.ndarray) -> jnp.ndarray:
    """int32[..., CONV] base-16 digit convolution (entries < 2^22) ->
    [L, ...] u32 Montgomery limbs of the value mod p."""
    L = spec.num_limbs
    batch = conv.shape[:-1]
    # split each digit into lo12 + 2^12 hi so per-limb u32 sums stay < 2^27
    lo = conv & 0xFFF
    hi = conv >> 12
    # pad CONV -> 2*DIGITS so limb grouping is even
    pad = jnp.zeros(batch + (2 * DIGITS - CONV,), jnp.int32)
    lo = jnp.concatenate([lo, pad], axis=-1).reshape(batch + (2 * L, 4))
    hi = jnp.concatenate([hi, pad], axis=-1).reshape(batch + (2 * L, 4))
    w = jnp.asarray([1, 16, 256, 4096], jnp.int32)
    lo_limbs = (lo * w).sum(-1)                       # [..., 2L] < 2^26
    hi_limbs = (hi * w).sum(-1)                       # [..., 2L] < 2^14

    # value = LO + 2^12 * HI, in u32 limb-major [2L, ...]
    lo_limbs = jnp.moveaxis(lo_limbs, -1, 0).astype(jnp.uint32)
    hi_limbs = jnp.moveaxis(hi_limbs, -1, 0).astype(jnp.uint32)
    # 2^12 * HI: in-limb low nibble << 12, the rest carries into the next limb
    hi_shift = (hi_limbs & 0xF) << 12
    hi_carry = hi_limbs >> 4                          # bits above 16
    total = lo_limbs + hi_shift                       # < 2^27
    total = total.at[1:].add(hi_carry[:-1])           # still < 2^27

    # carry-normalize 2L u32 accumulators -> 2L u16 limbs + top carry
    def carry_pass(t):
        c = t >> 16
        t = t & 0xFFFF
        return t.at[1:].add(c[:-1]), c[-1]

    t = total
    top = jnp.zeros_like(t[0])
    for _ in range(3):                    # 3 passes: carries <= 2^11 settle
        t, c = carry_pass(t)
        top = top + c
    v_lo = t[:L]
    v_hi = t[L:]
    # V = V_lo + 2^256 V_hi + 2^512 top  (V < 128 p^2 < 2^515, so the top
    # word is a single small limb).  mont_mul by 2^{256+256k} mod p moves
    # each group down: mul(x, 2^512 mod p) = x * 2^256 (mod p), etc.
    # F.mul's CIOS bound (< p for a < R, b < p) makes hi/top parts
    # canonical; v_lo itself is only < R = 2^256, so bring it under p with
    # ceil(R/p) conditional subtracts (F.add-zero passes) -- REQUIRED so
    # chained MXU ops never overflow the 2^256 limb budget.
    bshape = (L,) + (1,) * len(batch)
    r2 = _rk_const(spec, 2)
    hi_part = F.mul(spec, v_hi,
                    jnp.broadcast_to(r2.reshape(bshape), v_hi.shape))
    top_limbs = jnp.zeros((L,) + batch, jnp.uint32).at[0].set(top)
    r3 = _rk_const(spec, 3)
    top_part = F.mul(spec, top_limbs,
                     jnp.broadcast_to(r3.reshape(bshape), top_limbs.shape))
    zero = jnp.zeros_like(v_lo)
    for _ in range(-((1 << (16 * L)) // -spec.p) - 1):   # ceil(R/p) - 1
        v_lo = F.add(spec, v_lo, zero)
    return F.add(spec, F.add(spec, v_lo, hi_part), top_part)


@functools.lru_cache(maxsize=None)
def _rk_np(spec: FieldSpec, k: int):
    from ..utils.bigint import ints_to_limbs
    return ints_to_limbs([pow(2, 16 * spec.num_limbs * k, spec.p)],
                         spec.num_limbs)[:, 0]


def _rk_const(spec: FieldSpec, k: int) -> jnp.ndarray:
    """2^(256k) mod p as plain limbs; F.mul(x, this) == x * 2^(256(k-1))."""
    return jnp.asarray(_rk_np(spec, k))


def field_matmul_const(spec: FieldSpec, a_digits, x: jnp.ndarray
                       ) -> jnp.ndarray:
    """Y = A @ X (mod p): a_digits int8[DIGITS, r, k] (normal-form constant
    matrix), x [L, k, C] Montgomery -> [L, r, C] Montgomery."""
    xd = digit_decompose(spec, x)                     # [k, C, 64]
    conv = _conv_matmul(jnp.asarray(a_digits), xd)    # [r, C, 127]
    return _fold_to_field(spec, conv)
