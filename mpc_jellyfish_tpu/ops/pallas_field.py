"""Pallas TPU kernel for Montgomery multiplication.

The pure-XLA rolled implementation (`field._mul_rolled`) streams its
[2L+1, n] accumulator through HBM on every one of ~32 loop iterations -
measured ~1% of VPU peak.  This kernel keeps the whole accumulator in
VMEM/vector registers: HBM traffic drops to the optimal read-a, read-b,
write-out, and the fully unrolled 16x16 product/REDC schedule vectorizes on
the VPU.  (Unrolling inside a Pallas kernel is cheap to compile - the
kernel body is one block, not an n-sized XLA graph.)

Layout: operands are [L, N] uint32 16-bit limbs (Montgomery form), N tiled
into lane blocks.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.bigint import LIMB_BITS, LIMB_MASK

BLOCK = 512

# VPU register tile is (8, 128).  Each per-limb vector must be exactly ONE
# (8, 128) register: smaller wastes sublanes, larger (e.g. (32, 128) = 4
# registers/value) spills - the CIOS body holds ~65 live limb vectors, and
# spilling them costs ~180x (measured: coset NTT [L,20,2^17] 305 ms with
# (L, 512) blocks vs 1.7 ms with (L, 8, 128)).
LANES = 128
MAX_SUBS = 8


def _pick_subs(rows: int) -> int:
    """Largest sublane-block <= MAX_SUBS dividing `rows` (= elements/LANES)."""
    for s in (8, 4, 2, 1):
        if rows % s == 0:
            return s
    return 1


def _mont_mul_kernel_body(p_limbs, n0inv, L, a_ref, b_ref, o_ref):
    a = [a_ref[i] for i in range(L)]
    b = [b_ref[i] for i in range(L)]
    zero = jnp.zeros_like(a[0])
    acc = [zero] * (2 * L + 1)

    # schoolbook product with lazy 16-bit column accumulation (< 2^23)
    for i in range(L):
        for j in range(L):
            prod = a[i] * b[j]
            acc[i + j] = acc[i + j] + (prod & LIMB_MASK)
            acc[i + j + 1] = acc[i + j + 1] + (prod >> LIMB_BITS)

    # CIOS-style Montgomery reduction
    for i in range(L):
        m = ((acc[i] & LIMB_MASK) * n0inv) & LIMB_MASK
        for j in range(L):
            prod = m * p_limbs[j]
            acc[i + j] = acc[i + j] + (prod & LIMB_MASK)
            acc[i + j + 1] = acc[i + j + 1] + (prod >> LIMB_BITS)
        acc[i + 1] = acc[i + 1] + (acc[i] >> LIMB_BITS)

    # carry-propagate the high half
    res = []
    carry = zero
    for j in range(L, 2 * L):
        s = acc[j] + carry
        carry = s >> LIMB_BITS
        res.append(s & LIMB_MASK)

    # conditional subtract p (res < 2p guaranteed; 2p < 2^(16L))
    borrow = jnp.zeros_like(res[0], dtype=jnp.int32)
    sub = []
    for i in range(L):
        d = res[i].astype(jnp.int32) - np.int32(p_limbs[i]) - borrow
        borrow = (d < 0).astype(jnp.int32)
        sub.append((d + (borrow << LIMB_BITS)).astype(jnp.uint32))
    # geq: res >= p  <=>  no final borrow
    take_sub = borrow == 0
    for i in range(L):
        o_ref[i] = jnp.where(take_sub, sub[i], res[i])


def _mm_vecs(p_limbs, n0inv, L, a, b):
    """Montgomery product on lists of limb vectors (shared kernel helper)."""
    zero = jnp.zeros_like(a[0])
    acc = [zero] * (2 * L + 1)
    for i in range(L):
        for j in range(L):
            prod = a[i] * b[j]
            acc[i + j] = acc[i + j] + (prod & LIMB_MASK)
            acc[i + j + 1] = acc[i + j + 1] + (prod >> LIMB_BITS)
    for i in range(L):
        m = ((acc[i] & LIMB_MASK) * n0inv) & LIMB_MASK
        for j in range(L):
            prod = m * p_limbs[j]
            acc[i + j] = acc[i + j] + (prod & LIMB_MASK)
            acc[i + j + 1] = acc[i + j + 1] + (prod >> LIMB_BITS)
        acc[i + 1] = acc[i + 1] + (acc[i] >> LIMB_BITS)
    res = []
    carry = zero
    for j in range(L, 2 * L):
        s = acc[j] + carry
        carry = s >> LIMB_BITS
        res.append(s & LIMB_MASK)
    return _cond_sub_vecs(p_limbs, L, res)


def _cond_sub_vecs(p_limbs, L, res):
    borrow = jnp.zeros_like(res[0], dtype=jnp.int32)
    sub = []
    for i in range(L):
        d = res[i].astype(jnp.int32) - np.int32(p_limbs[i]) - borrow
        borrow = (d < 0).astype(jnp.int32)
        sub.append((d + (borrow << LIMB_BITS)).astype(jnp.uint32))
    take_sub = borrow == 0
    return [jnp.where(take_sub, s, r) for s, r in zip(sub, res)]


def _add_vecs(p_limbs, L, a, b):
    carry = jnp.zeros_like(a[0])
    s = []
    for i in range(L):
        t = a[i] + b[i] + carry
        carry = t >> LIMB_BITS
        s.append(t & LIMB_MASK)
    return _cond_sub_vecs(p_limbs, L, s)


def _sub_vecs(p_limbs, L, a, b):
    borrow = jnp.zeros_like(a[0], dtype=jnp.int32)
    d = []
    for i in range(L):
        t = a[i].astype(jnp.int32) - b[i].astype(jnp.int32) - borrow
        borrow = (t < 0).astype(jnp.int32)
        d.append((t + (borrow << LIMB_BITS)).astype(jnp.uint32))
    need_p = borrow > 0
    carry = jnp.zeros_like(a[0])
    out = []
    for i in range(L):
        t = d[i] + jnp.where(need_p, np.uint32(p_limbs[i]), np.uint32(0)) + carry
        carry = t >> LIMB_BITS
        out.append(t & LIMB_MASK)
    return out


def _neg_vecs(p_limbs, L, a):
    """p - a on limb vectors (a in [0, p); a == 0 gives p, callers mask)."""
    borrow = jnp.zeros_like(a[0], dtype=jnp.int32)
    out = []
    for i in range(L):
        t = np.int32(p_limbs[i]) - a[i].astype(jnp.int32) - borrow
        borrow = (t < 0).astype(jnp.int32)
        out.append((t + (borrow << LIMB_BITS)).astype(jnp.uint32))
    return out


def _butterfly_kernel_body(p_limbs, n0inv, L, a_ref, b_ref, w_ref,
                           s_ref, d_ref):
    """One constant-geometry DIF stage block: s = a + b, d = (a - b) * w."""
    a = [a_ref[i] for i in range(L)]
    b = [b_ref[i] for i in range(L)]
    w = [w_ref[i] for i in range(L)]
    s = _add_vecs(p_limbs, L, a, b)
    d = _mm_vecs(p_limbs, n0inv, L, _sub_vecs(p_limbs, L, a, b), w)
    for i in range(L):
        s_ref[i] = s[i]
        d_ref[i] = d[i]


@functools.partial(jax.jit, static_argnums=(0,))
def ntt_stage_pallas(spec, x: jnp.ndarray, w_dense: jnp.ndarray) -> jnp.ndarray:
    """Fused butterfly stage: x [L, n] or [L, B, n], w_dense [L, n/2]
    -> same shape, interleaved(a+b, (a-b)*w).

    One fused compute pass; a poly batch rides a second grid dimension (the
    interleave itself is a cheap XLA reshuffle; Mosaic cannot emit strided
    interleaved stores)."""
    L = spec.num_limbs
    batched = x.ndim == 3
    B = x.shape[1] if batched else 1
    n = x.shape[-1]
    h = n // 2
    assert h % LANES == 0, "pallas NTT stage needs n >= 256"
    h_rows = h // LANES
    # Mosaic block rule: sublane block dims must be multiples of 8 (or equal
    # to the full array dim — never the case here: a block covers one half).
    assert h_rows % 8 == 0, (
        f"pallas NTT stage needs n >= 2048 (got n={n}); callers must gate "
        f"via ntt._stage_pallas_ok")
    hb_rows = _pick_subs(h_rows)
    kernel = functools.partial(
        _butterfly_kernel_body,
        tuple(np.uint32(v) for v in spec.p_limbs), np.uint32(spec.n0inv), L)
    nb = h_rows // hb_rows     # blocks per half
    nfb = 2 * nb               # blocks per full poly
    xf = x.reshape(L, B * n // LANES, LANES)
    wf = w_dense.reshape(L, h_rows, LANES)
    s, d = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((L, B * h_rows, LANES), jnp.uint32),
                   jax.ShapeDtypeStruct((L, B * h_rows, LANES), jnp.uint32)),
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((L, hb_rows, LANES),
                         lambda b, i, _n=nfb: (0, b * _n + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, hb_rows, LANES),
                         lambda b, i, _n=nfb, _h=nb: (0, b * _n + _h + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, hb_rows, LANES), lambda b, i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((L, hb_rows, LANES),
                         lambda b, i, _h=nb: (0, b * _h + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, hb_rows, LANES),
                         lambda b, i, _h=nb: (0, b * _h + i, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(xf, xf, wf)
    # interleave(s, d) via interior-dilated pads: a trailing stack axis of
    # size 2 forces an 8x-padded {.., 2} layout (12.5GB buffer at n=2^20
    # batched - OOMs compile); two dilated pads + bitwise-or keep every
    # intermediate in the clean [L, B, n] tiling.
    s3 = s.reshape(L, B, h)
    d3 = d.reshape(L, B, h)
    zero = jnp.uint32(0)
    cfg_s = [(0, 0, 0), (0, 0, 0), (0, 1, 1)]   # -> positions 0, 2, 4, ...
    cfg_d = [(0, 0, 0), (0, 0, 0), (1, 0, 1)]   # -> positions 1, 3, 5, ...
    out = jax.lax.pad(s3, zero, cfg_s) | jax.lax.pad(d3, zero, cfg_d)
    return out if batched else out[:, 0]


def _add_kernel_body(p_limbs, L, a_ref, b_ref, o_ref):
    carry = jnp.zeros_like(a_ref[0])
    s = []
    for i in range(L):
        t = a_ref[i] + b_ref[i] + carry
        carry = t >> LIMB_BITS
        s.append(t & LIMB_MASK)
    # conditional subtract p when s >= p (sum < 2p < 2^(16L), carry-out == 0)
    borrow = jnp.zeros_like(s[0], dtype=jnp.int32)
    sub = []
    for i in range(L):
        d = s[i].astype(jnp.int32) - np.int32(p_limbs[i]) - borrow
        borrow = (d < 0).astype(jnp.int32)
        sub.append((d + (borrow << LIMB_BITS)).astype(jnp.uint32))
    take_sub = borrow == 0
    for i in range(L):
        o_ref[i] = jnp.where(take_sub, sub[i], s[i])


def _sub_kernel_body(p_limbs, L, a_ref, b_ref, o_ref):
    borrow = jnp.zeros_like(a_ref[0], dtype=jnp.int32)
    d = []
    for i in range(L):
        t = a_ref[i].astype(jnp.int32) - b_ref[i].astype(jnp.int32) - borrow
        borrow = (t < 0).astype(jnp.int32)
        d.append((t + (borrow << LIMB_BITS)).astype(jnp.uint32))
    # if borrow: result += p
    need_p = borrow > 0
    carry = jnp.zeros_like(a_ref[0])
    for i in range(L):
        t = d[i] + jnp.where(need_p, np.uint32(p_limbs[i]), np.uint32(0)) + carry
        carry = t >> LIMB_BITS
        o_ref[i] = t & LIMB_MASK


def _binary_pallas(spec, kernel_body, a, b):
    L = spec.num_limbs
    shape = a.shape
    n = int(np.prod(shape[1:])) if len(shape) > 1 else 1
    blk = MAX_SUBS * LANES
    n_pad = ((n + blk - 1) // blk) * blk
    af = a.reshape(L, n)
    bf = b.reshape(L, n)
    if n_pad != n:
        pad = jnp.zeros((L, n_pad - n), dtype=jnp.uint32)
        af = jnp.concatenate([af, pad], axis=1)
        bf = jnp.concatenate([bf, pad], axis=1)
    af = af.reshape(L, n_pad // LANES, LANES)
    bf = bf.reshape(L, n_pad // LANES, LANES)
    kernel = functools.partial(kernel_body,
                               tuple(np.uint32(x) for x in spec.p_limbs), L)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, n_pad // LANES, LANES), jnp.uint32),
        grid=(n_pad // blk,),
        in_specs=[
            pl.BlockSpec((L, MAX_SUBS, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, MAX_SUBS, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, MAX_SUBS, LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
    )(af, bf)
    out = out.reshape(L, n_pad)
    if n_pad != n:
        out = out[:, :n]
    return out.reshape(shape)


@functools.partial(jax.jit, static_argnums=(0,))
def mont_add_pallas(spec, a, b):
    """Modular add over [L, *batch] limb tensors (TPU Pallas)."""
    return _binary_pallas(spec, _add_kernel_body, a, b)


@functools.partial(jax.jit, static_argnums=(0,))
def mont_sub_pallas(spec, a, b):
    """Modular sub over [L, *batch] limb tensors (TPU Pallas)."""
    return _binary_pallas(spec, _sub_kernel_body, a, b)


@functools.partial(jax.jit, static_argnums=(0,))
def mont_mul_pallas(spec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product over [L, *batch] limb tensors (TPU Pallas)."""
    L = spec.num_limbs
    shape = a.shape
    n = int(np.prod(shape[1:])) if len(shape) > 1 else 1
    blk = MAX_SUBS * LANES
    n_pad = ((n + blk - 1) // blk) * blk
    af = a.reshape(L, n)
    bf = b.reshape(L, n)
    if n_pad != n:
        pad = jnp.zeros((L, n_pad - n), dtype=jnp.uint32)
        af = jnp.concatenate([af, pad], axis=1)
        bf = jnp.concatenate([bf, pad], axis=1)
    af = af.reshape(L, n_pad // LANES, LANES)
    bf = bf.reshape(L, n_pad // LANES, LANES)

    kernel = functools.partial(
        _mont_mul_kernel_body,
        tuple(np.uint32(x) for x in spec.p_limbs),
        np.uint32(spec.n0inv), L)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, n_pad // LANES, LANES), jnp.uint32),
        grid=(n_pad // blk,),
        in_specs=[
            pl.BlockSpec((L, MAX_SUBS, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, MAX_SUBS, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, MAX_SUBS, LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=int(n_pad) * (2 * L * L * 3 + 8 * L),
            bytes_accessed=3 * L * int(n_pad) * 4,
            transcendentals=0,
        ),
    )(af, bf)
    out = out.reshape(L, n_pad)
    if n_pad != n:
        out = out[:, :n]
    return out.reshape(shape)
