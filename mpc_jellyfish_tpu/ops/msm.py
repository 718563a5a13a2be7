"""Pippenger multi-scalar multiplication on TPU.

TPU-native replacement for arkworks ``VariableBaseMSM::msm_bigint`` - the
second hot loop of the prover (SURVEY.md §3.1; KZG commit at
`primitives/src/pcs/univariate_kzg/mod.rs:108-112`).

Algorithm (v1, fully vectorized, no data-dependent control flow):
  for every c-bit window (processed as one lax.scan over windows):
    1. digits = window digits of all scalars            [n]
    2. sort points by digit (argsort + gather)
    3. segmented suffix-scan with EC adds (Hillis-Steele, log2(n) steps)
       -> run-head element holds the full bucket sum
    4. collision-free scatter of run heads into the bucket array
    5. bucket reduction sum_b b*B_b via suffix cumsum + tree reduce
  combine windows with c doublings each (Horner).

Windows are c in {8, 16} bits so digits align with the 16-bit limb
representation (no cross-limb bit surgery).  Scalars must be passed in
*normal* (non-Montgomery) form.

The log2(n) factor in step 3 is the known v1 inefficiency; the planned v2
replaces it with a chunked O(n) running-accumulator scan (see module TODO).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import field as F
from . import ec as E
from .field import FieldSpec


def _sel_tuple(cond, a, b):
    return tuple(F.select(cond, ai, bi) for ai, bi in zip(a, b))


def _roll_neg(x, shift, axis):
    """jnp.roll by -shift along axis (shift may be traced)."""
    return jnp.roll(x, -shift, axis=axis)


def _segmented_suffix_scan(spec: FieldSpec, pts, seg_ids, log_n: int):
    """Inclusive segmented suffix scan with EC-add combine.

    pts: jacobian tuple of [L, n]; seg_ids: int32 [n] (sorted runs).
    After the scan, the first element of each run holds the run's sum.
    """
    n = seg_ids.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)

    def body(carry, shift):
        pts, = carry
        shifted = tuple(_roll_neg(t, shift, axis=1) for t in pts)
        ids_shifted = _roll_neg(seg_ids, shift, axis=0)
        valid = (idx + shift < n) & (ids_shifted == seg_ids)
        summed = E.jac_add(spec, pts, shifted)
        pts = _sel_tuple(valid, summed, pts)
        return (pts,), None

    shifts = jnp.asarray([1 << s for s in range(log_n)], dtype=jnp.int32)
    (pts,), _ = jax.lax.scan(body, (pts,), shifts)
    return pts


def _suffix_cumsum_ec(spec: FieldSpec, pts, log_m: int):
    """Unsegmented inclusive suffix cumsum with EC adds over [L, m]."""
    m = pts[0].shape[1]
    idx = jnp.arange(m, dtype=jnp.int32)

    def body(carry, shift):
        pts, = carry
        shifted = tuple(_roll_neg(t, shift, axis=1) for t in pts)
        valid = idx + shift < m
        summed = E.jac_add(spec, pts, shifted)
        pts = _sel_tuple(valid, summed, pts)
        return (pts,), None

    shifts = jnp.asarray([1 << s for s in range(log_m)], dtype=jnp.int32)
    (pts,), _ = jax.lax.scan(body, (pts,), shifts)
    return pts


def _tree_sum_ec(spec: FieldSpec, pts):
    """Sum all points along axis 1 (log-depth, same-shape scan).

    Each step folds element i+half into element i (half = m/2, m/4, ...);
    masking keeps the shape constant so the whole reduction is one scan body.
    """
    m = pts[0].shape[1]
    steps = max(1, (m - 1).bit_length())
    mfull = 1 << steps
    if mfull != m:
        inf = E.jac_infinity(spec, (mfull - m,))
        pts = tuple(jnp.concatenate([t, i], axis=1) for t, i in zip(pts, inf))
    idx = jnp.arange(mfull, dtype=jnp.int32)

    def body(carry, half):
        pts, = carry
        shifted = tuple(_roll_neg(t, half, axis=1) for t in pts)
        summed = E.jac_add(spec, pts, shifted)
        keep = idx < half
        pts = _sel_tuple(keep, summed, pts)
        return (pts,), None

    halves = jnp.asarray([mfull >> (s + 1) for s in range(steps)], dtype=jnp.int32)
    (pts,), _ = jax.lax.scan(body, (pts,), halves)
    return tuple(t[:, 0] for t in pts)


def _window_digits(scalars: jnp.ndarray, c: int) -> jnp.ndarray:
    """[Lr, n] 16-bit limbs (normal form) -> [W, n] int32 window digits."""
    Lr, n = scalars.shape
    s = scalars.astype(jnp.int32)
    if c == 16:
        return s
    assert c == 8
    lo = s & 0xFF
    hi = s >> 8
    return jnp.stack([lo, hi], axis=1).reshape(2 * Lr, n)


@functools.partial(jax.jit, static_argnums=(0, 3))
def _msm_windows(spec: FieldSpec, points, digits, c: int):
    """Per-window bucket accumulation + reduction.  Returns window sums [W]."""
    W, n = digits.shape
    log_n = max(1, (n - 1).bit_length())
    nbuckets = 1 << c
    x, y, inf_mask = points
    one = F.ones(spec, (n,))
    zero_z = jnp.where(inf_mask[None, :], F.zeros(spec, (n,)), one)
    pts_jac = (x, y, zero_z)  # affine lifted to jacobian (Z=0 for infinity)

    def per_window(carry, d):
        order = jnp.argsort(d)
        d_sorted = d[order]
        pts = tuple(t[:, order] for t in pts_jac)
        # zero-digit entries contribute nothing: retarget to dummy bucket
        pts = _segmented_suffix_scan(spec, pts, d_sorted, log_n)
        # run heads
        prev = jnp.concatenate([jnp.full((1,), -1, dtype=d_sorted.dtype), d_sorted[:-1]])
        is_head = d_sorted != prev
        scatter_idx = jnp.where(is_head & (d_sorted > 0), d_sorted, nbuckets)
        binf = E.jac_infinity(spec, (nbuckets + 1,))
        buckets = tuple(
            b.at[:, scatter_idx].set(t, mode="drop") for b, t in zip(binf, pts)
        )
        buckets = tuple(t[:, :nbuckets] for t in buckets)
        # sum_b b * B_b = sum_{j>=1} suffix_j
        suf = _suffix_cumsum_ec(spec, buckets, c)
        suf = tuple(t[:, 1:] for t in suf)  # drop j=0
        wsum = _tree_sum_ec(spec, suf)
        return carry, wsum

    _, wsums = jax.lax.scan(per_window, 0, digits)
    return wsums  # tuple of [W, L] ... (scan stacks on axis 0)


@functools.partial(jax.jit, static_argnums=(0, 2))
def _combine_windows(spec: FieldSpec, wsums, c: int):
    """Horner combine: res = sum_w 2^(c*w) W_w, from the top window down."""
    W = wsums[0].shape[0]

    def body(res, w):
        def dbl(_, r):
            return E.jac_double(spec, r)
        res = jax.lax.fori_loop(0, c, dbl, res)
        wp = tuple(t[W - 1 - w] for t in wsums)   # reversed order
        # scan provides [L] points; add as batch of size 1
        res = E.jac_add(spec, res, wp)
        return res, None

    # wsums leaves are [W, L] (scan stacked); transpose to [L] per step
    wsums = tuple(jnp.moveaxis(t, 0, 0) for t in wsums)
    init = E.jac_infinity(spec, ())
    res, _ = jax.lax.scan(body, init, jnp.arange(W))
    return res


def msm(spec: FieldSpec, points, scalars: jnp.ndarray, c: int | None = None):
    """MSM: sum_i scalars_i * points_i.

    points: device affine batch (x, y, inf_mask), coords Montgomery.
    scalars: [Lr, n] uint32 16-bit limbs in NORMAL (non-Montgomery) form.
    Returns a single Jacobian point (limb vectors of shape [L]).
    """
    n = scalars.shape[1]
    if c is None:
        c = 16 if n >= (1 << 16) else 8
    digits = _window_digits(scalars, c)
    wsums = _msm_windows(spec, points, digits, c)
    return _combine_windows(spec, wsums, c)
