"""Pippenger multi-scalar multiplication on TPU.

TPU-native replacement for arkworks ``VariableBaseMSM::msm_bigint`` - the
second hot loop of the prover (SURVEY.md §3.1; KZG commit at
`primitives/src/pcs/univariate_kzg/mod.rs:108-112`).

Design (v2, fully batched):
  * every (polynomial, window) pair is an independent "job";
  * jobs are processed as a BATCH axis of the bucket accumulation, so the
    sequential depth of the whole multi-commitment MSM is
    R + O(log) steps (R = n/lanes), regardless of how many jobs there are;
  * bucket accumulation is the O(n) chunked running-sum scan: each of
    `lanes` lanes owns a contiguous chunk of the digit-sorted points and
    adds them sequentially; segments that cross lane boundaries are
    reassembled with a log-depth segmented run-sum and a second scatter.
  * jobs are grouped into memory-bounded chunks (each job needs its own
    sorted copy of the points: L*3*4 bytes/point/job).

Scalars must be in *normal* (non-Montgomery) form; windows are c <= 16 bits
(cross-limb digit extraction supported).
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
    return jnp.roll(x, -shift, axis=axis)


# ---------------------------------------------------------------------------
# generic EC suffix-cumsum / tree-sum along the LAST axis (any leading dims)
# ---------------------------------------------------------------------------

def _suffix_cumsum_ec(spec: FieldSpec, pts, log_m: int):
    """Unsegmented inclusive suffix cumsum with EC adds over [..., m]."""
    m = pts[0].shape[-1]
    idx = jnp.arange(m, dtype=jnp.int32)

    def body(carry, shift):
        pts, = carry
        shifted = tuple(_roll_neg(t, shift, axis=-1) for t in pts)
        valid = idx + shift < m
        summed = E.jac_add(spec, pts, shifted)
        pts = _sel_tuple(valid, summed, pts)
        return (pts,), None

    shifts = jnp.asarray([1 << s for s in range(log_m)], dtype=jnp.int32)
    (pts,), _ = jax.lax.scan(body, (pts,), shifts)
    return pts


def _tree_sum_ec(spec: FieldSpec, pts):
    """Sum points along the last axis (log-depth, same-shape scan)."""
    m = pts[0].shape[-1]
    steps = max(1, (m - 1).bit_length())
    mfull = 1 << steps
    if mfull != m:
        inf = E.jac_infinity(spec, pts[0].shape[1:-1] + (mfull - m,))
        pts = tuple(jnp.concatenate([t, i], axis=-1) for t, i in zip(pts, inf))
    idx = jnp.arange(mfull, dtype=jnp.int32)

    def body(carry, half):
        pts, = carry
        shifted = tuple(_roll_neg(t, half, axis=-1) for t in pts)
        summed = E.jac_add(spec, pts, shifted)
        keep = idx < half
        pts = _sel_tuple(keep, summed, pts)
        return (pts,), None

    halves = jnp.asarray([mfull >> (s + 1) for s in range(steps)], dtype=jnp.int32)
    (pts,), _ = jax.lax.scan(body, (pts,), halves)
    return tuple(t[..., 0] for t in pts)


# ---------------------------------------------------------------------------
# digits
# ---------------------------------------------------------------------------

def _window_digits(scalars: jnp.ndarray, c: int) -> jnp.ndarray:
    """[Lr, n] 16-bit limbs (normal form) -> [W, n] int32 window digits.

    Supports any window width c <= 16 via cross-limb bit extraction.
    """
    Lr, n = scalars.shape
    s = scalars.astype(jnp.int32)
    if c == 16:
        return s
    if c == 8:
        lo = s & 0xFF
        hi = s >> 8
        return jnp.stack([lo, hi], axis=1).reshape(2 * Lr, n)
    total_bits = 16 * Lr
    W = (total_bits + c - 1) // c
    padded = jnp.concatenate([s, jnp.zeros((1, n), dtype=jnp.int32)], axis=0)
    rows = []
    for w in range(W):
        bit = c * w
        j, off = bit // 16, bit % 16
        d = (padded[j] >> off) | (padded[j + 1] << (16 - off))
        rows.append(d & ((1 << c) - 1))
    return jnp.stack(rows)


@functools.partial(jax.jit, static_argnums=1)
def _window_digits_batch(scalars, c: int):
    """[k, Lr, n] -> [k, W, n] (cached jit; avoids per-call vmap retraces)."""
    return jax.vmap(lambda s: _window_digits(s, c))(scalars)


def num_windows(spec_r_limbs: int, c: int) -> int:
    if c == 16:
        return spec_r_limbs
    if c == 8:
        return 2 * spec_r_limbs
    return (16 * spec_r_limbs + c - 1) // c


# ---------------------------------------------------------------------------
# chunked bucket accumulation (batched over jobs)
# ---------------------------------------------------------------------------

def _bucket_accumulate_chunked(spec: FieldSpec, pts, d_sorted, c: int, lanes: int):
    """O(n) bucket accumulation with a job batch axis.

    pts: jacobian tuple [L, J, n_pad] SORTED by digit per job;
    d_sorted: int32 [J, n_pad].  Padding entries carry digit `nbuckets` and
    infinity points.  Returns bucket tuple [L, J, nbuckets + 1].
    """
    J, n_pad = d_sorted.shape
    C = lanes
    R = n_pad // C
    nbuckets = 1 << c
    L = spec.num_limbs

    # lane-major chunking: lane owns sorted [lane*R, (lane+1)*R)
    ids = jnp.moveaxis(d_sorted.reshape(J, C, R), 2, 0)        # [R, J, C]
    coords = tuple(jnp.moveaxis(t.reshape(L, J, C, R), 3, 0) for t in pts)
    xs = coords + (ids,)                                       # [R, L, J, C] x3, [R, J, C]

    acc0 = E.jac_infinity(spec, (J, C))
    curid0 = jnp.full((J, C), -1, dtype=jnp.int32)

    def body(carry, x):
        acc, cur_id = carry
        rx, ry, rz, rid = x
        pt = (rx, ry, rz)
        same = rid == cur_id
        added = E.jac_add(spec, acc, pt)
        acc_new = _sel_tuple(same, added, pt)
        flush = _sel_tuple(same, E.jac_infinity(spec, (J, C)), acc)
        return (acc_new, rid), (flush, cur_id)

    (trail_acc, trail_id), (flushes, flush_ids) = jax.lax.scan(
        body, (acc0, curid0), xs)
    # flushes: tuple [R, L, J, C]; flush_ids: [R, J, C]

    # --- B1: interior flushes (unique bucket ids per job) -----------------
    fl = tuple(jnp.moveaxis(t, 0, 3).reshape(L, J, C * R) for t in flushes)
    fid = jnp.moveaxis(flush_ids, 0, 2).reshape(J, C * R)
    real = (fid > 0) & (fid < nbuckets) & ~E.jac_is_inf(spec, fl)
    scatter_idx = jnp.where(real, fid, nbuckets)
    # flatten the job axis into the scatter index for one global scatter
    job = jnp.arange(J, dtype=jnp.int32)[:, None]
    flat_idx = (job * (nbuckets + 1) + scatter_idx).reshape(J * C * R)
    binf_flat = E.jac_infinity(spec, (J * (nbuckets + 1),))
    fl_flat = tuple(t.reshape(L, J * C * R) for t in fl)
    b1 = tuple(b.at[:, flat_idx].set(t, mode="drop")
               for b, t in zip(binf_flat, fl_flat))
    b1 = tuple(t.reshape(L, J, nbuckets + 1) for t in b1)

    # --- stitch: segmented backward run-sum over trailing accs ------------
    lane_idx = jnp.arange(C, dtype=jnp.int32)
    S = trail_acc
    shift = 1
    while shift < C:
        rolled = tuple(jnp.roll(t, shift, axis=-1) for t in S)
        rolled_id = jnp.roll(trail_id, shift, axis=-1)
        ok = (lane_idx >= shift) & (rolled_id == trail_id)
        added = E.jac_add(spec, S, rolled)
        S = _sel_tuple(ok, added, S)
        shift *= 2

    first_id = ids[0]                                          # [J, C]
    minus1 = jnp.full((J, 1), -1, jnp.int32)
    prev_trail_id = jnp.concatenate([minus1, trail_id[:, :-1]], axis=1)
    prev_S = tuple(jnp.roll(t, 1, axis=-1) for t in S)

    carry_ok = ((first_id == prev_trail_id) & (first_id != trail_id)
                & (first_id > 0) & (first_id < nbuckets) & (lane_idx > 0))
    carry_idx = jnp.where(carry_ok, first_id, nbuckets)

    next_first = jnp.concatenate(
        [first_id[:, 1:], jnp.full((J, 1), -2, jnp.int32)], axis=1)
    bnd_ok = (trail_id != next_first) & (trail_id > 0) & (trail_id < nbuckets)
    bnd_idx = jnp.where(bnd_ok, trail_id, nbuckets)

    carry_flat = (job * (nbuckets + 1) + carry_idx).reshape(J * C)
    bnd_flat = (job * (nbuckets + 1) + bnd_idx).reshape(J * C)
    b2 = tuple(b.at[:, carry_flat].set(t.reshape(L, J * C), mode="drop")
               for b, t in zip(binf_flat, prev_S))
    b2 = tuple(b.at[:, bnd_flat].set(t.reshape(L, J * C), mode="drop")
               for b, t in zip(b2, S))
    b2 = tuple(t.reshape(L, J, nbuckets + 1) for t in b2)

    return E.jac_add(spec, b1, b2)


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def _msm_jobs(spec: FieldSpec, points, digits, c: int, lanes: int):
    """Batched bucket accumulation + reduction for J jobs.

    points: affine batch (x, y, inf) [L, n]/[n];  digits: [J, n].
    Returns window sums as a jacobian tuple of [L, J].
    """
    J, n = digits.shape
    nbuckets = 1 << c
    x, y, inf_mask = points
    one = F.ones(spec, (n,))
    zero_z = jnp.where(inf_mask[None, :], F.zeros(spec, (n,)), one)

    n_pad = ((n + lanes - 1) // lanes) * lanes
    padk = n_pad - n
    if padk:
        x = jnp.concatenate([x, F.ones(spec, (padk,))], axis=1)
        y = jnp.concatenate([y, F.ones(spec, (padk,))], axis=1)
        zero_z = jnp.concatenate([zero_z, F.zeros(spec, (padk,))], axis=1)
        digits = jnp.concatenate(
            [digits, jnp.full((J, padk), nbuckets, jnp.int32)], axis=1)

    # zero digits and infinity points -> dummy bucket (sorts to the tail)
    d = jnp.where((digits == 0) | F.is_zero(spec, zero_z)[None, :],
                  nbuckets, digits)
    order = jnp.argsort(d, axis=1)                       # [J, n_pad]
    d_sorted = jnp.take_along_axis(d, order, axis=1)
    pts_sorted = tuple(jnp.take(t, order, axis=1)        # [L, J, n_pad]
                       for t in (x, y, zero_z))
    buckets = _bucket_accumulate_chunked(spec, pts_sorted, d_sorted, c, lanes)
    buckets = tuple(t[..., :nbuckets] for t in buckets)
    suf = _suffix_cumsum_ec(spec, buckets, c)
    suf = tuple(t[..., 1:] for t in suf)                 # drop bucket 0
    return _tree_sum_ec(spec, suf)                       # [L, J]


@functools.partial(jax.jit, static_argnums=(0, 2))
def _combine_windows(spec: FieldSpec, wsums, c: int):
    """Horner combine over the window axis: wsums jacobian tuple [L, k, W]."""
    W = wsums[0].shape[-1]

    def body(res, w):
        def dbl(_, r):
            return E.jac_double(spec, r)
        res = jax.lax.fori_loop(0, c, dbl, res)
        wp = tuple(t[..., W - 1 - w] for t in wsums)     # [L, k]
        return E.jac_add(spec, res, wp), None

    init = E.jac_infinity(spec, wsums[0].shape[1:-1])
    res, _ = jax.lax.scan(body, init, jnp.arange(W))
    return res


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def _pick_params(n: int, j_jobs: int = 1):
    """Window width c, lane count, and job-chunk size for an MSM of size n."""
    if n >= (1 << 18):
        c = 13
    elif n >= (1 << 12):
        c = 10
    else:
        c = 8
    lanes = 1 << min(12, max(3, n.bit_length() - 3))
    # memory cap for sorted point copies: ~1.5 GB of uint32 limbs
    per_job_bytes = 3 * 4 * 32 * max(n, 1)
    job_chunk = max(1, min(64, int(1.5e9 // per_job_bytes)))
    return c, lanes, job_chunk


def msm_batch(spec: FieldSpec, points, scalars_list, c: int | None = None,
              lanes: int | None = None):
    """k MSMs over SHARED bases: sum_i scalars[k][i] * points_i for each k.

    scalars_list: list of [Lr, n] normal-form limb tensors (or [k, Lr, n]).
    Returns a jacobian tuple of [L, k].
    """
    if isinstance(scalars_list, (list, tuple)):
        scalars = jnp.stack(list(scalars_list))          # [k, Lr, n]
    else:
        scalars = scalars_list
    k, Lr, n = scalars.shape
    c_auto, lanes_auto, job_chunk = _pick_params(n, k)
    c = c_auto if c is None else c
    lanes = lanes_auto if lanes is None else lanes
    W = num_windows(Lr, c)

    import os, sys, time
    trace = os.environ.get("MPC_JELLYFISH_TPU_TRACE", "") == "1"
    t0 = time.time()
    digits = _window_digits_batch(scalars, c).reshape(k * W, n)
    if trace:
        jax.block_until_ready(digits)
        print(f"        [msm] digits: {time.time()-t0:.2f}s", file=sys.stderr, flush=True)
        t0 = time.time()

    # pad the job axis to a multiple of job_chunk with dummy (zero-digit)
    # jobs: every chunk then has the SAME shape -> one compiled executable
    J = k * W
    J_pad = ((J + job_chunk - 1) // job_chunk) * job_chunk
    if J_pad != J:
        digits = jnp.concatenate(
            [digits, jnp.zeros((J_pad - J, n), jnp.int32)], axis=0)
    outs = []
    for start in range(0, J_pad, job_chunk):
        chunk = digits[start:start + job_chunk]
        outs.append(_msm_jobs(spec, points, chunk, c, lanes))
        if trace:
            jax.block_until_ready(outs[-1])
            print(f"        [msm] jobs[{start}:{start+job_chunk}]: {time.time()-t0:.2f}s",
                  file=sys.stderr, flush=True)
            t0 = time.time()
    wsums = tuple(jnp.concatenate([o[i] for o in outs], axis=1)[:, :J]
                  for i in range(3))                     # [L, k*W]
    wsums = tuple(t.reshape(spec.num_limbs, k, W) for t in wsums)
    res = _combine_windows(spec, wsums, c)
    if trace:
        jax.block_until_ready(res)
        print(f"        [msm] combine: {time.time()-t0:.2f}s", file=sys.stderr, flush=True)
    return res


def msm(spec: FieldSpec, points, scalars: jnp.ndarray, c: int | None = None,
        lanes: int | None = None):
    """Single MSM: sum_i scalars_i * points_i -> jacobian tuple of [L]."""
    res = msm_batch(spec, points, scalars[None], c=c, lanes=lanes)
    return tuple(t[:, 0] for t in res)
