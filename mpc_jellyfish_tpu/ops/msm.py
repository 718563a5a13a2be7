"""Pippenger multi-scalar multiplication on TPU (v3, suffix-sum form).

TPU-native replacement for arkworks ``VariableBaseMSM::msm_bigint`` — the
hot loop of KZG commitment (SURVEY.md §3.1;
`primitives/src/pcs/univariate_kzg/mod.rs:108-112`).

Algorithm
---------
Signed c-bit windows (buckets halved); per (polynomial, window) "job":

1. sort point indices by bucket index |digit|, DESCENDING (digit-0 and
   infinity points sink to the tail);
2. run an *unconditional* EC prefix scan over the sorted points — one fused
   Pallas kernel holding the Jacobian accumulator in VMEM, streaming the
   running prefix back to HBM.  No flushes, no scatters, no per-step
   conditionals beyond a validity select;
3. use the identity  sum_b b * Bucket_b = sum_{b>=1} T_b  where
   T_b = (sum of points with bucket index >= b) = the streamed prefix at
   position cnt_ge(b) - 1 (a searchsorted + gather);
4. tree-sum the T_b per job, Horner-combine windows.

This replaces the round-1 design (flush streams + TPU scatters) whose XLA
scatter lowering was pathologically slow.  Everything from digit extraction
to the window Horner runs inside ONE jit per MSM batch — the per-dispatch
link latency (~3 ms on remote-attached TPUs) is paid once.

Scalars must be in *normal* (non-Montgomery) form, [Lr, n] 16-bit limbs.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import field as F
from . import ec as E
from .field import FieldSpec

I32 = jnp.int32
U32 = jnp.uint32


# ---------------------------------------------------------------------------
# signed window digits
# ---------------------------------------------------------------------------

def num_windows(spec_r_limbs: int, c: int) -> int:
    """Signed windows need one extra digit for the final carry."""
    return (16 * spec_r_limbs + c - 1) // c + 1


def signed_window_digits(scalars: jnp.ndarray, c: int):
    """[k, Lr, n] normal-form limbs -> (bucket [k, W, n] i32, sign bool).

    Digits d_w in [-(2^(c-1)), 2^(c-1) - 1] with sum_w d_w 2^{cw} = scalar.
    Returns bucket index |d_w| and the sign mask (d_w < 0).

    Carry-free form: u = s + sum_w half*2^{cw} (one ripple add), then
    d_w = digit_w(u) - half — every window extracts independently, so XLA
    fuses all W extractions instead of serializing a W-step carry chain
    (the chained version cost ~45ms of the 228ms 2^16 k=5 MSM on a v5e).
    """
    assert c <= 16
    k, Lr, n = scalars.shape
    W = num_windows(Lr, c)
    half = 1 << (c - 1)
    full = 1 << c
    # H = half * (2^(cW) - 1) / (2^c - 1): +half in every window.
    # u = s + H < 2^(cW): s < 2^(16 Lr) and cW >= 16 Lr + c by num_windows.
    H = sum(half << (c * w) for w in range(W))
    Lp = (c * W + 15) // 16 + 1
    h_limbs = [(H >> (16 * j)) & 0xFFFF for j in range(Lp)]
    s = scalars.astype(jnp.uint32)
    u_limbs = []
    carry = jnp.zeros((k, n), dtype=jnp.uint32)
    for j in range(Lp):
        t = (s[:, j] if j < Lr else carry * 0) + np.uint32(h_limbs[j]) + carry
        carry = t >> 16
        u_limbs.append((t & 0xFFFF).astype(I32))
    u_pad = jnp.stack(u_limbs + [u_limbs[0] * 0], axis=1)   # [k, Lp+1, n]

    # all W windows in two gathers + broadcast shifts (the per-window
    # slice/stack form compiled to ~26ms of strided writes at 2^16 k=6 on
    # v5e; a take along the tiny limb axis streams instead)
    jw = np.array([c * w // 16 for w in range(W)], dtype=np.int32)
    off = jnp.asarray([c * w % 16 for w in range(W)], dtype=I32)[None, :,
                                                                 None]
    lo = jnp.take(u_pad, jnp.asarray(jw), axis=1)           # [k, W, n]
    hi = jnp.take(u_pad, jnp.asarray(jw + 1), axis=1)
    # off == 0 -> hi << 16 contributes nothing after the & (full-1) mask
    d = (lo >> off) | (hi << (16 - off))
    dd = (d & (full - 1)) - half
    return jnp.abs(dd), dd < 0


# ---------------------------------------------------------------------------
# EC helpers shared with the XLA path
# ---------------------------------------------------------------------------

def _sel_tuple(cond, a, b):
    return tuple(F.select(cond, ai, bi) for ai, bi in zip(a, b))


def _tree_sum_ec(spec: FieldSpec, pts):
    """Sum points along the LAST axis (log-depth, width halves per level:
    ~2m lane-adds total instead of the m*log(m) a fixed-width scan pays)."""
    m = pts[0].shape[-1]
    while m > 1:
        half = m // 2
        lo = tuple(t[..., :half] for t in pts)
        hi = tuple(t[..., half:2 * half] for t in pts)
        summed = E.jac_add(spec, lo, hi)
        if m % 2:
            tail = tuple(t[..., 2 * half:] for t in pts)
            summed = tuple(jnp.concatenate([s, t], axis=-1)
                           for s, t in zip(summed, tail))
            m = half + 1
        else:
            m = half
        pts = summed
    return tuple(t[..., 0] for t in pts)


def _tree_sum_ec_rolled(spec: FieldSpec, pts, levels_per_stage: int = 3):
    """Tree-sum along the last axis with ROLLED loop bodies.

    The unrolled `_tree_sum_ec` emits one jac_add graph per level (log B
    levels x ~2.4k StableHLO lines dominates MSM *compile* time).  Here each
    pairing level computes ``new[i] = t[2i] + t[2i+1]`` at a FIXED buffer
    width, so `lax.fori_loop` reuses a single jac_add body; lanes past the
    valid prefix hold junk that never contaminates (pair indices 2i, 2i+1
    stay inside the previous level's valid prefix).  Every
    `levels_per_stage` levels the buffer is statically sliced to shed the
    junk work: ~1.7x the lane-adds of the perfect tree for ~3x fewer HLO
    lines per stage."""
    m = pts[0].shape[-1]
    if m == 1:
        return tuple(t[..., 0] for t in pts)
    m_pad = 1 << (m - 1).bit_length()
    if m_pad != m:
        inf = E.jac_infinity(spec, pts[0].shape[1:-1] + (m_pad - m,))
        pts = tuple(jnp.concatenate([t, i], axis=-1)
                    for t, i in zip(pts, inf))
        m = m_pad
    while m > 1:
        lv = min(levels_per_stage, m.bit_length() - 1)
        src = jnp.minimum(2 * jnp.arange(m, dtype=I32), m - 2)

        def body(_, t):
            a = tuple(jnp.take(x, src, axis=-1) for x in t)
            b = tuple(jnp.take(x, src + 1, axis=-1) for x in t)
            return E.jac_add(spec, a, b)

        pts = jax.lax.fori_loop(0, lv, body, pts)
        m >>= lv
        pts = tuple(t[..., :m] for t in pts)
    return tuple(t[..., 0] for t in pts)


def _combine_windows(spec: FieldSpec, wsums, c: int):
    """Horner over windows: wsums jacobian tuple [L, k, W] -> [L, k]."""
    W = wsums[0].shape[-1]

    def body(res, w):
        def dbl(_, r):
            return E.jac_double(spec, r)
        res = jax.lax.fori_loop(0, c, dbl, res)
        wp = tuple(t[..., W - 1 - w] for t in wsums)
        return E.jac_add(spec, res, wp), None

    init = E.jac_infinity(spec, wsums[0].shape[1:-1])
    res, _ = jax.lax.scan(body, init, jnp.arange(W))
    return res


def _exclusive_lane_prefix(spec: FieldSpec, totals):
    """Exclusive EC prefix along the last axis (Hillis–Steele).

    ROLLED over the log2(C) levels: one jac_add body inside a fori_loop
    (shift amount = 1 << i is a traced value; jnp.roll takes traced
    shifts) instead of log2(C)=7 unrolled ~2.4k-line jac_add graphs —
    XLA:CPU compile time of the MSM program is roughly linear in HLO
    size (driver dryrun budget, VERDICT r3 item 1)."""
    C = totals[0].shape[-1]
    lane = jnp.arange(C, dtype=I32)
    # shift right by one, lane 0 -> identity
    shifted = tuple(jnp.roll(t, 1, axis=-1) for t in totals)
    inf = E.jac_infinity(spec, totals[0].shape[1:])
    pref = _sel_tuple(lane >= 1, shifted, inf)
    if C == 1:
        return pref

    def body(i, pref):
        sh = jnp.int32(1) << i
        rolled = tuple(_roll_last(t, sh) for t in pref)
        added = E.jac_add(spec, pref, rolled)
        return _sel_tuple(lane >= sh + 1, added, pref)

    def _roll_last(t, sh):
        return jnp.roll(t, sh, axis=-1)

    return jax.lax.fori_loop(0, (C - 1).bit_length(), body, pref)


# ---------------------------------------------------------------------------
# prefix-scan backends
# ---------------------------------------------------------------------------

def _scan_stream_xla(spec: FieldSpec, xs, ys, valid):
    """Pure-JAX prefix scan.  xs, ys: [L, R, J, C]; valid: [R, J, C] bool.
    Returns stream (X, Y, Z) each [L, R, J, C]."""
    J, C = xs.shape[2], xs.shape[3]
    acc0 = E.jac_infinity(spec, (J, C))

    def body(acc, inp):
        x, y, v = inp
        acc = E.jac_madd(spec, acc, (x, y, ~v))
        return acc, acc

    xs_t = jnp.moveaxis(xs, 1, 0)   # [R, L, J, C]
    ys_t = jnp.moveaxis(ys, 1, 0)
    _, stream = jax.lax.scan(body, acc0, (xs_t, ys_t, valid))
    # stream: tuple of [R, L, J, C] -> [L, R, J, C]
    return tuple(jnp.moveaxis(t, 1, 0) for t in stream)


def _madd_kernel_math(P_LIMBS, N0INV, ONE_MONT, L, acc, x2, y2, valid,
                      unchecked: bool = False):
    """Complete mixed add on limb lists; every operand is a (JB, C) u32.

    With `unchecked`, the doubling branch (acc == point) is omitted: inside
    bucket accumulation the running prefix of distinct SRS points equals the
    next point only with cryptographically negligible probability, and the
    saved ~10 field muls are ~45% of the kernel's compute.  (Same trade
    arkworks-era GPU MSMs make.)  Inverse points and infinities stay handled.

    Returns the new accumulator (lists X, Y, Z)."""
    from .pallas_field import _mm_vecs, _add_vecs, _sub_vecs

    def mm(a, b):
        return _mm_vecs(P_LIMBS, N0INV, L, a, b)

    def addv(a, b):
        return _add_vecs(P_LIMBS, L, a, b)

    def subv(a, b):
        return _sub_vecs(P_LIMBS, L, a, b)

    def iszero(a):
        z = (a[0] == 0)
        for t in a[1:]:
            z = z & (t == 0)
        return z

    def selv(cond, a, b):
        return [jnp.where(cond, ai, bi) for ai, bi in zip(a, b)]

    X1, Y1, Z1 = acc
    # mixed addition (Jacobian += affine), a = 0 curve
    Z1Z1 = mm(Z1, Z1)
    U2 = mm(x2, Z1Z1)
    T = mm(Z1Z1, Z1)
    S2 = mm(y2, T)
    H = subv(U2, X1)
    Rr = subv(S2, Y1)
    HH = mm(H, H)
    HHH = mm(H, HH)
    V = mm(X1, HH)
    RR = mm(Rr, Rr)
    X3 = subv(subv(RR, HHH), addv(V, V))
    Y3 = subv(mm(Rr, subv(V, X3)), mm(Y1, HHH))
    Z3 = mm(Z1, H)

    h0 = iszero(H)
    acc_inf = iszero(Z1)
    one = [jnp.full_like(x2[0], np.uint32(v)) for v in ONE_MONT]
    zero = [jnp.zeros_like(x2[0]) for _ in range(L)]

    if unchecked:
        # H == 0 can only mean inverse points (doubling assumed impossible)
        newX = selv(h0, one, X3)
        newY = selv(h0, one, Y3)
        newZ = selv(h0, zero, Z3)
    else:
        # doubling path (acc == point): dbl-2009-l, a = 0
        A = mm(X1, X1)
        B = mm(Y1, Y1)
        Cc = mm(B, B)
        XB = addv(X1, B)
        T2 = mm(XB, XB)
        D = subv(subv(T2, A), Cc)
        D = addv(D, D)
        Ee = addv(addv(A, A), A)
        Ff = mm(Ee, Ee)
        X3d = subv(Ff, addv(D, D))
        C8 = addv(Cc, Cc)
        C8 = addv(C8, C8)
        C8 = addv(C8, C8)
        Y3d = subv(mm(Ee, subv(D, X3d)), C8)
        YZ = mm(Y1, Z1)
        Z3d = addv(YZ, YZ)

        r0 = iszero(Rr)
        newX = selv(h0 & r0, X3d, X3)
        newY = selv(h0 & r0, Y3d, Y3)
        newZ = selv(h0 & r0, Z3d, Z3)
        # inverse points -> infinity
        newX = selv(h0 & ~r0, one, newX)
        newY = selv(h0 & ~r0, one, newY)
        newZ = selv(h0 & ~r0, zero, newZ)
    # accumulator was infinity -> take the point
    newX = selv(acc_inf, x2, newX)
    newY = selv(acc_inf, y2, newY)
    newZ = selv(acc_inf, one, newZ)
    # invalid point -> keep accumulator
    newX = selv(valid, newX, X1)
    newY = selv(valid, newY, Y1)
    newZ = selv(valid, newZ, Z1)
    return newX, newY, newZ


def _jacadd_kernel_math(P_LIMBS, N0INV, ONE_MONT, L, A, B):
    """Complete Jacobian + Jacobian addition on limb lists (kernel math).

    Mirrors `ec.jac_add` (same formulas -> same group element; coordinate
    representatives may differ, which normalizes away in jac_to_affine).
    Each operand is a tuple of 3 lists of (sublane, lane) u32 vectors."""
    from .pallas_field import _mm_vecs, _add_vecs, _sub_vecs

    def mm(a, b):
        return _mm_vecs(P_LIMBS, N0INV, L, a, b)

    def addv(a, b):
        return _add_vecs(P_LIMBS, L, a, b)

    def subv(a, b):
        return _sub_vecs(P_LIMBS, L, a, b)

    def iszero(a):
        z = (a[0] == 0)
        for t in a[1:]:
            z = z & (t == 0)
        return z

    def selv(cond, a, b):
        return [jnp.where(cond, ai, bi) for ai, bi in zip(a, b)]

    X1, Y1, Z1 = A
    X2, Y2, Z2 = B
    Z1Z1 = mm(Z1, Z1)
    Z2Z2 = mm(Z2, Z2)
    U1 = mm(X1, Z2Z2)
    U2 = mm(X2, Z1Z1)
    S1 = mm(Y1, mm(Z2, Z2Z2))
    S2 = mm(Y2, mm(Z1, Z1Z1))
    H = subv(U2, U1)
    Rr = subv(S2, S1)
    HH = mm(H, H)
    HHH = mm(H, HH)
    V = mm(U1, HH)
    RR = mm(Rr, Rr)
    X3 = subv(subv(RR, HHH), addv(V, V))
    Y3 = subv(mm(Rr, subv(V, X3)), mm(S1, HHH))
    Z3 = mm(mm(Z1, Z2), H)

    # doubling path (dbl-2009-l, a = 0) for A == B
    Aq = mm(X1, X1)
    Bq = mm(Y1, Y1)
    Cc = mm(Bq, Bq)
    XB = addv(X1, Bq)
    T2 = mm(XB, XB)
    D = subv(subv(T2, Aq), Cc)
    D = addv(D, D)
    Ee = addv(addv(Aq, Aq), Aq)
    Ff = mm(Ee, Ee)
    X3d = subv(Ff, addv(D, D))
    C8 = addv(Cc, Cc)
    C8 = addv(C8, C8)
    C8 = addv(C8, C8)
    Y3d = subv(mm(Ee, subv(D, X3d)), C8)
    YZ = mm(Y1, Z1)
    Z3d = addv(YZ, YZ)

    a_inf = iszero(Z1)
    b_inf = iszero(Z2)
    h0 = iszero(H)
    r0 = iszero(Rr)
    one = [jnp.full_like(X1[0], np.uint32(v)) for v in ONE_MONT]
    zero = [jnp.zeros_like(X1[0]) for _ in range(L)]

    nX = selv(h0 & r0, X3d, X3)
    nY = selv(h0 & r0, Y3d, Y3)
    nZ = selv(h0 & r0, Z3d, Z3)
    inv = h0 & ~r0
    nX = selv(inv, one, nX)
    nY = selv(inv, one, nY)
    nZ = selv(inv, zero, nZ)
    nX = selv(b_inf, X1, nX)
    nY = selv(b_inf, Y1, nY)
    nZ = selv(b_inf, Z1, nZ)
    nX = selv(a_inf, X2, nX)
    nY = selv(a_inf, Y2, nY)
    nZ = selv(a_inf, Z2, nZ)
    return nX, nY, nZ


def _make_bucket_tail_kernel(spec: FieldSpec, BB: int, JB: int,
                             nb_blocks: int):
    """Fused bucket tail: T = select(have, S_in + S_bp, inf), then the full
    bucket-tree reduction — all in VMEM.

    The XLA version of this tail is latency-bound, not compute-bound: each
    tree level is a chain of ~16 rolled Montgomery steps on shrinking
    tensors, and every small sequential step costs ~10-30us of device
    dispatch (measured round 4: ~50-76ms per MSM batch for ~2ms of flops).

    Compile-surface design: the grid's second axis walks the bucket range
    in BB-lane blocks and ACCUMULATES into a VMEM scratch (one jacadd
    inline, like the scan kernel's R axis); only the last block pays the
    log2(BB) unrolled lane-fold levels.  Total jacadd inlines =
    2 + log2(BB) — independent of B."""
    L = spec.num_limbs
    H = L // 2
    P_LIMBS = tuple(np.uint32(v) for v in spec.p_limbs)
    N0INV = np.uint32(spec.n0inv)
    ONE_MONT = tuple(np.uint32(v) for v in spec.mont_one_np)
    MASK = np.uint32(0xFFFF)

    def unpack_arr(ref):
        out = []
        for i in range(H):
            v = ref[i]
            out.append(v & MASK)
            out.append(v >> 16)
        return out

    def kernel(sx_ref, sy_ref, sz_ref, bx_ref, by_ref, bz_ref, have_ref,
               ox_ref, oy_ref, oz_ref, ax, ay, az):
        import jax.experimental.pallas as pl
        b_blk = pl.program_id(1)

        Sin = (unpack_arr(sx_ref), unpack_arr(sy_ref), unpack_arr(sz_ref))
        Sbp = (unpack_arr(bx_ref), unpack_arr(by_ref), unpack_arr(bz_ref))
        X, Y, Z = _jacadd_kernel_math(P_LIMBS, N0INV, ONE_MONT, L, Sin, Sbp)
        have = have_ref[...] > 0
        one = [jnp.full_like(X[0], np.uint32(v)) for v in ONE_MONT]
        X = [jnp.where(have, x, o) for x, o in zip(X, one)]
        Y = [jnp.where(have, y, o) for y, o in zip(Y, one)]
        Z = [jnp.where(have, z, jnp.zeros_like(z)) for z in Z]

        @pl.when(b_blk == 0)
        def _init():
            for i in range(L):
                ax[i] = X[i]
                ay[i] = Y[i]
                az[i] = Z[i]

        @pl.when(b_blk > 0)
        def _acc():
            acc = ([ax[i] for i in range(L)], [ay[i] for i in range(L)],
                   [az[i] for i in range(L)])
            nX, nY, nZ = _jacadd_kernel_math(P_LIMBS, N0INV, ONE_MONT, L,
                                             acc, (X, Y, Z))
            for i in range(L):
                ax[i] = nX[i]
                ay[i] = nY[i]
                az[i] = nZ[i]

        @pl.when(b_blk == nb_blocks - 1)
        def _fold():
            Xf = [ax[i] for i in range(L)]
            Yf = [ay[i] for i in range(L)]
            Zf = [az[i] for i in range(L)]
            w = BB
            while w > 1:
                half = w // 2
                Aop = ([x[:, :half] for x in Xf], [y[:, :half] for y in Yf],
                       [z[:, :half] for z in Zf])
                Bop = ([x[:, half:w] for x in Xf], [y[:, half:w] for y in Yf],
                       [z[:, half:w] for z in Zf])
                Xf, Yf, Zf = _jacadd_kernel_math(P_LIMBS, N0INV, ONE_MONT, L,
                                                 Aop, Bop)
                w = half
            for i in range(H):
                ox_ref[i] = Xf[2 * i] | (Xf[2 * i + 1] << 16)
                oy_ref[i] = Yf[2 * i] | (Yf[2 * i + 1] << 16)
                oz_ref[i] = Zf[2 * i] | (Zf[2 * i + 1] << 16)

    return kernel


def _bucket_tail_pallas(spec: FieldSpec, S_in, S_bp, have, JB: int = 8,
                        BB: int = 128):
    """S_in, S_bp: packed jac tuples of [L/2, J, B]; have: [J, B] bool.
    Returns the per-job tree sum as a packed jac tuple of [L/2, J, 1]."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    L = spec.num_limbs
    H = L // 2
    _, J, B = S_in[0].shape
    BB = min(BB, B)
    assert J % JB == 0 and B % BB == 0
    nb = B // BB
    kernel = _make_bucket_tail_kernel(spec, BB, JB, nb)
    grid = (J // JB, nb)
    blk = lambda j, b: (0, j, b)
    out = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((H, J, 1), U32)] * 3,
        grid=grid,
        in_specs=[pl.BlockSpec((H, JB, BB), blk,
                               memory_space=pltpu.VMEM)] * 6
        + [pl.BlockSpec((JB, BB), lambda j, b: (j, b),
                        memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((H, JB, 1), lambda j, b: (0, j, 0),
                                memory_space=pltpu.VMEM)] * 3,
        scratch_shapes=[
            pltpu.VMEM((L, JB, BB), U32),
            pltpu.VMEM((L, JB, BB), U32),
            pltpu.VMEM((L, JB, BB), U32),
        ],
    )(*S_in, *S_bp, have.astype(U32))
    return out


def _pack_rows(t: jnp.ndarray) -> jnp.ndarray:
    """[L, ...] u32 16-bit limbs -> [L/2, ...] u32 (two limbs per word).

    HBM traffic is the MSM bottleneck; all point/stream tensors move packed
    and are unpacked on the fly in VMEM/registers."""
    return t[0::2] | (t[1::2] << 16)


def _unpack_rows(t: jnp.ndarray) -> jnp.ndarray:
    """[H, ...] packed -> [2H, ...] 16-bit limbs."""
    lo = t & jnp.uint32(0xFFFF)
    hi = t >> 16
    parts = jnp.stack([lo, hi], axis=1)       # [H, 2, ...]
    return parts.reshape((-1,) + t.shape[1:])


def _make_scan_kernel(spec: FieldSpec, RB: int):
    L = spec.num_limbs
    H = L // 2
    P_LIMBS = tuple(np.uint32(v) for v in spec.p_limbs)
    N0INV = np.uint32(spec.n0inv)
    ONE_MONT = tuple(np.uint32(v) for v in spec.mont_one_np)
    MASK = np.uint32(0xFFFF)

    def unpack(ref, rb):
        out = []
        for i in range(H):
            v = ref[i, rb]
            out.append(v & MASK)
            out.append(v >> 16)
        return out

    def pack_store(ref, rb, limbs):
        for i in range(H):
            ref[i, rb] = limbs[2 * i] | (limbs[2 * i + 1] << 16)

    def kernel(xs_ref, ys_ref, val_ref, ox_ref, oy_ref, oz_ref,
               accx, accy, accz):
        import jax.experimental.pallas as pl
        from .pallas_field import _neg_vecs
        r_blk = pl.program_id(1)

        @pl.when(r_blk == 0)
        def _init():
            for i in range(L):
                accx[i] = jnp.full_like(accx[i], np.uint32(ONE_MONT[i]))
                accy[i] = jnp.full_like(accy[i], np.uint32(ONE_MONT[i]))
                accz[i] = jnp.zeros_like(accz[i])

        for rb in range(RB):
            x2 = unpack(xs_ref, rb)
            y2 = unpack(ys_ref, rb)
            # vs encodes validity and the signed-digit negation: bit0 =
            # valid, bit1 = negate (in-kernel p - y costs ~L subs per madd
            # vs the old gather from a 2n-column y/-y table, which DOUBLED
            # the gather stage's HBM index traffic)
            vs = val_ref[rb]
            valid = (vs & 1) > 0
            neg = vs >= 2
            y2n = _neg_vecs(P_LIMBS, L, y2)
            y2 = [jnp.where(neg, n_, y_) for n_, y_ in zip(y2n, y2)]
            acc = ([accx[i] for i in range(L)],
                   [accy[i] for i in range(L)],
                   [accz[i] for i in range(L)])
            nx, ny, nz = _madd_kernel_math(P_LIMBS, N0INV, ONE_MONT, L,
                                           acc, x2, y2, valid, unchecked=True)
            for i in range(L):
                accx[i] = nx[i]
                accy[i] = ny[i]
                accz[i] = nz[i]
            pack_store(ox_ref, rb, nx)
            pack_store(oy_ref, rb, ny)
            pack_store(oz_ref, rb, nz)

    return kernel


def _scan_stream_pallas(spec: FieldSpec, xs_p, ys_p, valid, RB: int = 2,
                        JB: int = 8):
    """Fused Pallas prefix scan over PACKED limb tensors.

    xs_p, ys_p: [L/2, R, J, C] packed; valid: [R, J, C] bool.
    Returns packed stream (X, Y, Z) each [L/2, R, J, C]."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    L = spec.num_limbs
    H, R, J, C = xs_p.shape
    assert R % RB == 0 and J % JB == 0
    kernel = _make_scan_kernel(spec, RB)
    grid = (J // JB, R // RB)
    blk = lambda j, r: (0, r, j, 0)
    vblk = lambda j, r: (r, j, 0)
    out_shape = [jax.ShapeDtypeStruct((H, R, J, C), U32)] * 3
    ox, oy, oz = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec((H, RB, JB, C), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, RB, JB, C), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, JB, C), vblk, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((H, RB, JB, C), blk, memory_space=pltpu.VMEM)] * 3,
        scratch_shapes=[
            pltpu.VMEM((L, JB, C), U32),
            pltpu.VMEM((L, JB, C), U32),
            pltpu.VMEM((L, JB, C), U32),
        ],
    )(xs_p, ys_p, valid.astype(U32))
    return ox, oy, oz


# ---------------------------------------------------------------------------
# per-chunk job processing
# ---------------------------------------------------------------------------

def _msm_job_chunk(spec: FieldSpec, xy, inf_mask, bucket, sign,
                   c: int, C: int, use_pallas: bool,
                   return_buckets: bool = False):
    """Window sums for a chunk of jobs.

    xy: x and y stacked on the limb axis, [2L, n] (packed [L, n] when
    use_pallas) — ONE gather moves both coordinates (the separate x / y
    takes cost ~2.5x the combined one: the gather is index-overhead
    bound, not byte bound); the signed-digit negation happens inside the
    scan kernel instead of via a doubled y/-y table.
    inf_mask: [n] bool; bucket: [Jc, n] i32 in [0, 2^(c-1)]; sign: [Jc, n]
    bool.  Returns jacobian tuple of [L, Jc]; with `return_buckets`, the
    per-bucket sums [L, Jc, B] BEFORE the bucket tree (so a distributed
    caller can split the tree across shards — parallel/sharded.py)."""
    L = spec.num_limbs
    Jc, n = bucket.shape
    B = 1 << (c - 1)
    R = n // C

    key = jnp.where(inf_mask[None, :], 0, bucket)
    # pack the sign bit into the sort value: one sort carries both the
    # permutation and the per-point negation flag
    iota = jnp.arange(n, dtype=I32)[None, :] * 2
    packed = jnp.broadcast_to(iota, (Jc, n)) + sign.astype(I32)
    kneg, val = jax.lax.sort_key_val(-key, packed, dimension=1)
    b_desc = -kneg                                        # [Jc, n] descending

    idx = val >> 1
    g = jnp.take(xy, idx, axis=1)                         # [2Lx, Jc, n]
    Lx = g.shape[0] // 2
    xs, ys = g[:Lx], g[Lx:]
    valid = b_desc > 0                                    # [Jc, n]
    # vs plane: bit0 = valid, bit1 = negate y (signed digit)
    vv_full = valid.astype(I32) + 2 * (valid & ((val & 1) > 0)).astype(I32)

    # layout [Lx, R, Jc, C]: sorted index i = l*R + r  (lane-major chunks)
    xs = jnp.moveaxis(xs.reshape(Lx, Jc, C, R), 3, 1)
    ys = jnp.moveaxis(ys.reshape(Lx, Jc, C, R), 3, 1)
    vv = jnp.moveaxis(vv_full.reshape(Jc, C, R), 2, 0)    # [R, Jc, C] i32

    if use_pallas:
        stream = _scan_stream_pallas(spec, xs, ys, vv)    # packed [L/2,...]
    else:
        # XLA path: apply the signed-digit negation vectorized up front
        ys = jnp.where((vv >= 2)[None], F.neg(spec, ys), ys)
        stream = _scan_stream_xla(spec, xs, ys, vv > 0)

    # exclusive prefix of lane totals along C (small: unpack if needed)
    totals = tuple(t[:, R - 1] for t in stream)           # [Lx, Jc, C]
    if use_pallas:
        totals = tuple(_unpack_rows(t) for t in totals)
    blockpref = _exclusive_lane_prefix(spec, totals)

    # positions: cnt_ge(b) for b = 1..B
    bb = -jnp.arange(1, B + 1, dtype=I32)                 # search keys (neg)
    cnt = jax.vmap(lambda a: jnp.searchsorted(a, bb, side="right"))(kneg)
    have = cnt > 0                                        # [Jc, B]
    i_b = jnp.maximum(cnt - 1, 0)
    l_b = i_b // R
    r_b = i_b % R

    job = jnp.arange(Jc, dtype=I32)[:, None]
    flat_stream = r_b * (Jc * C) + job * C + l_b          # [Jc, B]
    flat_pref = job * C + l_b

    S_in = tuple(jnp.take(t.reshape(Lx, R * Jc * C), flat_stream.reshape(-1),
                          axis=1).reshape(Lx, Jc, B) for t in stream)
    if use_pallas and not return_buckets and Jc % 8 == 0:
        # fused Pallas tail: S_in + S_bp, have-select and the whole bucket
        # tree in one kernel (the XLA tail is sequential-small-op latency
        # bound: ~50-76ms per batch for ~2ms of flops)
        S_bp_p = tuple(_pack_rows(
            jnp.take(t.reshape(L, Jc * C), flat_pref.reshape(-1),
                     axis=1).reshape(L, Jc, B)) for t in blockpref)
        res = _bucket_tail_pallas(spec, S_in, S_bp_p, have)
        return tuple(_unpack_rows(t[..., 0]) for t in res)  # [L, Jc]
    if use_pallas:
        S_in = tuple(_unpack_rows(t) for t in S_in)
    S_bp = tuple(jnp.take(t.reshape(L, Jc * C), flat_pref.reshape(-1),
                          axis=1).reshape(L, Jc, B) for t in blockpref)
    T = E.jac_add(spec, S_in, S_bp)                       # [L, Jc, B]
    inf = E.jac_infinity(spec, (Jc, B))
    T = _sel_tuple(have, T, inf)
    if return_buckets:
        return T                                          # [L, Jc, B]
    return _tree_sum_ec_rolled(spec, T)                   # [L, Jc]


def _pick_c(n: int) -> int:
    # r3 measurement (pre fused-Pallas tail): XLA-land bucket reduction cost
    # ~20-40x more per lane-add than the scan kernel, so small windows won
    # (2^14, k=6: c=9/10 -> 130 ms vs c=13 -> 630 ms).  The r4 fused tail
    # moved the bucket select/add/tree-sum into VMEM, so larger windows are
    # back on the table; env override for sweeps.
    import os
    env = os.environ.get("MPC_JELLYFISH_TPU_MSM_CBITS", "")
    if env:
        return int(env)
    if n >= (1 << 18):
        return 11
    if n >= (1 << 14):
        return 10
    if n >= (1 << 8):
        return 9
    return 6


def _pick_C(n_pad: int) -> int:
    # lanes per job in the scan kernel: C*R = n_pad, C multiple of 128.
    # C = 128 keeps every limb vector in ONE (8, 128) VPU register inside
    # the madd body (wider C spills; see pallas_field layout note) and
    # compiles ~40% faster than C = 512.  Env override for tuning sweeps
    # (the scan is R = n_pad/C sequential steps, so larger C trades
    # register residency for scan depth).
    import os
    env = os.environ.get("MPC_JELLYFISH_TPU_MSM_C", "")
    if env:
        return int(env)
    del n_pad
    return 128


def _pick_chunk(n_pad: int, J: int) -> int:
    # stream memory: 3 coords x L/2 x 4B x n_pad per job (packed) plus the
    # two gathered input copies; target <= ~0.8 GB per chunk
    per_job = 5 * 8 * 4 * n_pad
    jc = max(8, int(8e8 // per_job) // 8 * 8)
    jc = min(jc, (J + 7) // 8 * 8)
    return jc


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
def _msm_batch_jit(spec: FieldSpec, points, scalars, c: int, C: int,
                   use_pallas: bool):
    """scalars: [k, Lr, n] normal form.  Returns jacobian tuple [L, k]."""
    x, y, inf_mask = points
    k, Lr, n = scalars.shape
    L = spec.num_limbs
    W = num_windows(Lr, c)
    RB = 2   # row block of the Pallas scan kernel: R must divide evenly
    R0 = n // C if n % C == 0 else n // C + 1
    R0 = (max(R0, 1) + RB - 1) // RB * RB
    n_pad = C * R0
    if n_pad != n:
        pad = n_pad - n
        x = jnp.concatenate([x, F.ones(spec, (pad,))], axis=1)
        y = jnp.concatenate([y, F.ones(spec, (pad,))], axis=1)
        inf_mask = jnp.concatenate(
            [inf_mask, jnp.ones((pad,), dtype=jnp.bool_)])
        scalars = jnp.concatenate(
            [scalars, jnp.zeros((k, Lr, pad), dtype=scalars.dtype)], axis=2)

    bucket, sign = signed_window_digits(scalars, c)       # [k, W, n_pad]
    J = k * W
    bucket = bucket.reshape(J, n_pad)
    sign = sign.reshape(J, n_pad)

    Jc = _pick_chunk(n_pad, J)
    J_pad = (J + Jc - 1) // Jc * Jc
    if J_pad != J:
        bucket = jnp.concatenate(
            [bucket, jnp.zeros((J_pad - J, n_pad), dtype=I32)], axis=0)
        sign = jnp.concatenate(
            [sign, jnp.zeros((J_pad - J, n_pad), dtype=jnp.bool_)], axis=0)

    xy = jnp.concatenate([x, y], axis=0)                  # [2L, n_pad]
    if use_pallas:
        # move points through HBM packed (two 16-bit limbs per u32)
        xy = _pack_rows(xy)

    nchunks = J_pad // Jc
    bucket = bucket.reshape(nchunks, Jc, n_pad)
    sign = sign.reshape(nchunks, Jc, n_pad)

    if nchunks == 1:
        wsums1 = _msm_job_chunk(spec, xy, inf_mask, bucket[0], sign[0],
                                c, C, use_pallas)
        stacked = tuple(t[None] for t in wsums1)          # [1, L, Jc]
    else:
        def body(_, bs):
            b_, s_ = bs
            out = _msm_job_chunk(spec, xy, inf_mask, b_, s_, c, C,
                                 use_pallas)
            return 0, out

        _, stacked = jax.lax.scan(body, 0, (bucket, sign))
        # stacked: tuple of [nchunks, L, Jc]

    flat = tuple(jnp.moveaxis(t, 0, 1).reshape(L, J_pad)[:, :J]
                 for t in stacked)
    wsums = tuple(t.reshape(L, k, W) for t in flat)
    return _combine_windows(spec, wsums, c)


def _msm_bucket_sums(spec: FieldSpec, points, scalars, c: int, C: int,
                     use_pallas: bool):
    """Per-window bucket sums [L, J, B] (J = k*W jobs) WITHOUT the bucket
    tree or window combine.  Used by the distributed MSM: each shard
    computes this over its point partition, then the O(B*J) reduction tail
    is split across shards instead of being replicated on every one
    (round-3 scaling_r3_20.log: the replicated tail made mesh=8 SLOWER
    than mesh=4).  Traced inside shard_map — no jit wrapper here."""
    x, y, inf_mask = points
    k, Lr, n = scalars.shape
    RB = 2
    R0 = n // C if n % C == 0 else n // C + 1
    R0 = (max(R0, 1) + RB - 1) // RB * RB
    n_pad = C * R0
    if n_pad != n:
        pad = n_pad - n
        x = jnp.concatenate([x, F.ones(spec, (pad,))], axis=1)
        y = jnp.concatenate([y, F.ones(spec, (pad,))], axis=1)
        inf_mask = jnp.concatenate(
            [inf_mask, jnp.ones((pad,), dtype=jnp.bool_)])
        scalars = jnp.concatenate(
            [scalars, jnp.zeros((k, Lr, pad), dtype=scalars.dtype)], axis=2)
    W = num_windows(Lr, c)
    bucket, sign = signed_window_digits(scalars, c)
    J = k * W
    bucket = bucket.reshape(J, n_pad)
    sign = sign.reshape(J, n_pad)
    xy = jnp.concatenate([x, y], axis=0)
    if use_pallas:
        xy = _pack_rows(xy)
    T = _msm_job_chunk(spec, xy, inf_mask, bucket, sign, c, C,
                       use_pallas, return_buckets=True)
    return T                                              # [L, J, B]


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def _msm_batch_host(spec: FieldSpec, points, scalars) -> tuple:
    """Host-int Pippenger fallback: on the CPU backend the XLA scan path is
    ~50x slower than exact-bignum Python (u32 limb emulation on 4 cores), so
    correctness tests route here.  Returns the same jacobian [L, k] layout."""
    from . import ec as E
    from ..utils import ec_host as H
    k = scalars.shape[0]
    pts = E.affine_from_device(spec, points)
    import numpy as np_
    sc = np_.asarray(jax.device_get(scalars), dtype=np_.uint64)
    out = []
    for i in range(k):
        vals = [int(sum(int(sc[i, j, t]) << (16 * j)
                        for j in range(sc.shape[1]))) for t in range(len(pts))]
        out.append(H.ec_msm_fast(spec.p, pts, vals))
    x = spec.to_device([0 if pt.inf else pt.x for pt in out])
    y = spec.to_device([0 if pt.inf else pt.y for pt in out])
    z = jnp.where(jnp.asarray([pt.inf for pt in out])[None, :],
                  F.zeros(spec, (k,)), F.ones(spec, (k,)))
    return (x, y, z)


def msm_batch(spec: FieldSpec, points, scalars_list, c: int | None = None,
              lanes: int | None = None, force_device: bool = False):
    """k MSMs over SHARED bases: sum_i scalars[k][i] * points_i for each k.

    scalars_list: list of [Lr, n] normal-form limb tensors (or [k, Lr, n]).
    Returns a jacobian tuple of [L, k].  `lanes` is accepted for
    compatibility and ignored (the v3 kernel auto-tiles).
    """
    del lanes
    if isinstance(scalars_list, (list, tuple)):
        scalars = jnp.stack(list(scalars_list))
    else:
        scalars = scalars_list
    k, Lr, n = scalars.shape
    if (not force_device and jax.default_backend() == "cpu"
            and n <= (1 << 15)):
        return _msm_batch_host(spec, points, scalars)
    if c is None:
        c = _pick_c(n)
    C = _pick_C(((n + 127) // 128) * 128)
    use_pallas = F._use_pallas() and n >= (1 << 11)
    from ..utils.aot_cache import cached_jit

    # Quantize k to {2, 6, 6, ...} chunks so only TWO compiled variants
    # ever exist per (curve, n): the Pallas scan+tail programs cost
    # minutes of Mosaic compile each, and the prover's rounds commit with
    # k = 1 (grand product), 2 (openings), 5-6 (wires/quotient splits),
    # 18 (preprocess).  Padded rows carry zero scalars -> infinity
    # results, sliced off below.
    def run(k_prog, sc):
        key = (f"msm_batch-{spec.name}-n{n}-k{k_prog}-c{c}-C{C}"
               f"-p{int(use_pallas)}")
        fn = cached_jit(
            key,
            lambda pts, s: _msm_batch_jit(spec, pts, s, c, C, use_pallas),
            points, sc, deps=("msm",))
        return fn(points, sc)

    outs = []
    i = 0
    while i < k:
        rem = k - i
        k_prog = 2 if rem <= 2 else 6
        take = min(rem, k_prog)
        sc = scalars[i:i + take]
        if take < k_prog:
            sc = jnp.concatenate(
                [sc, jnp.zeros((k_prog - take,) + sc.shape[1:],
                               dtype=sc.dtype)], axis=0)
        res = run(k_prog, sc)
        outs.append(tuple(t[:, :take] for t in res))
        i += take
    if len(outs) == 1:
        return outs[0]
    return tuple(jnp.concatenate([o[j] for o in outs], axis=1)
                 for j in range(3))


def msm(spec: FieldSpec, points, scalars: jnp.ndarray, c: int | None = None,
        lanes: int | None = None, force_device: bool = False):
    """Single MSM: sum_i scalars_i * points_i -> jacobian tuple of [L]."""
    res = msm_batch(spec, points, scalars[None], c=c, lanes=lanes,
                    force_device=force_device)
    return tuple(t[:, 0] for t in res)
