"""Fused multi-pass NTT (Pallas TPU kernels).

Round-2's NTT ran ONE butterfly stage per kernel launch: every one of the
log2(n) stages paid a full HBM round trip, an XLA interleave pass and a
kernel launch, and the dense per-stage twiddles were baked into the
executable as (8x-padded) constant literals — the direct cause of the
2^20 HBM OOM (`bench_r2_20c.log`) and of the 838 ms batched coset NTT.

This module replaces that with a *four-step / mixed-radix* decomposition
(the TPU-native equivalent of arkworks `Radix2EvaluationDomain::fft`,
reference hot loop `plonk/src/proof_system/prover.rs:512-675`):

  n = f_0 * f_1 * ... * f_{k-2} * Q      (f_j <= 128, Q = 128)

Each factor is ONE Pallas kernel invocation ("column pass") that runs all
log2(f) butterfly stages back-to-back in VMEM:

  * state [L, BC, f, W-tiles]: the transform axis f sits on *sublanes*,
    a W-wide trailing batch on lanes, so every butterfly is whole-register
    data movement — no cross-lane shuffles at any span;
  * stage twiddles are a streamed operand (pre-expanded per stage, fetched
    once per launch), never compiled-in constants;
  * the four-step inter-factor twiddle [L, f, M] and an optional coset
    pre-scale fold into the same kernel as one extra Montgomery mul;
  * the final Pease stage has unit twiddles and skips its mul;
  * completed factors fold into the batch axis by pure reshape — no
    data movement until a single XLA transpose before the final Q pass
    (Q must land on sublanes; it starts minor).

HBM traffic drops from 2*log2(n) sweeps to ~2k sweeps (+1 transpose +1
digit-reverse gather); butterfly math is unchanged and bit-exact vs the
per-stage path.  1/n for inverse transforms and the g^j / g^-j coset
scales (coset_fft / coset_ifft) fold into the pass tables for free.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_field import _mm_vecs, _add_vecs, _sub_vecs

import os

LANES = 128
MAX_F = 128          # max in-kernel factor (VMEM-limited)
MIN_FUSED_N = 1 << 14
BLK_ELEMS = 1 << 14  # f * W elements per grid block (~1 MB per limb-stream)


def _interpret() -> bool:
    """Pallas interpreter mode: lets the CPU test suite execute the fused
    kernels (slowly) against the per-stage oracle without TPU hardware."""
    return os.environ.get("MPC_JELLYFISH_PALLAS_INTERPRET", "") == "1"


def fused_factors(n: int):
    """Factor split for the fused path, or None if n is too small.

    Layout invariant: Q = 128 stays the minor axis through every earlier
    pass (so their lane tiles are full), and one transpose brings it to
    sublanes for the last pass.
    """
    if n < MIN_FUSED_N or n & (n - 1):
        return None
    rem = n // LANES
    fs = []
    while rem > 1:
        f = min(MAX_F, rem)
        fs.append(f)
        rem //= f
    return tuple(fs) + (LANES,)


def _bitrev(x: np.ndarray, f: int) -> np.ndarray:
    bits = f.bit_length() - 1
    r = np.zeros_like(x)
    for b in range(bits):
        r |= ((x >> b) & 1) << (bits - 1 - b)
    return r


def digit_rev_perm(factors, n: int) -> np.ndarray:
    """perm[k] = stored position of natural output index k.

    Natural index k = d_0 + f_0*(d_1 + f_1*(... + f_{k-2}*d_{Q})); each
    column pass leaves its digit bit-reversed, the P digits stay
    major->minor in pass order on the lane axis, and the transposed Q
    digit is the slowest axis.
    """
    k = np.arange(n, dtype=np.int64)
    P = n // factors[-1]
    pos = np.zeros(n, dtype=np.int64)
    div = 1
    stride = P
    for f in factors[:-1]:
        kj = (k // div) % f
        stride //= f
        pos += _bitrev(kj, f) * stride
        div *= f
    pos += _bitrev(k // div, factors[-1]) * P
    return pos.astype(np.int32)


def stage_twiddles(spec, wf: int, f: int, width: int) -> np.ndarray:
    """Expanded constant-geometry stage table, [L, (log2(f)-1)*f/2, width].

    Stage s of the Pease DIF on f points needs W_s[i] = wf^(2^s * (i>>s))
    for i in [0, f/2); stages stored back-to-back (static offsets).  The
    final stage (s = log2(f)-1) is all-ones and omitted (the kernel skips
    its mul).  wf must be a primitive f-th root of unity.  Values are
    lane-replicated to `width` (the kernel's block width).
    """
    p = spec.p
    h = f // 2
    log_f = f.bit_length() - 1
    out = []
    for s in range(max(log_f - 1, 0)):
        step = pow(wf, 1 << s, p)
        for i in range(h):
            out.append(spec.to_mont_int(pow(step, i >> s, p)))
    if not out:
        out.append(spec.to_mont_int(1))  # placeholder for f == 2
    from ..utils.bigint import ints_to_limbs
    tab = ints_to_limbs(out, spec.num_limbs)           # [L, S*h]
    return np.repeat(tab[:, :, None], width, axis=2)   # [L, S*h, width]


def _col_kernel_body(p_limbs, n0inv, L, f, log_f, W,
                     has_pre, has_post, *refs):
    """One column pass: all log2(f) Pease DIF stages on a [f, W] slab.

    refs: x_ref [L,1,f,W], stw_ref [L,(log_f-1)*h,W],
          (pre_ref [L,f,W])?, (post_ref [L,f,W])?, o_ref [L,1,f,W].
    """
    idx = 0
    x_ref = refs[idx]; idx += 1
    stw_ref = refs[idx]; idx += 1
    pre_ref = post_ref = None
    if has_pre:
        pre_ref = refs[idx]; idx += 1
    if has_post:
        post_ref = refs[idx]; idx += 1
    o_ref = refs[idx]

    h = f // 2
    v = [x_ref[l, 0] for l in range(L)]                    # [f, W]
    if has_pre:
        v = _mm_vecs(p_limbs, n0inv, L, v, [pre_ref[l] for l in range(L)])

    def halves(v):
        return [vl[:h] for vl in v], [vl[h:] for vl in v]

    def interleave(s_, d_):
        # out[2i] = s[i], out[2i+1] = d[i] (sublane-only data movement)
        return [jnp.stack([sl, dl], axis=1).reshape(f, W)
                for sl, dl in zip(s_, d_)]

    def stage(v, w):
        a, b = halves(v)
        s_ = _add_vecs(p_limbs, L, a, b)
        d_ = _mm_vecs(p_limbs, n0inv, L, _sub_vecs(p_limbs, L, a, b), w)
        return interleave(s_, d_)

    n_mul_stages = max(log_f - 1, 0)
    if n_mul_stages > 2:
        # rolled over stages: same-shape body, dynamic twiddle slice
        def body(s, v):
            w = [stw_ref[l, pl.ds(s * h, h), :] for l in range(L)]
            return tuple(stage(list(v), w))
        v = list(jax.lax.fori_loop(0, n_mul_stages, body, tuple(v)))
    else:
        for s in range(n_mul_stages):
            w = [stw_ref[l, s * h:(s + 1) * h, :] for l in range(L)]
            v = stage(v, w)

    # final Pease stage: all twiddles are 1 -> pure add/sub butterfly
    a, b = halves(v)
    v = interleave(_add_vecs(p_limbs, L, a, b), _sub_vecs(p_limbs, L, a, b))

    if has_post:
        v = _mm_vecs(p_limbs, n0inv, L, v, [post_ref[l] for l in range(L)])
    for l in range(L):
        o_ref[l, 0] = v[l]


def block_width(f: int, M: int) -> int:
    """Lane-block width for a column pass: f*W ~ BLK_ELEMS, W | M."""
    return max(LANES, min(M, BLK_ELEMS // f))


@functools.partial(jax.jit, static_argnums=(0,))
def col_pass(spec, x: jnp.ndarray, stw: jnp.ndarray,
             pre: jnp.ndarray | None, post: jnp.ndarray | None) -> jnp.ndarray:
    """Fused column NTT pass (DIF over axis 2; output bit-reversed there).

    x    [L, BC, f, M]  (M % 128 == 0)
    stw  [L, (log_f-1)*(f/2), W] expanded stage twiddles (lane-replicated)
    pre  [L, f, M] optional elementwise pre-multiplier (coset scale),
         broadcast over BC
    post [L, f, M] optional elementwise post-multiplier (four-step
         twiddle), broadcast over BC
    """
    L = spec.num_limbs
    _, BC, f, M = x.shape
    log_f = f.bit_length() - 1
    W = block_width(f, M)
    assert M % W == 0 and stw.shape[2] == W
    grid = (BC, M // W)

    in_specs = [
        pl.BlockSpec((L, 1, f, W), lambda b, m: (0, b, 0, m),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(stw.shape, lambda b, m: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, stw]
    for t in (pre, post):
        if t is not None:
            in_specs.append(pl.BlockSpec((L, f, W), lambda b, m: (0, 0, m),
                                         memory_space=pltpu.VMEM))
            args.append(t)

    kernel = functools.partial(
        _col_kernel_body,
        tuple(np.uint32(v) for v in spec.p_limbs), np.uint32(spec.n0inv),
        L, f, log_f, W, pre is not None, post is not None)

    n_mm = (log_f - 1) / 2 + (pre is not None) + (post is not None)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((L, 1, f, W), lambda b, m: (0, b, 0, m),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=int(BC * M * f * n_mm) * (2 * L * L * 3),
            bytes_accessed=int(BC * M * f) * L * 4 * (2 + int(n_mm)),
            transcendentals=0,
        ),
    )(*args)


def _apply(spec, factors, x, stws, posts, pre0, postlast, perm):
    """Full fused NTT given per-pass tables.  x [L, n] or [L, B, n]."""
    L = spec.num_limbs
    batched = x.ndim == 3
    if not batched:
        x = x[:, None, :]
    B = x.shape[1]
    n = x.shape[2]
    Q = factors[-1]
    P = n // Q
    k = len(factors)

    state = x.reshape(L, B, factors[0], n // factors[0])
    bc = B
    for j, f in enumerate(factors[:-1]):
        M = state.shape[3]
        state = col_pass(spec, state, stws[j],
                         pre0 if j == 0 else None, posts[j])
        if j + 1 < k - 1:
            nf = factors[j + 1]
            state = state.reshape(L, bc * f, nf, M // nf)
            bc *= f

    state = state.reshape(L, B, P, Q)
    state = jnp.transpose(state, (0, 1, 3, 2))            # [L, B, Q, P]
    state = col_pass(spec, state, stws[k - 1], None, postlast)
    out = state.reshape(L, B, n)
    out = jnp.take(out, perm, axis=-1)
    return out if batched else out[:, 0]


class FusedNtt:
    """Per-(domain, direction, coset) fused-NTT plan.

    Precomputes on construction:
      * per-pass Pease stage-twiddle tables (host bigint; <= f entries),
      * per-pass four-step twiddle tables (device gather from ONE
        [L, n] root-powers table — never baked into executables),
      * the composite digit-reverse output permutation,
    and folds 1/n (inverse) plus the coset pre/post scales into them.
    """

    _INTERN: dict = {}

    @classmethod
    def get(cls, domain, inverse: bool, coset=None):
        factors = fused_factors(domain.n)
        if factors is None:
            return None
        key = (domain.spec.name, domain.n, inverse,
               None if coset is None else coset.g)
        plan = cls._INTERN.get(key)
        if plan is None:
            plan = cls(domain, inverse, coset, factors)
            cls._INTERN[key] = plan
        return plan

    def __init__(self, domain, inverse: bool, coset, factors):
        from . import field as F
        spec = domain.spec
        self.spec = spec
        self.factors = factors
        self.n = n = domain.n
        root = domain.w_inv if inverse else domain.w
        k = len(factors)

        # one [L, n] powers table of the FORWARD root; inverse exponents
        # index it mirrored.  Built once on device, reused by every table
        # gather below, then released (tables keep only their own memory).
        T = F.powers(spec, spec.to_device([domain.w])[:, 0], n)

        def tw_table(e: np.ndarray) -> jnp.ndarray:
            """w^(±e) for numpy int64 exponents (shape any)."""
            e = np.mod(-e if inverse else e, n).astype(np.int64)
            return jnp.take(T, jnp.asarray(e), axis=1)

        # per-pass stage twiddles + four-step post tables
        stws, posts = [], []
        M = n
        for j, f in enumerate(factors):
            M //= f
            wf = pow(root, n // f, spec.p)
            W = block_width(f, M if j < k - 1 else n // factors[-1])
            stws.append(jnp.asarray(stage_twiddles(spec, wf, f, W)))
            if j < k - 1:
                N_j = f * M
                r = _bitrev(np.arange(f, dtype=np.int64), f)
                e = (r[:, None] * np.arange(M, dtype=np.int64)[None, :]
                     * (n // N_j))
                posts.append(tw_table(e.reshape(-1)).reshape(
                    spec.num_limbs, f, M))

        perm = digit_rev_perm(factors, n)
        self.perm = jnp.asarray(perm)

        # fold 1/n into pass-0's post table (each element is hit once)
        if inverse:
            posts[0] = F.mul_const(spec, posts[0], domain.n_inv)

        pre0 = postlast = None
        if coset is not None:
            if inverse:
                # g^-j applies to natural-order outputs -> fold into the
                # last pass's post, indexed by storage position.
                inv_perm = np.empty(n, dtype=np.int64)
                inv_perm[perm] = np.arange(n, dtype=np.int64)
                Q = factors[-1]
                postlast = jnp.take(
                    coset.pows_inv, jnp.asarray(inv_perm), axis=1
                ).reshape(spec.num_limbs, Q, n // Q)
            else:
                # g^j pre-scale in natural input order
                pre0 = coset.pows.reshape(
                    spec.num_limbs, factors[0], n // factors[0])

        self.stws = tuple(stws)
        self.posts = tuple(posts)
        self.pre0 = pre0
        self.postlast = postlast

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..utils.aot_cache import cached_jit
        spec, factors = self.spec, self.factors
        shape = "x".join(map(str, x.shape))
        key = (f"fntt-{spec.name}-n{self.n}-f{'.'.join(map(str, factors))}"
               f"-{'pre' if self.pre0 is not None else ''}"
               f"{'pl' if self.postlast is not None else ''}-{shape}")
        fn = lambda x, stws, posts, pre0, postlast, perm: _apply(
            spec, factors, x, stws, posts, pre0, postlast, perm)
        args = (x, self.stws, self.posts, self.pre0, self.postlast, self.perm)
        return cached_jit(key, fn, *args, deps=("ntt",))(*args)
