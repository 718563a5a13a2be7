"""Fused four-step Pallas NTT: kernel + plumbing correctness on CPU.

The fused path needs n >= 2^14 (the final column pass puts P = n/128 on
lanes and Mosaic wants full 128-lane tiles), and interpret-mode Pallas at
2^14 costs >1h of CPU — the round-3 version of this file silently dominated
the whole suite.  Split coverage instead:

 * `test_col_pass_*`: the Pallas column kernel (all Pease stages + pre/post
   muls) in interpret mode at SMALL [f, W] slabs vs a jnp reference — the
   only part interpret mode must execute.
 * `test_apply_wiring_*`: the full plan (factor split, four-step twiddles,
   coset folding, transpose, digit-reverse perm) at the production
   n = 2^14 with `col_pass` monkeypatched to that same jnp reference —
   exercises every table and reshape without the interpreter.

The compiled TPU path end-to-end is exercised by scripts/test_fused_ntt.py
and by every TPU prove (bench.py).  The `_dif` oracle is pinned against
host bigint NTTs in test_ntt_poly.py.
"""

import random

import numpy as np
import pytest
import jax.numpy as jnp

from mpc_jellyfish_tpu.curves import BN254_FR as spec
from mpc_jellyfish_tpu.ops import field as F
from mpc_jellyfish_tpu.ops import ntt as N
from mpc_jellyfish_tpu.ops import pallas_ntt as PN
from mpc_jellyfish_tpu.ops.pallas_ntt import (FusedNtt, digit_rev_perm,
                                              fused_factors)


def _rand(n, B=None, seed=11):
    rng = random.Random(seed)
    shape = n if B is None else B * n
    xs = [rng.randrange(spec.p) for _ in range(shape)]
    dev = spec.to_device(xs)
    return dev if B is None else dev.reshape(spec.num_limbs, B, n)


def test_digit_rev_perm_involution():
    n = 1 << 14
    factors = fused_factors(n)
    perm = digit_rev_perm(factors, n)
    assert sorted(perm.tolist()) == list(range(n))  # a permutation


def _ref_col_pass(x, stw, pre, post):
    """Vectorized jnp reference of PN.col_pass (same Pease DIF semantics:
    output bit-reversed over axis 2, optional pre/post elementwise muls).
    stw is lane-replicated, so only stw[..., :1] is consulted."""
    L, BC, f, M = x.shape
    h = f // 2
    log_f = f.bit_length() - 1
    v = x
    if pre is not None:
        v = F.mul(spec, v, pre[:, None])

    def interleave(s_, d_):
        return jnp.stack([s_, d_], axis=3).reshape(L, BC, f, M)

    for s in range(max(log_f - 1, 0)):
        w = stw[:, s * h:(s + 1) * h, :1]          # [L, h, 1]
        a, b = v[:, :, :h], v[:, :, h:]
        s_ = F.add(spec, a, b)
        d_ = F.mul(spec, F.sub(spec, a, b), w[:, None])
        v = interleave(s_, d_)
    a, b = v[:, :, :h], v[:, :, h:]
    v = interleave(F.add(spec, a, b), F.sub(spec, a, b))
    if post is not None:
        v = F.mul(spec, v, post[:, None])
    return v


@pytest.mark.parametrize("f,with_pre,with_post",
                         [(8, False, False),      # unrolled stage loop
                          (16, True, True),       # rolled stage loop + both muls
                          (32, False, True)])     # rolled, deeper, post only
def test_col_pass_interpret_vs_ref(f, with_pre, with_post, monkeypatch):
    """The Pallas kernel body (interpret mode) vs the jnp reference at a
    small [BC, f, W] slab: covers the in-kernel stage loop, twiddle
    indexing, rolled/unrolled stage split and pre/post fusion.  Shapes are
    the minimum legal slab — interpret mode costs ~20s per case."""
    monkeypatch.setenv("MPC_JELLYFISH_PALLAS_INTERPRET", "1")
    BC, M = 1, 128
    W = PN.block_width(f, M)
    wf = spec.nth_root(f)
    stw = jnp.asarray(PN.stage_twiddles(spec, wf, f, W))
    x = _rand(BC * f * M).reshape(spec.num_limbs, BC, f, M)
    pre = (_rand(f * M, seed=5).reshape(spec.num_limbs, f, M)
           if with_pre else None)
    post = (_rand(f * M, seed=7).reshape(spec.num_limbs, f, M)
            if with_post else None)
    got = PN.col_pass(spec, x, stw, pre, post)
    want = _ref_col_pass(x, stw, pre, post)
    assert np.array_equal(np.asarray(got), np.asarray(want))


@pytest.fixture
def _mock_col_pass(monkeypatch, tmp_path):
    """Replace the Pallas kernel with the jnp reference so the full plan
    runs at production size on CPU in seconds.  The AOT export cache is
    pointed at a throwaway dir: its key doesn't see the monkeypatch, so a
    stale export of the REAL kernel could otherwise bypass the mock."""
    monkeypatch.setenv("MPC_JELLYFISH_TPU_CACHE", str(tmp_path))
    def fake(spec_, x, stw, pre, post):
        assert spec_ is spec
        return _ref_col_pass(x, stw, pre, post)
    monkeypatch.setattr(PN, "col_pass", fake)


@pytest.mark.parametrize("variant", ["ntt", "intt", "coset", "coset_inv"])
def test_apply_wiring_matches_per_stage(variant, _mock_col_pass):
    n = 1 << 14
    dom = N.Domain(spec, n)
    ct = N.CosetTable(dom)
    x = _rand(n)
    if variant == "ntt":
        plan = FusedNtt.get(dom, inverse=False)
        ref = N._ntt_jit(dom, x, dom.twiddles_fwd, dom.bitrev)
    elif variant == "intt":
        plan = FusedNtt.get(dom, inverse=True)
        ref = N._intt_jit(dom, x, dom.twiddles_inv, dom.bitrev)
    elif variant == "coset":
        plan = FusedNtt.get(dom, inverse=False, coset=ct)
        ref = N._coset_ntt_jit(dom, x, ct.pows, dom.twiddles_fwd, dom.bitrev)
    else:
        plan = FusedNtt.get(dom, inverse=True, coset=ct)
        ref = N._coset_intt_jit(dom, x, ct.pows_inv, dom.twiddles_inv,
                                dom.bitrev)
    got = plan(x)
    assert np.array_equal(np.asarray(got), np.asarray(ref))


def test_apply_wiring_batched(_mock_col_pass):
    n = 1 << 14
    dom = N.Domain(spec, n)
    x = _rand(n, B=2)
    plan = FusedNtt.get(dom, inverse=False)
    ref = N._ntt_jit(dom, x, dom.twiddles_fwd, dom.bitrev)
    assert np.array_equal(np.asarray(plan(x)), np.asarray(ref))


def test_stage_pallas_gate():
    """Regression for the round-3 TPU crash (bench_r3_batchverify.log):
    domains 256..1024 produce Mosaic-illegal sublane blocks (half spans
    < 8 rows of 128 lanes) and must NOT dispatch to the per-stage Pallas
    kernel; 2048+ is legal."""
    for n in (2, 64, 256, 512, 1024):
        assert not N._stage_pallas_ok(n), n
    for n in (2048, 4096, 8192, 1 << 14, 1 << 20):
        assert N._stage_pallas_ok(n), n
    # the kernel itself refuses unsupported shapes loudly instead of dying
    # inside Mosaic lowering
    from mpc_jellyfish_tpu.ops import pallas_field as PF
    x = _rand(1024)
    w = _rand(512)
    with pytest.raises(AssertionError, match="n >= 2048"):
        PF.ntt_stage_pallas(spec, x, w)
