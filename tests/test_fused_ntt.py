"""Fused four-step Pallas NTT vs the per-stage oracle.

On the CPU suite the fused kernels run in Pallas interpreter mode
(MPC_JELLYFISH_PALLAS_INTERPRET=1); on a real TPU the compiled path is
exercised by scripts/test_fused_ntt.py.  Either way the oracle is the
per-stage `_dif` scan path, which in turn is pinned against host bigint
NTTs in test_ntt_poly.py.
"""

import os
import random

import numpy as np
import pytest

from mpc_jellyfish_tpu.curves import BN254_FR as spec
from mpc_jellyfish_tpu.ops import ntt as N
from mpc_jellyfish_tpu.ops.pallas_ntt import FusedNtt, digit_rev_perm, \
    fused_factors


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("MPC_JELLYFISH_PALLAS_INTERPRET", "1")


def _rand(n, B=None):
    rng = random.Random(11)
    shape = n if B is None else B * n
    xs = [rng.randrange(spec.p) for _ in range(shape)]
    dev = spec.to_device(xs)
    return dev if B is None else dev.reshape(spec.num_limbs, B, n)


def test_digit_rev_perm_involution():
    n = 1 << 14
    factors = fused_factors(n)
    perm = digit_rev_perm(factors, n)
    assert sorted(perm.tolist()) == list(range(n))  # a permutation


@pytest.mark.parametrize("variant", ["ntt", "intt", "coset", "coset_inv"])
def test_fused_matches_per_stage(variant):
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


def test_fused_batched():
    n = 1 << 14
    dom = N.Domain(spec, n)
    x = _rand(n, B=2)
    plan = FusedNtt.get(dom, inverse=False)
    ref = N._ntt_jit(dom, x, dom.twiddles_fwd, dom.bitrev)
    assert np.array_equal(np.asarray(plan(x)), np.asarray(ref))
