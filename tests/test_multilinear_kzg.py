"""Multilinear KZG round-trips vs a host MLE oracle.

Reference: primitives/src/pcs/multilinear_kzg/mod.rs tests (test_single_*).
"""

import random

import pytest

from mpc_jellyfish_tpu.curves import BN254
from mpc_jellyfish_tpu.pcs import multilinear_kzg as ML

R = BN254.fr.p


def mle_eval(evals, point):
    """Host oracle: fold variable 0 (LSB) first."""
    f = list(evals)
    for p_i in point:
        f = [(f[2 * b] + (f[2 * b + 1] - f[2 * b]) * p_i) % R
             for b in range(len(f) // 2)]
    return f[0]


class TestMultilinearKzg:
    @pytest.mark.parametrize("nv", [2, 4, 6])
    def test_commit_open_verify(self, nv):
        rng = random.Random(51)
        srs = ML.gen_srs_for_testing(BN254, 6, seed=7)
        ck, vk = srs.trim(nv)
        evals = [rng.randrange(R) for _ in range(1 << nv)]
        point = [rng.randrange(R) for _ in range(nv)]
        dev = BN254.fr.to_device(evals)
        comm = ML.commit(ck, dev)
        proof, value = ML.open_at(ck, dev, point)
        assert value == mle_eval(evals, point)
        assert ML.verify(vk, comm, point, value, proof)
        # wrong value rejected
        assert not ML.verify(vk, comm, point, (value + 1) % R, proof)
        # wrong point rejected
        bad_pt = list(point)
        bad_pt[0] = (bad_pt[0] + 1) % R
        assert not ML.verify(vk, comm, bad_pt, value, proof)

    def test_eq_eval(self):
        rng = random.Random(52)
        x = [rng.randrange(2) for _ in range(5)]
        y = list(x)
        assert ML.eq_eval(x, y, R) == 1
        y[3] ^= 1
        assert ML.eq_eval(x, y, R) == 0


class TestMultilinearBatch:
    def test_batch_open_verify(self):
        from mpc_jellyfish_tpu.pcs import kzg
        rng = random.Random(61)
        nv, npolys = 3, 2
        srs = ML.gen_srs_for_testing(BN254, nv + 1, seed=8)
        ck, vk = srs.trim(nv + 1)
        # univariate SRS large enough for q(x)
        uni_srs = kzg.universal_setup_for_testing(BN254, 1 << 6, seed=8)
        uni_ck, uni_vk = uni_srs.trim(1 << 6)

        evals_list = [[rng.randrange(R) for _ in range(1 << nv)]
                      for _ in range(npolys)]
        points = [[rng.randrange(R) for _ in range(nv)]
                  for _ in range(npolys)]
        mnv, merged = ML.merge_polynomials(BN254, evals_list)
        assert mnv == nv + 1
        batch_comm = ML.commit(ck, BN254.fr.to_device(merged))
        proof, values = ML.batch_open(uni_ck, ck, evals_list, batch_comm,
                                      points)
        # the omega^i evaluations carry each poly's value at its own point
        # through the merged MLE: cross-check against direct evaluation
        for i in range(npolys):
            from mpc_jellyfish_tpu.pcs.multilinear_kzg import _mle_eval_host
            dom = __import__("mpc_jellyfish_tpu.ops.ntt",
                             fromlist=["Domain"]).Domain(BN254.fr, 2)
            # values[i] corresponds to the merged MLE at l(omega^i), whose
            # inner coordinates are points[i] and prefix selects poly i
            assert values[i] == _mle_eval_host(
                R, merged, points[i] + [(i >> t) & 1 for t in range(1)])
        assert ML.batch_verify(uni_vk, vk, batch_comm, points, values, proof)
        # wrong value rejected
        bad = list(values)
        bad[-1] = (bad[-1] + 1) % R
        assert not ML.batch_verify(uni_vk, vk, batch_comm, points, bad, proof)
