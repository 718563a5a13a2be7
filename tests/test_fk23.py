"""FK23 multi-open at roots of unity + PCS batch open/verify.

Mirrors reference tests in `pcs/univariate_kzg/mod.rs` (`end_to_end_test`,
`batch_check_test`, `test_multi_open_rou`): every FK23 proof must verify
under the ordinary single-point `verify_open`, and evals must match host
polynomial evaluation.
"""

import random

import pytest

from mpc_jellyfish_tpu.curves import BN254
from mpc_jellyfish_tpu.pcs import kzg

FR = BN254.fr
RNG = random.Random(42)


@pytest.fixture(scope="module")
def srs():
    return kzg.universal_setup_for_testing(BN254, 64, seed=9)


def _poly(deg):
    return [RNG.randrange(FR.p) for _ in range(deg + 1)]


def _eval(coeffs, x):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % FR.p
    return acc


def test_multi_open_rou(srs):
    ck, vk = srs.trim(32)
    coeffs = _poly(14)
    dev = FR.to_device(coeffs)
    comm = kzg.commit(ck, dev)

    num_points = 8
    domain = kzg.multi_open_rou_eval_domain(BN254, 14, num_points)
    proofs, evals = kzg.multi_open_rou(ck, dev, num_points, domain)
    assert len(proofs) == len(evals) == num_points

    pts = domain.elements_host
    for i in range(num_points):
        assert evals[i] == _eval(coeffs, pts[i])
        assert kzg.verify_open(vk, comm, pts[i], evals[i], proofs[i])
    # wrong eval rejected
    assert not kzg.verify_open(vk, comm, pts[0], (evals[0] + 1) % FR.p,
                               proofs[0])


def test_batch_open_verify(srs):
    ck, vk = srs.trim(32)
    polys = [_poly(d) for d in (5, 9, 17)]
    devs = [FR.to_device(c) for c in polys]
    comms = kzg.commit_batch(ck, devs)
    points = [RNG.randrange(FR.p) for _ in polys]

    proofs, evals = kzg.batch_open(ck, devs, points)
    for c, z, v in zip(polys, points, evals):
        assert v == _eval(c, z)
    assert kzg.batch_verify(vk, comms, points, evals, proofs,
                            random.Random(1))
    bad = list(evals)
    bad[1] = (bad[1] + 1) % FR.p
    assert not kzg.batch_verify(vk, comms, points, bad, proofs,
                                random.Random(1))
