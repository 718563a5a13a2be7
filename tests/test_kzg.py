"""KZG commit/open/verify end-to-end (small test SRS)."""

import random

import pytest

from mpc_jellyfish_tpu.curves import BN254
from mpc_jellyfish_tpu.pcs import kzg
from mpc_jellyfish_tpu.utils import ec_host as H

rng = random.Random(3)
curve = BN254


@pytest.fixture(scope="module")
def srs():
    return kzg.universal_setup_for_testing(curve, max_degree=40, seed=1)


def test_srs_structure(srs):
    # powers_of_g[i] = beta^i * g: check pairing relation e(P_{i+1}, h) == e(P_i, beta_h)
    from mpc_jellyfish_tpu.ops import ec as E
    from mpc_jellyfish_tpu import pairing as PR
    pts = E.affine_from_device(curve.fq, srs.powers_of_g)
    assert pts[0] == H.AffinePoint(*curve.g1_gen)
    assert PR.pairing_check(
        curve,
        [pts[3], H.ec_neg(curve.fq.p, pts[2])],
        [srs.h, srs.beta_h],
    )


def test_commit_open_verify(srs):
    ck, vk = srs.trim(32)
    coeffs = [rng.randrange(curve.fr.p) for _ in range(30)]
    cm = kzg.commit(ck, curve.fr.to_device(coeffs))
    z = rng.randrange(1, curve.fr.p)
    proof, value = kzg.open_at(ck, curve.fr.to_device(coeffs), z)
    want = 0
    for c in reversed(coeffs):
        want = (want * z + c) % curve.fr.p
    assert value == want
    assert kzg.verify_open(vk, cm, z, value, proof)
    # wrong value rejected
    assert not kzg.verify_open(vk, cm, z, (value + 1) % curve.fr.p, proof)
    # wrong point rejected
    assert not kzg.verify_open(vk, cm, (z + 1) % curve.fr.p, value, proof)


def test_srs_save_load(tmp_path, srs):
    path = str(tmp_path / "srs.npz")
    srs.save(path)
    loaded = kzg.UniversalSrs.load(path, curve)
    ck1, _ = srs.trim(8)
    ck2, _ = loaded.trim(8)
    coeffs = [5, 6, 7]
    assert kzg.commit(ck1, curve.fr.to_device(coeffs)) == kzg.commit(ck2, curve.fr.to_device(coeffs))
