"""TurboPlonk prove/verify round-trip on every supported curve.

Mirrors the reference's macro-generated per-curve e2e tests
(`snark.rs:672+` runs over BLS12-377/381, BN254, BW6-761)."""

import random

import pytest

from mpc_jellyfish_tpu.curves import BLS12_377, BLS12_381, BN254, BW6_761
from mpc_jellyfish_tpu.relation.circuit import PlonkCircuit
from mpc_jellyfish_tpu.plonk.snark import PlonkKzgSnark, WrongProof
from mpc_jellyfish_tpu.pcs import kzg


@pytest.mark.parametrize("curve", [BN254, BLS12_381, BLS12_377, BW6_761],
                         ids=lambda c: c.name)
def test_turboplonk_e2e(curve):
    p = curve.fr.p
    rng = random.Random(3)
    cs = PlonkCircuit(curve.fr)
    x = cs.create_variable(rng.randrange(p))
    y = cs.create_variable(rng.randrange(p))
    out_val = (pow(cs.witness_of(x), 5, p) + 3 * cs.witness_of(x)
               * cs.witness_of(y)) % p
    out = cs.create_public_variable(out_val)
    x5 = cs.pow5(x)
    xy3 = cs.mul_add([x, y, cs.zero(), cs.zero()], [3, 0])
    cs.enforce_equal(cs.add(x5, xy3), out)
    cs.check_circuit_satisfiability(cs.public_input())
    cs.finalize_for_arithmetization()

    snark = PlonkKzgSnark(curve)
    srs = kzg.universal_setup_for_testing(curve, cs.srs_size(), seed=11)
    pk, vk = snark.preprocess(srs, cs)
    proof = snark.prove(cs, pk, rng=random.Random(0), mask=True)
    assert snark.verify(vk, cs.public_input(), proof)
    with pytest.raises(WrongProof):
        snark.verify(vk, [(out_val + 1) % p], proof)
