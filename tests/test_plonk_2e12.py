"""Mid-size (2^12-domain) CPU e2e: exercises chunked-MSM segment boundaries
and padding at a realistic domain size (VERDICT r1 item 10)."""

import random

from mpc_jellyfish_tpu.curves import BN254
from mpc_jellyfish_tpu.pcs import kzg
from mpc_jellyfish_tpu.plonk.snark import PlonkKzgSnark
from mpc_jellyfish_tpu.relation.circuit import PlonkCircuit


def test_prove_verify_2e12():
    spec = BN254.fr
    rng = random.Random(77)
    cs = PlonkCircuit(spec)
    vals = [cs.create_variable(rng.randrange(spec.p)) for _ in range(16)]
    out = cs.create_public_variable(0)
    i = 0
    while cs.num_gates() < (1 << 12) - 10:
        a, b = vals[i % 16], vals[(i + 5) % 16]
        vals[i % 16] = cs.mul(a, b) if i % 2 else cs.add(a, b)
        i += 1
    cs.witness[out] = cs.witness_of(vals[0])
    cs.enforce_equal(vals[0], out)
    cs.finalize_for_arithmetization()
    assert cs.eval_domain_size() == 1 << 12

    snark = PlonkKzgSnark(BN254)
    srs = kzg.universal_setup_for_testing(BN254, cs.srs_size(), seed=9)
    pk, vk = snark.preprocess(srs, cs)
    proof = snark.prove(cs, pk, rng=random.Random(1), mask=True)
    snark.verify(vk, cs.public_input(), proof)
    # wrong public input rejected
    import pytest
    from mpc_jellyfish_tpu.plonk.snark import PlonkError
    with pytest.raises(PlonkError):
        snark.verify(vk, [(cs.public_input()[0] + 1) % spec.p], proof)
