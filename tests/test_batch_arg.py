"""BatchArgument: merged-circuit batch proving + partial verify/decide."""

import random

import pytest

from mpc_jellyfish_tpu.curves import BN254
from mpc_jellyfish_tpu.relation.circuit import PlonkCircuit
from mpc_jellyfish_tpu.plonk.snark import PlonkKzgSnark
from mpc_jellyfish_tpu.plonk.batch_arg import BatchArgument
from mpc_jellyfish_tpu.pcs import kzg
from mpc_jellyfish_tpu.ops import ec as E

curve = BN254
spec = curve.fr
rng = random.Random(81)


def mergeable_circuit(shared_input: int, flag: bool) -> PlonkCircuit:
    """Mirror of new_mergeable_circuit_for_test (batch_arg.rs:206-229):
    shared public input, then either squaring or cubing gates."""
    cs = PlonkCircuit(spec)
    shared = cs.create_public_variable(shared_input)
    cur = shared
    for _ in range(4):
        cur = cs.mul(cur, cur) if flag else cs.mul(cur, shared)
    return cs


@pytest.fixture(scope="module")
def setup():
    shared_input = rng.randrange(spec.p)
    ba = BatchArgument(curve)
    srs = kzg.universal_setup_for_testing(curve, 64, seed=91)
    n_instances = 2
    insts_a, insts_b = [], []
    for i in range(n_instances):
        ca = mergeable_circuit(shared_input, True)
        cb = mergeable_circuit(shared_input, False)
        insts_a.append(ba.setup_instance(srs, ca, "A"))
        insts_b.append(ba.setup_instance(srs, cb, "B"))
    return shared_input, ba, srs, insts_a, insts_b


def test_merge_satisfiability(setup):
    shared_input, ba, srs, insts_a, insts_b = setup
    merged = insts_a[0].circuit.merge(insts_b[0].circuit)
    merged.check_circuit_satisfiability(merged.public_input())
    assert merged.num_inputs() == 2
    assert merged.public_input() == [shared_input, shared_input]


def test_batch_prove_and_verify(setup):
    shared_input, ba, srs, insts_a, insts_b = setup
    batch_proof = ba.batch_prove(random.Random(7), insts_a, insts_b)
    merged_vks = ba.aggregate_verify_keys(
        [i.verify_key_ref() for i in insts_a],
        [i.verify_key_ref() for i in insts_b])
    shared = [shared_input, shared_input]
    snark = PlonkKzgSnark(curve)
    snark.verify_batch_proof(merged_vks, [shared] * len(merged_vks), batch_proof)


def test_partial_verify_and_decide(setup):
    shared_input, ba, srs, insts_a, insts_b = setup
    batch_proof = ba.batch_prove(random.Random(8), insts_a, insts_b)
    merged_vks = ba.aggregate_verify_keys(
        [i.verify_key_ref() for i in insts_a],
        [i.verify_key_ref() for i in insts_b])
    pg = E.affine_from_device(curve.fq, srs.powers_of_g)
    g, beta_g = pg[0], pg[1]
    open_key = merged_vks[0].open_key
    blind = rng.randrange(spec.p)
    inner1, inner2 = ba.partial_verify(
        beta_g, g, merged_vks, [shared_input], batch_proof, blind)
    assert ba.decide(open_key, inner1, inner2)
    # wrong shared input fails at decide
    inner1, inner2 = ba.partial_verify(
        beta_g, g, merged_vks, [(shared_input + 1) % spec.p], batch_proof, blind)
    assert not ba.decide(open_key, inner1, inner2)