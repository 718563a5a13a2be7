"""Collaborative proof linking vs the single-prover oracle.

Mirror of `plonk/src/multiprover/proof_system/proof_linking.rs:232-565`
tests: valid link verified by the single-prover link verifier, bit-equality
with the plaintext link proof (masking off), and rejection with a
different witness / wrong layout.
"""

import random

import pytest

from mpc_jellyfish_tpu.curves import BN254
from mpc_jellyfish_tpu.relation.circuit import PlonkCircuit
from mpc_jellyfish_tpu.relation.proof_linking import GroupLayout
from mpc_jellyfish_tpu.plonk.snark import PlonkKzgSnark
from mpc_jellyfish_tpu.plonk import proof_linking as PL
from mpc_jellyfish_tpu.pcs import kzg
from mpc_jellyfish_tpu.multiprover.fabric import MockFabric
from mpc_jellyfish_tpu.multiprover.circuit import MpcPlonkCircuit
from mpc_jellyfish_tpu.multiprover.snark import MultiproverPlonkKzgSnark
from mpc_jellyfish_tpu.multiprover import proof_linking as MPL

curve = BN254
spec = curve.fr
rng = random.Random(47)

LAYOUT = GroupLayout(alignment=4, offset=6, size=4)


def _build(cs, shared_vals, layout, flavor):
    """gen_test_circuit1/2 analogs: sum / product over the linked witness."""
    g = cs.create_link_group("g1", layout)
    vs = [cs.create_variable_with_link_groups(v, [g]) for v in shared_vals]
    acc = vs[0]
    for v in vs[1:]:
        acc = cs.add(acc, v) if flavor == "sum" else cs.mul(acc, v)
    out = cs.create_public_variable(cs.witness_of(acc))
    cs.enforce_equal(acc, out)
    return cs


def _mpc_circuit(fab, shared_vals, flavor):
    cs = MpcPlonkCircuit(fab)
    g = cs.create_link_group("g1", LAYOUT)
    vs = [cs.create_variable_with_link_groups(v, [g]) for v in shared_vals]
    acc = vs[0]
    for v in vs[1:]:
        acc = cs.add(acc, v) if flavor == "sum" else cs.mul(acc, v)
    out = cs.create_public_variable(cs.witness_of(acc))
    cs.enforce_equal(acc, out)
    cs.finalize_for_arithmetization()
    return cs


@pytest.fixture(scope="module")
def setup():
    vals = [rng.randrange(spec.p) for _ in range(4)]
    cs1 = _build(PlonkCircuit(spec), vals, LAYOUT, "sum")
    cs2 = _build(PlonkCircuit(spec), vals, LAYOUT, "prod")
    cs1.finalize_for_arithmetization()
    cs2.finalize_for_arithmetization()
    snark = PlonkKzgSnark(curve)
    srs = kzg.universal_setup_for_testing(
        curve, max(cs1.srs_size(), cs2.srs_size()), seed=37)
    pk1, vk1 = snark.preprocess(srs, cs1)
    pk2, _ = snark.preprocess(srs, cs2)
    commit_key = pk1.commit_key
    open_key = vk1.open_key
    return vals, snark, srs, pk1, pk2, commit_key, open_key, cs1, cs2


def _mpc_link(vals1, vals2, setup, seed=5):
    _, snark, srs, pk1, pk2, commit_key, open_key, *_ = setup
    fab = MockFabric(spec, seed=seed)
    mcs1 = _mpc_circuit(fab, [fab.share_scalars([v]) for v in vals1], "sum")
    mcs2 = _mpc_circuit(fab, [fab.share_scalars([v]) for v in vals2], "prod")
    msnark = MultiproverPlonkKzgSnark(curve)
    proof1, hint1 = msnark.prove_with_link_hint(fab, mcs1, pk1, mask=False)
    proof2, hint2 = msnark.prove_with_link_hint(fab, mcs2, pk2, mask=False)
    link = MPL.link_proofs(curve, fab, hint1, hint2, LAYOUT, commit_key)
    return proof1, proof2, link


def test_mpc_link_valid_and_bit_equal(setup):
    vals, snark, srs, pk1, pk2, commit_key, open_key, cs1, cs2 = setup
    proof1, proof2, link = _mpc_link(vals, vals, setup)
    assert PL.verify_link_proof(curve, proof1, proof2, link, LAYOUT, open_key)

    # bit-equality oracle: same circuits, plaintext prover, masking off
    sp1, sh1 = snark.prove_with_link_hint(cs1, pk1, rng=random.Random(1),
                                          mask=False)
    sp2, sh2 = snark.prove_with_link_hint(cs2, pk2, rng=random.Random(2),
                                          mask=False)
    slink = PL.link_proofs(curve, sh1, sh2, LAYOUT, commit_key)
    assert slink.quotient_commitment == link.quotient_commitment
    assert slink.opening_proof == link.opening_proof


def test_mpc_link_rejects_different_witness(setup):
    vals = setup[0]
    vals2 = list(vals)
    vals2[rng.randrange(len(vals))] = rng.randrange(spec.p)
    open_key = setup[6]
    proof1, proof2, link = _mpc_link(vals, vals2, setup, seed=6)
    assert not PL.verify_link_proof(curve, proof1, proof2, link, LAYOUT,
                                    setup[6])


def test_mpc_link_rejects_wrong_layout(setup):
    vals, open_key = setup[0], setup[6]
    proof1, proof2, link = _mpc_link(vals, vals, setup, seed=7)
    bad = GroupLayout(alignment=LAYOUT.alignment, offset=LAYOUT.offset - 1,
                      size=LAYOUT.size)
    assert not PL.verify_link_proof(curve, proof1, proof2, link, bad,
                                    open_key)
