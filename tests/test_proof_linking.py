"""Proof linking: shared witness sub-vector between two proofs."""

import random

import pytest

from mpc_jellyfish_tpu.curves import BN254
from mpc_jellyfish_tpu.relation.circuit import PlonkCircuit
from mpc_jellyfish_tpu.relation.proof_linking import GroupLayout
from mpc_jellyfish_tpu.plonk.snark import PlonkKzgSnark
from mpc_jellyfish_tpu.plonk import proof_linking as PL
from mpc_jellyfish_tpu.pcs import kzg

curve = BN254
spec = curve.fr
rng = random.Random(41)


def circuit_sum(shared_vals, layout=None):
    """Sum circuit over linked witnesses (mirror of gen_test_circuit1)."""
    cs = PlonkCircuit(spec)
    g = cs.create_link_group("g1", layout)
    vs = [cs.create_variable_with_link_groups(v, [g]) for v in shared_vals]
    extra = cs.create_variable(5)
    acc = vs[0]
    for v in vs[1:]:
        acc = cs.add(acc, v)
    acc = cs.add(acc, extra)
    out = cs.create_public_variable(cs.witness_of(acc))
    cs.enforce_equal(acc, out)
    return cs


def circuit_prod(shared_vals, layout=None):
    """Product circuit over the same linked witnesses (gen_test_circuit2)."""
    cs = PlonkCircuit(spec)
    g = cs.create_link_group("g1", layout)
    vs = [cs.create_variable_with_link_groups(v, [g]) for v in shared_vals]
    acc = vs[0]
    for v in vs[1:]:
        acc = cs.mul(acc, v)
    out = cs.create_public_variable(cs.witness_of(acc))
    cs.enforce_equal(acc, out)
    return cs


@pytest.fixture(scope="module")
def setup():
    shared = [rng.randrange(spec.p) for _ in range(4)]
    # use a fixed layout so both circuits agree regardless of their sizes
    layout = GroupLayout(alignment=4, offset=6, size=4)
    cs1 = circuit_sum(shared, layout)
    cs2 = circuit_prod(shared, layout)
    cs1.finalize_for_arithmetization()
    cs2.finalize_for_arithmetization()
    snark = PlonkKzgSnark(curve)
    srs = kzg.universal_setup_for_testing(
        curve, max(cs1.srs_size(), cs2.srs_size()), seed=33)
    pk1, vk1 = snark.preprocess(srs, cs1)
    pk2, vk2 = snark.preprocess(srs, cs2)
    return shared, layout, cs1, cs2, snark, srs, pk1, vk1, pk2, vk2


def test_layout_placement(setup):
    shared, layout, cs1, cs2, *_ = setup
    gl = cs1.link_group_layouts["g1"]
    assert gl == layout
    # linked variables occupy the layout slots on wire 0
    calign = cs1.eval_domain_n.bit_length() - 1
    start, _ = gl.range_in_nth_roots(calign)
    spacing = 1 << (calign - gl.alignment)
    for i in range(gl.size):
        gate = cs1.gates[start + i * spacing]
        assert gate.name == "Proof Linking Gate"


def test_link_and_verify(setup):
    shared, layout, cs1, cs2, snark, srs, pk1, vk1, pk2, vk2 = setup
    proof1, hint1 = snark.prove_with_link_hint(cs1, pk1, rng=random.Random(1))
    proof2, hint2 = snark.prove_with_link_hint(cs2, pk2, rng=random.Random(2))
    snark.verify(vk1, cs1.public_input(), proof1)
    snark.verify(vk2, cs2.public_input(), proof2)

    link = PL.link_proofs(curve, hint1, hint2, layout, pk1.commit_key)
    assert PL.verify_link_proof(curve, proof1, proof2, link, layout,
                                vk1.open_key)


def test_link_fails_on_different_witness(setup):
    shared, layout, cs1, cs2, snark, srs, pk1, vk1, pk2, vk2 = setup
    other = [rng.randrange(spec.p) for _ in range(4)]
    cs3 = circuit_prod(other, layout)
    cs3.finalize_for_arithmetization()
    pk3, vk3 = snark.preprocess(srs, cs3)
    proof1, hint1 = snark.prove_with_link_hint(cs1, pk1, rng=random.Random(3))
    proof3, hint3 = snark.prove_with_link_hint(cs3, pk3, rng=random.Random(4))
    link = PL.link_proofs(curve, hint1, hint3, layout, pk1.commit_key)
    assert not PL.verify_link_proof(curve, proof1, proof3, link, layout,
                                    vk1.open_key)