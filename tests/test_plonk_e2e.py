"""End-to-end TurboPlonk prove/verify (mirror of reference snark.rs tests).

Circuit shape follows `gen_circuit_for_test` (snark.rs:681+): a mix of
public inputs, additions, multiplications and linear combinations.
"""

import random

import pytest

from mpc_jellyfish_tpu.curves import BN254
from mpc_jellyfish_tpu.relation.circuit import PlonkCircuit, CircuitError
from mpc_jellyfish_tpu.plonk.snark import PlonkKzgSnark, WrongProof
from mpc_jellyfish_tpu.pcs import kzg

curve = BN254


def gen_circuit_for_test(m: int, a0: int) -> PlonkCircuit:
    """Mirror of reference snark.rs:681-720 (TurboPlonk variant)."""
    cs = PlonkCircuit(curve.fr)
    a = [cs.create_variable(i) for i in range(a0, a0 + 4 * m)]
    b = [cs.create_public_variable(m * 2),
         cs.create_public_variable(a0 * 2 + m * 4 - 1)]
    c = cs.create_public_variable(
        (cs.witness_of(b[1]) + cs.witness_of(a[0]) - cs.witness_of(a[m - 1])) % curve.fr.p)

    # x0 + x1 = x2 chains
    for i in range(m):
        cs.add_gate(a[i], a[i + m], cs.add(a[i], a[i + m]))
    # multiplications
    prods = [cs.mul(a[i], a[i + 2 * m]) for i in range(m)]
    # linear combination
    lc = cs.lc([a[0], a[1], a[2], a[3]], [1, 2, 3, 4])
    # tie into public wire to make them non-trivial
    s = cs.add(b[0], lc)
    cs.sub_gate(s, lc, b[0])
    cs.mul_gate(prods[0], cs.one(), prods[0])
    # constrain c = b1 + a0 - a_{m-1}
    t = cs.add(b[1], a[0])
    cs.sub_gate(t, a[m - 1], c)
    return cs


@pytest.fixture(scope="module")
def setup():
    cs = gen_circuit_for_test(4, 3)
    cs.check_circuit_satisfiability(cs.public_input())
    cs.finalize_for_arithmetization()
    snark = PlonkKzgSnark(curve)
    srs = kzg.universal_setup_for_testing(curve, cs.srs_size(), seed=7)
    pk, vk = snark.preprocess(srs, cs)
    return cs, snark, pk, vk


def test_satisfiability_catches_bad_witness():
    cs = gen_circuit_for_test(4, 3)
    cs.witness[5] = (cs.witness[5] + 1) % curve.fr.p
    with pytest.raises(CircuitError):
        cs.check_circuit_satisfiability(cs.public_input())


def test_prove_verify_roundtrip(setup):
    cs, snark, pk, vk = setup
    rng = random.Random(11)
    proof = snark.prove(cs, pk, rng=rng, mask=True)
    snark.verify(vk, cs.public_input(), proof)


def test_prove_verify_unmasked_deterministic(setup):
    cs, snark, pk, vk = setup
    p1 = snark.prove(cs, pk, rng=random.Random(1), mask=False)
    p2 = snark.prove(cs, pk, rng=random.Random(2), mask=False)
    assert p1.opening_proof == p2.opening_proof  # deterministic without masking
    snark.verify(vk, cs.public_input(), p1)


def test_wrong_public_input_rejected(setup):
    cs, snark, pk, vk = setup
    proof = snark.prove(cs, pk, rng=random.Random(3), mask=True)
    bad_pi = list(cs.public_input())
    bad_pi[0] = (bad_pi[0] + 1) % curve.fr.p
    with pytest.raises(WrongProof):
        snark.verify(vk, bad_pi, proof)


def test_tampered_proof_rejected(setup):
    cs, snark, pk, vk = setup
    proof = snark.prove(cs, pk, rng=random.Random(4), mask=True)
    proof.poly_evals.wires_evals[0] = (proof.poly_evals.wires_evals[0] + 1) % curve.fr.p
    with pytest.raises(WrongProof):
        snark.verify(vk, cs.public_input(), proof)


def test_extra_transcript_msg(setup):
    cs, snark, pk, vk = setup
    proof = snark.prove(cs, pk, rng=random.Random(5), mask=True,
                        extra_transcript_init_msg=b"hello")
    snark.verify(vk, cs.public_input(), proof, extra_transcript_init_msg=b"hello")
    with pytest.raises(WrongProof):
        snark.verify(vk, cs.public_input(), proof, extra_transcript_init_msg=b"bye")


def test_chunked_quotient_bit_equal(monkeypatch):
    """The HBM-gated per-coset quotient path must produce bit-identical
    proofs to the monolithic 8n-domain path."""
    import os
    import random
    from mpc_jellyfish_tpu.pcs import kzg as _kzg
    spec = BN254.fr
    rng = random.Random(7)
    cs = PlonkCircuit(spec)
    vals = [cs.create_variable(rng.randrange(spec.p)) for _ in range(8)]
    out = cs.create_public_variable(0)
    acc = vals[0]
    for v in vals[1:]:
        acc = cs.mul(acc, v)
    cs.witness[out] = cs.witness_of(acc)
    cs.enforce_equal(acc, out)
    cs.finalize_for_arithmetization()
    srs = _kzg.universal_setup_for_testing(BN254, cs.srs_size(), seed=9)
    s1 = PlonkKzgSnark(BN254)
    pk1, vk1 = s1.preprocess(srs, cs)
    p1 = s1.prove(cs, pk1, rng=random.Random(1), mask=True)
    monkeypatch.setenv("MPC_JELLYFISH_TPU_QUOT_HBM_BYTES", "0")
    s2 = PlonkKzgSnark(BN254)
    pk2, vk2 = s2.preprocess(srs, cs)
    p2 = s2.prove(cs, pk2, rng=random.Random(1), mask=True)
    assert p1 == p2
    s2.verify(vk2, cs.public_input(), p2)


def test_batch_verify_native_chain_parity(setup):
    """compute_challenges_batch (native keccak chain) must equal the pure
    Python per-proof transcript hashing bit-for-bit, and batch_verify must
    accept a good batch / reject a tampered member."""
    from mpc_jellyfish_tpu.plonk.verifier import Verifier
    from mpc_jellyfish_tpu.plonk.structs import BatchProof

    cs, snark, pk, vk = setup
    extras = [None, b"hello", None]
    proofs = [snark.prove(cs, pk, rng=random.Random(100 + i), mask=True,
                          extra_transcript_init_msg=e)
              for i, e in enumerate(extras)]
    jobs = [([vk], [cs.public_input()], BatchProof.from_proof(p), e)
            for p, e in zip(proofs, extras)]
    v = Verifier(curve, vk.domain_size, snark.transcript_cls)
    batch = v.compute_challenges_batch(jobs)
    for ch, job in zip(batch, jobs):
        assert ch == v.compute_challenges(*job)

    vks = [vk] * 3
    pis = [cs.public_input()] * 3
    assert snark.batch_verify(vks, pis, proofs, extras)
    bad = list(proofs)
    bad[1] = proofs[0]  # wrong extra-msg pairing for slot 1
    with pytest.raises(WrongProof):
        snark.batch_verify(vks, pis, bad, extras)


def test_batch_verify_duplicate_instances(setup):
    """Identity-level dedup in batch_verify (snark.py): a batch that
    repeats one (vk, pi, proof) instance many times must accept, and a
    tampered member that aliases a duplicate's statement must still be
    hashed/checked on its own (distinct object => distinct job)."""
    cs, snark, pk, vk = setup
    good = snark.prove(cs, pk, rng=random.Random(7), mask=True)
    k = 64
    assert snark.batch_verify([vk] * k, [cs.public_input()] * k, [good] * k)
    # a distinct tampered proof object among the duplicates must reject
    bad = snark.prove(cs, pk, rng=random.Random(8), mask=True)
    bad.wires_poly_comms[0], bad.wires_poly_comms[1] = \
        bad.wires_poly_comms[1], bad.wires_poly_comms[0]
    with pytest.raises(WrongProof):
        snark.batch_verify([vk] * k, [cs.public_input()] * k,
                           [good] * (k - 1) + [bad])
