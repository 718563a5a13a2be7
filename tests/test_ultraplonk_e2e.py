"""End-to-end UltraPlonk (Plookup) prove/verify."""

import random

import pytest

from mpc_jellyfish_tpu.curves import BN254
from mpc_jellyfish_tpu.relation.circuit import PlonkCircuit, CircuitError
from mpc_jellyfish_tpu.plonk.snark import PlonkKzgSnark, WrongProof
from mpc_jellyfish_tpu.pcs import kzg

curve = BN254
RANGE_BIT_LEN = 4


def gen_ultra_circuit(m: int, a0: int) -> PlonkCircuit:
    cs = PlonkCircuit(curve.fr, ultra_plonk=True, range_bit_len=RANGE_BIT_LEN)
    a = [cs.create_variable(i) for i in range(a0, a0 + 2 * m)]
    b = [cs.create_public_variable(m * 2),
         cs.create_public_variable(a0 * 2 + m * 4 - 1)]
    # arithmetic mix
    for i in range(m):
        cs.add_gate(a[i], a[i + m], cs.add(a[i], a[i + m]))
    s = cs.mul(a[0], a[1])
    cs.mul_gate(s, cs.one(), s)
    t = cs.add(b[0], b[1])
    cs.add_gate(b[0], b[1], t)
    # range checks through the lookup wire
    for i in range(3):
        cs.enforce_in_range(cs.create_variable(11 + i), 7)
    # key-value lookup table
    table_vars = []
    for i in range(4):
        v0 = cs.create_variable(100 + i)
        v1 = cs.create_variable(200 + i)
        table_vars.append((v0, v1))
    key = cs.create_variable(2)
    val0 = cs.create_variable(102)
    val1 = cs.create_variable(202)
    cs.create_table_and_lookup_variables([(key, val0, val1)], table_vars)
    return cs


@pytest.fixture(scope="module")
def setup():
    cs = gen_ultra_circuit(3, 5)
    cs.check_circuit_satisfiability(cs.public_input())
    cs.finalize_for_arithmetization()
    snark = PlonkKzgSnark(curve)
    srs = kzg.universal_setup_for_testing(curve, cs.srs_size(), seed=13)
    pk, vk = snark.preprocess(srs, cs)
    return cs, snark, pk, vk


def test_lookup_satisfiability_checks():
    cs = gen_ultra_circuit(3, 5)
    cs.check_circuit_satisfiability(cs.public_input())
    # out-of-range witness on the lookup wire
    bad = PlonkCircuit(curve.fr, ultra_plonk=True, range_bit_len=RANGE_BIT_LEN)
    v = bad.create_variable(1 << RANGE_BIT_LEN)
    bad.add_range_check_variable(v)
    with pytest.raises(CircuitError):
        bad.check_circuit_satisfiability([])
    # lookup value outside table
    bad2 = PlonkCircuit(curve.fr, ultra_plonk=True, range_bit_len=RANGE_BIT_LEN)
    t0 = bad2.create_variable(7)
    t1 = bad2.create_variable(8)
    k = bad2.create_variable(0)
    w0 = bad2.create_variable(9)   # wrong value
    w1 = bad2.create_variable(8)
    bad2.create_table_and_lookup_variables([(k, w0, w1)], [(t0, t1)])
    with pytest.raises(CircuitError):
        bad2.check_circuit_satisfiability([])


def test_ultra_prove_verify(setup):
    cs, snark, pk, vk = setup
    proof = snark.prove(cs, pk, rng=random.Random(2), mask=True)
    assert proof.plookup_proof is not None
    snark.verify(vk, cs.public_input(), proof)


def test_ultra_wrong_input_rejected(setup):
    cs, snark, pk, vk = setup
    proof = snark.prove(cs, pk, rng=random.Random(3), mask=True)
    bad_pi = list(cs.public_input())
    bad_pi[0] = (bad_pi[0] + 1) % curve.fr.p
    with pytest.raises(WrongProof):
        snark.verify(vk, bad_pi, proof)


def test_ultra_tampered_lookup_eval_rejected(setup):
    cs, snark, pk, vk = setup
    proof = snark.prove(cs, pk, rng=random.Random(4), mask=True)
    proof.plookup_proof.poly_evals.h_1_eval = (
        proof.plookup_proof.poly_evals.h_1_eval + 1) % curve.fr.p
    with pytest.raises(WrongProof):
        snark.verify(vk, cs.public_input(), proof)


def test_ultra_chunked_quotient_bit_equal(monkeypatch):
    """UltraPlonk: the HBM-gated per-coset quotient path (lookup polys in
    the chunk stream) must produce bit-identical proofs to the monolithic
    8n-domain path.  (The Turbo twin lives in test_plonk_e2e.py; the Ultra
    path is the harder one: h1/h2, lookup tables and the lookup grand
    product all ride the chunked coset NTT.)"""
    cs = gen_ultra_circuit(3, 5)
    cs.finalize_for_arithmetization()
    srs = kzg.universal_setup_for_testing(curve, cs.srs_size(), seed=13)
    s1 = PlonkKzgSnark(curve)
    pk1, vk1 = s1.preprocess(srs, cs)
    p1 = s1.prove(cs, pk1, rng=random.Random(2), mask=True)
    monkeypatch.setenv("MPC_JELLYFISH_TPU_QUOT_HBM_BYTES", "0")
    s2 = PlonkKzgSnark(curve)
    pk2, vk2 = s2.preprocess(srs, cs)
    p2 = s2.prove(cs, pk2, rng=random.Random(2), mask=True)
    assert p1 == p2
    s2.verify(vk2, cs.public_input(), p2)


def test_device_sorted_indices_parity(setup):
    """Device-side Plookup sorted indices (lexicographic multi-key sort,
    plonk/prover.py) must reproduce the host dict-walk ordering of
    circuit.lookup_sorted_indices bit-for-bit (reference
    constraint_system.rs:1370-1417: lookups bind to the FIRST table row
    holding their value)."""
    import random as _r
    from mpc_jellyfish_tpu.plonk.prover import Prover
    cs, snark, pk, vk = setup
    spec = curve.fr
    n = cs.eval_domain_size()
    prover = Prover(spec, n, cs.num_wire_types)
    wv = [spec.to_device(col) for col in cs.wire_values()]
    tau = _r.Random(3).randrange(spec.p)
    mt_dev, ml_dev = prover.plookup_merge(pk, wv, tau)
    idx_dev, ok = prover.plookup_sorted_indices_dev(mt_dev, ml_dev)
    assert bool(ok)
    host_idx = cs.lookup_sorted_indices(spec.from_device(mt_dev),
                                        spec.from_device(ml_dev))
    assert list(map(int, idx_dev)) == list(map(int, host_idx))


def test_device_sorted_indices_rejects_missing(setup):
    """ok=False when a lookup value is absent from the table."""
    from mpc_jellyfish_tpu.plonk.prover import Prover
    import jax.numpy as jnp
    cs, snark, pk, vk = setup
    spec = curve.fr
    n = cs.eval_domain_size()
    prover = Prover(spec, n, cs.num_wire_types)
    wv = [spec.to_device(col) for col in cs.wire_values()]
    mt_dev, ml_dev = prover.plookup_merge(pk, wv, 12345)
    # corrupt one merged-lookup value so it matches no table entry
    bad = spec.to_device([987654321])[:, 0]
    ml_bad = ml_dev.at[:, 0].set(bad)
    _idx, ok = prover.plookup_sorted_indices_dev(mt_dev, ml_bad)
    assert not bool(ok)
