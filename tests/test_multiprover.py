"""Collaborative (MPC) prover vs the single-prover oracle.

Mirror of the reference's mock-MPC test strategy (SURVEY.md §4): both
parties in-process, collaborative proof verified by the STANDARD verifier,
and (with masking off) bit-equal to the plaintext proof.
"""

import random

import pytest

from mpc_jellyfish_tpu.curves import BN254
from mpc_jellyfish_tpu.relation.circuit import PlonkCircuit
from mpc_jellyfish_tpu.plonk.snark import PlonkKzgSnark, WrongProof
from mpc_jellyfish_tpu.pcs import kzg
from mpc_jellyfish_tpu.multiprover.fabric import MockFabric, Shared
from mpc_jellyfish_tpu.multiprover.circuit import MpcPlonkCircuit
from mpc_jellyfish_tpu.multiprover.snark import MultiproverPlonkKzgSnark

curve = BN254
spec = curve.fr
rng = random.Random(31)


def test_fabric_ops():
    fab = MockFabric(spec, seed=1)
    xs = [rng.randrange(spec.p) for _ in range(6)]
    ys = [rng.randrange(spec.p) for _ in range(6)]
    a = fab.share_scalars(xs)
    b = fab.share_scalars(ys)
    assert fab.open_to_ints(a) == xs
    assert fab.open_to_ints(fab.add(a, b)) == [(x + y) % spec.p for x, y in zip(xs, ys)]
    got = fab.open_to_ints(fab.mul(a, b))
    assert got == [x * y % spec.p for x, y in zip(xs, ys)]
    inv = fab.open_to_ints(fab.inv(a))
    assert inv == [pow(x, -1, spec.p) for x in xs]
    cp = fab.open_to_ints(fab.cumprod(a))
    acc, want = 1, []
    for x in xs:
        acc = acc * x % spec.p
        want.append(acc)
    assert cp == want
    assert fab.n_triples > 0 and fab.n_openings > 0


def test_fabric_mac_detects_tamper():
    import jax.numpy as jnp
    from mpc_jellyfish_tpu.ops import field as F
    fab = MockFabric(spec, seed=2)
    a = fab.share_scalars([5])
    bad_share = a.share.at[0, 0, 0].add(1)   # corrupt party 0's share
    with pytest.raises(ValueError):
        fab.open(Shared(bad_share, a.mac))


def _build_circuits(witness_vals):
    """Same circuit twice: plaintext and shared-witness."""
    def build(cs, vals):
        a = [cs.create_variable(v) for v in vals]
        s = cs.mul(a[0], a[1])
        t = cs.add(s, a[2])
        u = cs.lc([a[0], a[1], a[2], a[3]], [1, 2, 3, 4])
        v = cs.mul_add([t, u, a[0], a[1]], [1, 1])
        out = cs.create_public_variable(v_val(vals))
        cs.enforce_equal(v, out)
        return cs

    def v_val(vals):
        p = spec.p
        s = vals[0] * vals[1] % p
        t = (s + vals[2]) % p
        u = (vals[0] + 2 * vals[1] + 3 * vals[2] + 4 * vals[3]) % p
        return (t * u + vals[0] * vals[1]) % p

    plain = build(PlonkCircuit(spec), witness_vals)

    fab = MockFabric(spec, seed=5)
    mpc = MpcPlonkCircuit(fab)
    shared_vals = [fab.share_scalars([v]) for v in witness_vals]
    mpc2 = build.__wrapped__ if False else None
    # rebuild with shared values
    a = [mpc.create_variable(sv) for sv in shared_vals]
    s = mpc.mul(a[0], a[1])
    t = mpc.add(s, a[2])
    u = mpc.lc([a[0], a[1], a[2], a[3]], [1, 2, 3, 4])
    v = mpc.mul_add([t, u, a[0], a[1]], [1, 1])
    out = mpc.create_public_variable(fab.share_scalars([v_val(witness_vals)]))
    mpc.enforce_equal(v, out)
    return plain, mpc, fab


@pytest.fixture(scope="module")
def setup():
    witness_vals = [3, 5, 7, 11]
    plain, mpc, fab = _build_circuits(witness_vals)
    plain.check_circuit_satisfiability(plain.public_input())
    mpc.check_circuit_satisfiability(mpc.public_input())
    plain.finalize_for_arithmetization()
    mpc.finalize_for_arithmetization()
    assert plain.eval_domain_size() == mpc.eval_domain_size()

    snark = PlonkKzgSnark(curve)
    srs = kzg.universal_setup_for_testing(curve, plain.srs_size(), seed=21)
    pk, vk = snark.preprocess(srs, plain)
    return plain, mpc, fab, snark, pk, vk


def test_collaborative_proof_verifies(setup):
    plain, mpc, fab, snark, pk, vk = setup
    mpc_snark = MultiproverPlonkKzgSnark(curve)
    n_open0 = fab.n_openings
    proof = mpc_snark.prove(fab, mpc, pk, mask=True)
    # n_openings counts COMMUNICATION ROUNDS (each may carry many values):
    # round-level batching (ark-mpc-executor style) keeps it
    # O(rounds + W + log n) — the grand product's Beaver chain contributes
    # W muls + a masked inversion + log2(n) cumprod levels, everything else
    # is one batched opening per prover round.
    import math
    budget = 16 + 2 * mpc.num_wire_types + 2 * int(
        math.log2(plain.eval_domain_size()))
    assert fab.n_openings - n_open0 <= budget, \
        f"too many opening rounds: {fab.n_openings - n_open0} > {budget}"
    snark.verify(vk, mpc.public_input(), proof)
    # wrong public input rejected
    bad = list(mpc.public_input())
    bad[0] = (bad[0] + 1) % spec.p
    with pytest.raises(WrongProof):
        snark.verify(vk, bad, proof)


def test_collaborative_matches_plaintext_unmasked(setup):
    plain, mpc, fab, snark, pk, vk = setup
    mpc_snark = MultiproverPlonkKzgSnark(curve)
    p1 = snark.prove(plain, pk, rng=random.Random(0), mask=False)
    p2 = mpc_snark.prove(fab, mpc, pk, mask=False)
    # identical witness + deterministic protocol => identical proofs
    assert p1.wires_poly_comms == p2.wires_poly_comms
    assert p1.prod_perm_poly_comm == p2.prod_perm_poly_comm
    assert p1.split_quot_poly_comms == p2.split_quot_poly_comms
    assert p1.poly_evals == p2.poly_evals
    assert p1.opening_proof == p2.opening_proof
    assert p1.shifted_opening_proof == p2.shifted_opening_proof
    snark.verify(vk, mpc.public_input(), p2)
