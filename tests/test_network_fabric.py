"""Cross-process 2-party fabric vs the in-process MockFabric oracle.

VERDICT r1 item 7: a real transport behind the fabric API.  The online
phase (share openings, MAC checks, point openings) crosses a
multiprocessing pipe between two OS processes; with equal dealer seeds the
collaborative proof must be byte-identical to the MockFabric proof.
"""

import random

import pytest

from mpc_jellyfish_tpu.curves import BN254
from mpc_jellyfish_tpu.multiprover.fabric import MockFabric
from mpc_jellyfish_tpu.multiprover.net import execute_network_mpc

curve = BN254
spec = curve.fr

WITNESS = [3, 5, 7, 11]
SRS_SEED = 29


def _build_mpc_circuit(fab, vals):
    from mpc_jellyfish_tpu.multiprover.circuit import MpcPlonkCircuit
    cs = MpcPlonkCircuit(fab)
    a = [cs.create_variable(fab.share_scalars([v])) for v in vals]
    s = cs.mul(a[0], a[1])
    t = cs.add(s, a[2])
    u = cs.lc([a[0], a[1], a[2], a[3]], [1, 2, 3, 4])
    v = cs.mul(t, u)
    out = cs.create_public_variable(cs.witness_of(v))
    cs.enforce_equal(v, out)
    cs.finalize_for_arithmetization()
    return cs


def _proof_fingerprint(proof):
    """Canonical byte string over every proof field."""
    from mpc_jellyfish_tpu.utils import serialize as S
    parts = []
    for c in list(proof.wires_poly_comms) + [proof.prod_perm_poly_comm] + \
            list(proof.split_quot_poly_comms) + \
            [proof.opening_proof, proof.shifted_opening_proof]:
        parts.append(S.g1_to_bytes(curve, c))
    ev = proof.poly_evals
    for x in list(ev.wires_evals) + list(ev.wire_sigma_evals) + \
            [ev.perm_next_eval]:
        parts.append(S.field_to_bytes(spec, int(x)))
    return b"".join(parts).hex()


def _prove(fab, vals):
    from mpc_jellyfish_tpu.multiprover.snark import MultiproverPlonkKzgSnark
    from mpc_jellyfish_tpu.plonk.snark import PlonkKzgSnark
    from mpc_jellyfish_tpu.relation.circuit import PlonkCircuit
    from mpc_jellyfish_tpu.pcs import kzg
    cs = _build_mpc_circuit(fab, vals)
    # proving key from an identical-topology plaintext circuit
    pcs = PlonkCircuit(spec)
    a = [pcs.create_variable(v) for v in vals]
    s = pcs.mul(a[0], a[1])
    t = pcs.add(s, a[2])
    u = pcs.lc([a[0], a[1], a[2], a[3]], [1, 2, 3, 4])
    v = pcs.mul(t, u)
    out = pcs.create_public_variable(pcs.witness_of(v))
    pcs.enforce_equal(v, out)
    pcs.finalize_for_arithmetization()
    snark = PlonkKzgSnark(curve)
    srs = kzg.universal_setup_for_testing(curve, pcs.srs_size(),
                                          seed=SRS_SEED)
    pk, vk = snark.preprocess(srs, pcs)
    msnark = MultiproverPlonkKzgSnark(curve)
    proof = msnark.prove(fab, cs, pk, mask=False)
    snark.verify(vk, cs.public_input(), proof)
    return proof


def _network_party(party_id, transport, seed):
    """Runs in its own process: prove collaboratively over the transport."""
    from mpc_jellyfish_tpu.curves import BN254 as _BN254
    from mpc_jellyfish_tpu.multiprover.net import NetworkFabric
    fab = NetworkFabric(_BN254.fr, party_id, transport, seed=seed)
    proof = _prove(fab, WITNESS)
    return _proof_fingerprint(proof), fab.n_openings


def _ops_party(party_id, transport, seed):
    from mpc_jellyfish_tpu.curves import BN254 as _BN254
    from mpc_jellyfish_tpu.multiprover.net import NetworkFabric
    fab = NetworkFabric(_BN254.fr, party_id, transport, seed=seed)
    xs = [9, 12, 255]
    ys = [4, 8, 100]
    a = fab.share_scalars(xs)
    b = fab.share_scalars(ys)
    got_mul = fab.open_to_ints(fab.mul(a, b))
    fab.begin_deferred_checks()
    got_add = fab.open_to_ints(fab.add(a, b))
    got_inv = fab.open_to_ints(fab.inv(a))
    fab.verify_deferred_checks()
    return got_mul, got_add, got_inv


def test_network_fabric_ops_match_mock():
    """Primitive ops across the pipe equal the mock (sums of slices)."""
    r0, r1 = execute_network_mpc(_ops_party, seed=3)
    assert r0 == r1
    p = spec.p
    assert r0[0] == [9 * 4 % p, 12 * 8, 255 * 100]
    assert r0[1] == [13, 20, 355]
    assert r0[2] == [pow(x, -1, p) for x in (9, 12, 255)]


def test_network_proof_bit_equal_to_mock():
    """2-process collaborative proof == in-process MockFabric proof."""
    fp0, fp1 = execute_network_mpc(_network_party, seed=11)
    assert fp0[0] == fp1[0]
    assert fp0[1] > 0  # openings actually crossed the transport

    fab = MockFabric(spec, seed=11)
    mock_proof = _prove(fab, WITNESS)
    assert _proof_fingerprint(mock_proof) == fp0[0]
