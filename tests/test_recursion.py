"""Recursive verifier circuit: replay BatchArgument::partial_verify in-circuit.

Mirror of `plonk/src/circuit/plonk_verifier/mod.rs` tests
(`test_partial_verification_circuit`, `test_aggregate_vks`) and
`circuit/transcript.rs::test_rescue_transcript_challenge_circuit`, over
BLS12-377 with the Rescue transcript.
"""

import random

import pytest

from mpc_jellyfish_tpu.curves import BLS12_377
from mpc_jellyfish_tpu.relation.circuit import PlonkCircuit
import mpc_jellyfish_tpu.relation.gadgets  # noqa: F401
import mpc_jellyfish_tpu.primitives.circuit  # noqa: F401
from mpc_jellyfish_tpu.relation.gadgets.mod_arith import FpElemVar
from mpc_jellyfish_tpu.relation.gadgets.ecc import point_witness
from mpc_jellyfish_tpu.plonk.batch_arg import BatchArgument
from mpc_jellyfish_tpu.plonk.transcript import RescueTranscript
from mpc_jellyfish_tpu.plonk import circuit as RC
from mpc_jellyfish_tpu.plonk.circuit.structs import _te_point
from mpc_jellyfish_tpu.pcs import kzg
from mpc_jellyfish_tpu.ops import ec as E

curve = BLS12_377
FR = curve.fr
FQ = curve.fq
rng = random.Random(37)

RANGE_BIT_LEN = 16


def mergeable_circuit(shared_input: int, flag: bool) -> PlonkCircuit:
    cs = PlonkCircuit(FR)
    shared = cs.create_public_variable(shared_input)
    cur = shared
    for _ in range(4):
        cur = cs.mul(cur, cur) if flag else cs.mul(cur, shared)
    return cs


@pytest.fixture(scope="module")
def setup():
    shared_input = rng.randrange(FR.p)
    ba = BatchArgument(curve, transcript_cls=RescueTranscript)
    srs = kzg.universal_setup_for_testing(curve, 64, seed=5)
    insts_a, insts_b = [], []
    for _ in range(2):
        insts_a.append(ba.setup_instance(
            srs, mergeable_circuit(shared_input, True), "A"))
        insts_b.append(ba.setup_instance(
            srs, mergeable_circuit(shared_input, False), "B"))
    batch_proof = ba.batch_prove(random.Random(3), insts_a, insts_b)
    merged_vks = ba.aggregate_verify_keys(
        [i.verify_key_ref() for i in insts_a],
        [i.verify_key_ref() for i in insts_b])
    beta_g = E.affine_from_device(FQ, tuple(
        t[..., 1:2] for t in srs.powers_of_g))[0]
    gen_g = E.affine_from_device(FQ, tuple(
        t[..., :1] for t in srs.powers_of_g))[0]
    open_key = insts_a[0].verify_key_ref().open_key
    return (shared_input, ba, batch_proof, merged_vks, beta_g, gen_g,
            open_key)


def test_native_partial_verify_decide(setup):
    (shared_input, ba, batch_proof, merged_vks, beta_g, gen_g,
     open_key) = setup
    blinding = rng.randrange(FR.p)
    inner1, inner2 = ba.partial_verify(beta_g, gen_g, merged_vks,
                                       [shared_input], batch_proof, blinding)
    assert ba.decide(open_key, inner1, inner2)


def test_partial_verify_circuit_matches_native(setup):
    (shared_input, ba, batch_proof, merged_vks, beta_g, gen_g,
     open_key) = setup
    blinding = rng.randrange(FR.p)
    inner1, inner2 = ba.partial_verify(beta_g, gen_g, merged_vks,
                                       [shared_input], batch_proof, blinding)
    assert ba.decide(open_key, inner1, inner2)

    cs = PlonkCircuit(FQ, ultra_plonk=True, range_bit_len=RANGE_BIT_LEN)
    info = RC.NonNativeFieldInfo.new(cs, FR.p)
    shared_var = cs.create_public_variable(shared_input % FQ.p)
    shared_fp = FpElemVar.new_unchecked(cs, shared_var, info.m)
    vk_vars = [RC.VerifyingKeyVar.new(cs, vk) for vk in merged_vks]
    proof_var = RC.create_batch_proof_variables(cs, batch_proof, info.m)
    blinding_var = cs.create_variable(blinding % FQ.p)
    p1, p2 = RC.partial_verify_circuit(cs, curve, beta_g, gen_g, vk_vars,
                                       [shared_fp], proof_var, blinding_var)
    assert point_witness(cs, p1) == _te_point(inner1)
    assert point_witness(cs, p2) == _te_point(inner2)
    cs.check_circuit_satisfiability(cs.public_input())

    # wrong witness -> unsatisfiable
    old = cs.witness[p1.x]
    cs.witness[p1.x] = (old + 1) % FQ.p
    try:
        cs.check_circuit_satisfiability(cs.public_input())
        assert False, "corrupted recursion circuit accepted"
    except Exception:
        pass
    cs.witness[p1.x] = old


def test_aggregate_verify_keys_circuit(setup):
    (shared_input, ba, batch_proof, merged_vks, beta_g, gen_g,
     open_key) = setup
    # rebuild unmerged vks and merge in-circuit; compare against native
    srs = kzg.universal_setup_for_testing(curve, 64, seed=5)
    insts_a, insts_b = [], []
    for _ in range(2):
        insts_a.append(ba.setup_instance(
            srs, mergeable_circuit(shared_input, True), "A"))
        insts_b.append(ba.setup_instance(
            srs, mergeable_circuit(shared_input, False), "B"))
    cs = PlonkCircuit(FQ, ultra_plonk=True, range_bit_len=RANGE_BIT_LEN)
    a_vars = [RC.VerifyingKeyVar.new(cs, i.verify_key_ref())
              for i in insts_a]
    b_vars = [RC.VerifyingKeyVar.new(cs, i.verify_key_ref())
              for i in insts_b]
    merged_vars = RC.aggregate_verify_keys(cs, a_vars, b_vars)
    for mv, vk in zip(merged_vars, merged_vks):
        for comm_var, comm in zip(mv.sigma_comms, vk.sigma_comms):
            assert point_witness(cs, comm_var) == _te_point(comm)
        for comm_var, comm in zip(mv.selector_comms, vk.selector_comms):
            assert point_witness(cs, comm_var) == _te_point(comm)
    cs.check_circuit_satisfiability([])
