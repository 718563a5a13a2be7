"""Building-block circuits for the recursive Plonk verifier.

Mirror of `plonk/src/circuit/plonk_verifier/gadgets.rs:31-570`.
"""

from __future__ import annotations

from ...relation.circuit import CircuitError, PlonkCircuit
from ...relation.gadgets.mod_arith import FpElem, FpElemVar
from ...utils.conversion import bytes_to_field_elements
from . import poly
from .structs import (BatchProofVar, ChallengesFpElemVar, ChallengesVar,
                      NonNativeFieldInfo, PcsInfoVar, ScalarsAndBasesVar,
                      challenge_var_to_fp_elem_var)
from .transcript import RescueTranscriptVar


def compute_challenges_vars(cs: PlonkCircuit, vks, public_inputs,
                            batch_proof: BatchProofVar,
                            extra_transcript_init_msg,
                            info: NonNativeFieldInfo) -> ChallengesFpElemVar:
    """gadgets.rs:183-244: replay the Rescue transcript in-circuit."""
    if not (len(vks) == len(batch_proof) == len(public_inputs)):
        raise CircuitError("inconsistent recursion verify inputs")
    t = RescueTranscriptVar(cs)
    if extra_transcript_init_msg is not None:
        msg_fs = bytes_to_field_elements(cs.p, extra_transcript_init_msg)
        t.append_message_vars(b"extra",
                              [cs.create_variable(v) for v in msg_fs])
    for vk, pi in zip(vks, public_inputs):
        t.append_vk_and_pub_input_vars(cs, vk, pi)
    for comms in batch_proof.wires_poly_comms_vec:
        t.append_commitments_vars(b"witness_poly_comms", comms)
    tau = t.get_and_append_challenge_var(cs, b"tau")
    beta = t.get_and_append_challenge_var(cs, b"beta")
    gamma = t.get_and_append_challenge_var(cs, b"gamma")
    for comm in batch_proof.prod_perm_poly_comms_vec:
        t.append_commitment_var(b"perm_poly_comms", comm)
    alpha = t.get_and_append_challenge_var(cs, b"alpha")
    t.append_commitments_vars(b"quot_poly_comms",
                              batch_proof.split_quot_poly_comms)
    zeta = t.get_and_append_challenge_var(cs, b"zeta")
    for poly_evals in batch_proof.poly_evals_vec:
        t.append_proof_evaluations_vars(cs, poly_evals)
    v = t.get_and_append_challenge_var(cs, b"v")
    t.append_commitment_var(b"open_proof", batch_proof.opening_proof)
    t.append_commitment_var(b"shifted_open_proof",
                            batch_proof.shifted_opening_proof)
    u = t.get_and_append_challenge_var(cs, b"u")
    ch = ChallengesVar(tau=tau, alpha=alpha, beta=beta, gamma=gamma,
                       zeta=zeta, v=v, u=u)
    return challenge_var_to_fp_elem_var(cs, ch, info)


def _add_poly_comm(cs, sb: ScalarsAndBasesVar, random_combiner, comm, r,
                   modulus_fp):
    """gadgets.rs:424-439."""
    sb.scalars.append(random_combiner[0])
    sb.bases.append(comm)
    random_combiner[0] = cs.mod_mul(random_combiner[0], r, modulus_fp)


def _add_pcs_eval(cs, result, random_combiner, eval_fp, modulus_fp):
    """gadgets.rs:442-457."""
    tmp = cs.mod_mul(random_combiner, eval_fp, modulus_fp)
    return cs.mod_add(result, tmp, modulus_fp)


def compute_alpha_basis(cs: PlonkCircuit, alpha_to_3: FpElemVar, count: int,
                        info: NonNativeFieldInfo):
    """gadgets.rs:460-480: [1, alpha^3, alpha^6, ...]."""
    res = [FpElemVar.one(cs, info.m)]
    for _ in range(count - 1):
        res.append(cs.mod_mul(res[-1], alpha_to_3, info.modulus_fp_elem))
    return res


def aggregate_poly_commitments_circuit(cs: PlonkCircuit, fr: int, vks,
                                       challenges: ChallengesFpElemVar,
                                       poly_evals, batch_proof,
                                       alpha_bases,
                                       info: NonNativeFieldInfo):
    """gadgets.rs:44-127: the `[D]1 + v-combined [E]1 bases` accumulator.
    Returns (ScalarsAndBasesVar, v_and_uv_basis buffer)."""
    if len(vks) != len(batch_proof):
        raise CircuitError("vks/instances mismatch")
    sb = poly.linearization_scalars_and_bases_circuit(
        cs, fr, vks, challenges, poly_evals, batch_proof, alpha_bases, info)
    v_base = [challenges.v]
    uv_base = [challenges.u]
    v_and_uv_basis = []
    for i, vk in enumerate(vks):
        for comm in batch_proof.wires_poly_comms_vec[i]:
            v_and_uv_basis.append(v_base[0])
            _add_poly_comm(cs, sb, v_base, comm, challenges.v,
                           info.modulus_fp_elem)
        num_wire_types = len(batch_proof.wires_poly_comms_vec[i])
        for comm in vk.sigma_comms[:num_wire_types - 1]:
            v_and_uv_basis.append(v_base[0])
            _add_poly_comm(cs, sb, v_base, comm, challenges.v,
                           info.modulus_fp_elem)
        v_and_uv_basis.append(uv_base[0])
        _add_poly_comm(cs, sb, uv_base,
                       batch_proof.prod_perm_poly_comms_vec[i],
                       challenges.v, info.modulus_fp_elem)
    return sb, v_and_uv_basis


def aggregate_evaluations_circuit(cs: PlonkCircuit, lin_poly_constant,
                                  poly_evals_vec, info: NonNativeFieldInfo,
                                  v_and_uv_basis):
    """gadgets.rs:130-180: the aggregated evaluation scalar."""
    result = cs.mod_negate(lin_poly_constant, info.modulus_in_f)
    it = iter(v_and_uv_basis)
    for poly_evals in poly_evals_vec:
        for wire_eval in poly_evals.wires_evals:
            result = _add_pcs_eval(cs, result, next(it), wire_eval,
                                   info.modulus_fp_elem)
        for sigma_eval in poly_evals.wire_sigma_evals:
            result = _add_pcs_eval(cs, result, next(it), sigma_eval,
                                   info.modulus_fp_elem)
        result = _add_pcs_eval(cs, result, next(it),
                               poly_evals.perm_next_eval,
                               info.modulus_fp_elem)
    for _ in it:
        raise CircuitError("v/uv basis buffer not fully consumed")
    return result


def prepare_pcs_info_var(cs: PlonkCircuit, fr: int, vks, public_inputs,
                         batch_proof: BatchProofVar,
                         extra_transcript_init_msg, domain,
                         info: NonNativeFieldInfo) -> PcsInfoVar:
    """gadgets.rs:247-370."""
    for pi, vk in zip(public_inputs, vks):
        if len(pi) != vk.num_inputs:
            raise CircuitError("public input length mismatch")
        if vk.domain_size != domain.n:
            raise CircuitError("domain size mismatch")

    challenges = compute_challenges_vars(cs, vks, public_inputs, batch_proof,
                                         extra_transcript_init_msg, info)
    alpha_bases = compute_alpha_basis(cs, challenges.alphas[2], len(vks),
                                      info)
    evals = poly.evaluate_poly_helper(cs, fr, challenges.zeta, domain.n,
                                      info)
    lin_poly_constant = poly.compute_lin_poly_constant_term_circuit(
        cs, fr, domain, challenges, vks, public_inputs, batch_proof, evals,
        alpha_bases, info)
    sb, v_and_uv_basis = aggregate_poly_commitments_circuit(
        cs, fr, vks, challenges, evals, batch_proof, alpha_bases, info)
    eval_agg = aggregate_evaluations_circuit(
        cs, lin_poly_constant, batch_proof.poly_evals_vec, info,
        v_and_uv_basis)
    group_gen_fp = FpElem.new(domain.w % cs.p, info.m, cs.p.bit_length())
    next_point = cs.mod_mul_constant(challenges.zeta, group_gen_fp,
                                     info.modulus_fp_elem)
    return PcsInfoVar(
        u=challenges.u, eval_point=challenges.zeta,
        next_eval_point=next_point, eval=eval_agg,
        comm_scalars_and_bases=sb,
        opening_proof=batch_proof.opening_proof,
        shifted_opening_proof=batch_proof.shifted_opening_proof)
