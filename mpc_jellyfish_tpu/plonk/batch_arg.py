"""BatchArgument: prove/verify many instances through circuit merging.

Mirror of `plonk/src/proof_system/batch_arg.rs:32-204`: type-A and type-B
circuits are merged pairwise (reversed gate order for B), proved once with
the multi-instance prover, and verified with a `partial_verify` (deferring
the pairing) + `decide` split so the expensive part can later run inside a
recursion circuit.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..curves import CurveSpec
from ..ops import field as F
from ..utils.ec_host import AffinePoint, ec_add, ec_mul, ec_neg
from .. import pairing as PR
from .snark import PlonkKzgSnark, PlonkError
from .structs import ProvingKey, VerifyingKey
from .verifier import ScalarsAndBases, Verifier


@dataclass
class Instance:
    """Prove key + finalized mergeable circuit (batch_arg.rs:40-57)."""
    prove_key: ProvingKey
    circuit: object
    circuit_type: str

    def verify_key_ref(self):
        return self.prove_key.vk


def merge_proving_keys(curve: CurveSpec, pk_a: ProvingKey,
                       pk_b: ProvingKey) -> ProvingKey:
    """Polynomial/commitment addition (structs.rs:638-676)."""
    spec = curve.fr
    if pk_a.domain_size() != pk_b.domain_size():
        raise PlonkError("mismatched domain size in pk merge")
    if pk_a.plookup_pk is not None or pk_b.plookup_pk is not None:
        raise PlonkError("cannot merge UltraPlonk keys")
    sigmas = [F.add(spec, a, b) for a, b in zip(pk_a.sigmas, pk_b.sigmas)]
    selectors = [F.add(spec, a, b)
                 for a, b in zip(pk_a.selectors, pk_b.selectors)]
    vk = merge_verifying_keys(curve, pk_a.vk, pk_b.vk)
    pk = ProvingKey(sigmas=sigmas, selectors=selectors,
                    commit_key=pk_a.commit_key, vk=vk, plookup_pk=None)
    pk.sigma_evals = [F.add(spec, a, b)
                      for a, b in zip(pk_a.sigma_evals, pk_b.sigma_evals)]
    pk.id_evals = pk_a.id_evals
    return pk


def merge_verifying_keys(curve: CurveSpec, vk_a: VerifyingKey,
                         vk_b: VerifyingKey) -> VerifyingKey:
    """Commitment addition (structs.rs:808-849)."""
    if vk_a.is_merged or vk_b.is_merged:
        raise PlonkError("cannot merge a merged key again")
    if vk_a.domain_size != vk_b.domain_size:
        raise PlonkError("mismatched domain size in vk merge")
    if vk_a.num_inputs != vk_b.num_inputs:
        raise PlonkError("mismatched num_inputs in vk merge")
    p = curve.fq.p
    return VerifyingKey(
        domain_size=vk_a.domain_size,
        num_inputs=vk_a.num_inputs + vk_b.num_inputs,
        sigma_comms=[ec_add(p, a, b)
                     for a, b in zip(vk_a.sigma_comms, vk_b.sigma_comms)],
        selector_comms=[ec_add(p, a, b)
                        for a, b in zip(vk_a.selector_comms, vk_b.selector_comms)],
        k=list(vk_a.k),
        open_key=vk_a.open_key,
        plookup_vk=None,
        is_merged=True,
    )


class BatchArgument:
    def __init__(self, curve: CurveSpec, transcript_cls=None):
        from .transcript import SolidityTranscript
        self.curve = curve
        self.snark = PlonkKzgSnark(
            curve, transcript_cls or SolidityTranscript)

    def setup_instance(self, srs, circuit, circuit_type: str) -> Instance:
        """batch_arg.rs:66-75."""
        circuit.finalize_for_mergeable_circuit(circuit_type)
        pk, _ = self.snark.preprocess(srs, circuit)
        return Instance(prove_key=pk, circuit=circuit,
                        circuit_type=circuit_type)

    def batch_prove(self, rng, instances_a: list, instances_b: list):
        """batch_arg.rs:77-110."""
        if len(instances_a) != len(instances_b):
            raise PlonkError("instance count mismatch")
        pks, circuits = [], []
        for ia, ib in zip(instances_a, instances_b):
            pks.append(merge_proving_keys(self.curve, ia.prove_key,
                                          ib.prove_key))
            circuits.append(ia.circuit.merge(ib.circuit))
        return self.snark.batch_prove(circuits, pks, rng=rng)

    def aggregate_verify_keys(self, vks_a: list, vks_b: list) -> list:
        return [merge_verifying_keys(self.curve, a, b)
                for a, b in zip(vks_a, vks_b)]

    def partial_verify(self, beta_g: AffinePoint, generator_g: AffinePoint,
                       merged_vks: list, shared_public_input: list,
                       batch_proof, blinding_factor: int):
        """Deferred-pairing verification (batch_arg.rs:112-172)."""
        curve = self.curve
        fq_p, fr_p = curve.fq.p, curve.fr.p
        verifier = Verifier(curve, merged_vks[0].domain_size,
                            self.snark.transcript_cls)
        shared = list(shared_public_input) + list(shared_public_input)
        pcs_info = verifier.prepare_pcs_info(
            merged_vks, [shared] * len(merged_vks), batch_proof, None)

        sb = ScalarsAndBases()
        sb.push(1, pcs_info.opening_proof)
        sb.push(pcs_info.u, pcs_info.shifted_opening_proof)
        sb.push(blinding_factor, generator_g)
        inner1 = sb.multi_scalar_mul(fq_p, fr_p)

        sb = pcs_info.comm_scalars_and_bases
        sb.push(pcs_info.eval_point, pcs_info.opening_proof)
        sb.push(pcs_info.next_eval_point * pcs_info.u % fr_p,
                pcs_info.shifted_opening_proof)
        sb.push((fr_p - pcs_info.eval) % fr_p, generator_g)
        sb.push(blinding_factor, beta_g)
        inner2 = sb.multi_scalar_mul(fq_p, fr_p)
        return inner1, inner2

    def decide(self, open_key, inner1: AffinePoint, inner2: AffinePoint) -> bool:
        """Final pairing check (batch_arg.rs:198-204)."""
        return PR.pairing_check(
            self.curve, [inner1, ec_neg(self.curve.fq.p, inner2)],
            [open_key.beta_h, open_key.h])
