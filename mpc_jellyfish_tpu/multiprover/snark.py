"""MultiproverPlonkKzgSnark: collaborative proving entry point.

Mirror of `plonk/src/multiprover/proof_system/snark.rs`: same 5-round
schedule as the single prover, with every commitment opened (and
MAC-checked) before transcript absorption so both parties derive identical
challenges; the output is a standard `Proof` accepted by the single-prover
verifier (structs.rs `CollaborativeProof` resolution).
"""

from __future__ import annotations

from ..curves import CurveSpec
from ..plonk.structs import Challenges, Proof
from ..plonk.transcript import SolidityTranscript, EXTRA_TRANSCRIPT_MSG_LABEL
from .circuit import MpcPlonkCircuit
from .fabric import MockFabric
from .prover import MpcProver


class MultiproverPlonkKzgSnark:
    def __init__(self, curve: CurveSpec):
        self.curve = curve
        self.spec = curve.fr

    def prove(self, fabric: MockFabric, circuit: MpcPlonkCircuit, pk,
              mask: bool = True,
              extra_transcript_init_msg: bytes | None = None) -> Proof:
        proof, _, _ = self._prove_internal(
            fabric, circuit, pk, mask, extra_transcript_init_msg)
        return proof

    def prove_with_link_hint(self, fabric: MockFabric,
                             circuit: MpcPlonkCircuit, pk,
                             mask: bool = True):
        """Reference multiprover snark.rs `prove_with_link_hint`: also return
        the shared linking-wire polynomial + opened commitment."""
        from ..relation.proof_linking import PROOF_LINK_WIRE_IDX
        from .proof_linking import MpcLinkingHint
        proof, wire_polys, wire_comms = self._prove_internal(
            fabric, circuit, pk, mask, None)
        hint = MpcLinkingHint(
            linking_wire_poly=wire_polys[PROOF_LINK_WIRE_IDX],
            linking_wire_comm=wire_comms[PROOF_LINK_WIRE_IDX])
        return proof, hint

    def _prove_internal(self, fabric: MockFabric, circuit: MpcPlonkCircuit,
                        pk, mask: bool = True,
                        extra_transcript_init_msg: bytes | None = None):
        spec = self.spec
        n = circuit.eval_domain_size()
        W = circuit.num_wire_types
        prover = MpcProver(fabric, spec, n, W)

        # defer MAC checks to one RLC-batched end-of-proof check (ark-mpc
        # executor semantics, SURVEY §2.7): no per-round device->host sync
        deferred = hasattr(fabric, "begin_deferred_checks")
        if deferred:
            fabric.begin_deferred_checks()

        # open public inputs first (snark.rs:82: NETWORK)
        pub_input = circuit.public_input()

        from .transcript import MpcTranscript
        transcript = MpcTranscript(self.curve, fabric)
        if extra_transcript_init_msg is not None:
            transcript.append_message(EXTRA_TRANSCRIPT_MSG_LABEL,
                                      extra_transcript_init_msg)
        transcript.append_vk_and_pub_input(pk.vk, pub_input)
        challenges = Challenges()

        # Round 1
        wire_shares = circuit.wire_values_shared()
        wire_comms, wire_polys = prover.wire_polys_round(
            pk.commit_key, wire_shares, mask)
        transcript.append_commitments(b"witness_poly_comms", wire_comms)
        # public-input polynomial is public after opening
        pi_vec = [0] * n
        for i, gid in enumerate(circuit.pub_input_gate_ids):
            pi_vec[gid] = pub_input[i]
        from ..ops import ntt as N
        pi_poly = N.intt(prover.base.domain, spec.to_device(pi_vec))

        # Round 1.5 (tau squeezed for transcript consistency, snark.rs:104)
        challenges.tau = transcript.get_and_append_challenge(b"tau")

        # Round 2
        challenges.beta = transcript.get_and_append_challenge(b"beta")
        challenges.gamma = transcript.get_and_append_challenge(b"gamma")
        z_comm, z_poly = prover.grand_product_round(
            pk.commit_key, wire_shares, pk.id_evals, pk.sigma_evals,
            challenges.beta, challenges.gamma, mask)
        transcript.append_commitment(b"perm_poly_comms", z_comm)

        # Round 3
        challenges.alpha = transcript.get_and_append_challenge(b"alpha")
        quot_comms, quot_polys = prover.quotient_round(
            pk.commit_key, pk, challenges, wire_polys, z_poly, pi_poly,
            mask, None)
        transcript.append_commitments(b"quot_poly_comms", quot_comms)

        # Round 4
        challenges.zeta = transcript.get_and_append_challenge(b"zeta")
        poly_evals = prover.evaluations_round(pk, challenges, wire_polys, z_poly)
        transcript.append_proof_evaluations(poly_evals)

        # Round 5
        challenges.v = transcript.get_and_append_challenge(b"v")
        opening, shifted = prover.opening_round(
            pk.commit_key, pk, challenges, wire_polys, z_poly, quot_polys,
            poly_evals)

        if deferred:
            fabric.verify_deferred_checks()

        proof = Proof(
            wires_poly_comms=wire_comms,
            prod_perm_poly_comm=z_comm,
            split_quot_poly_comms=quot_comms,
            opening_proof=opening,
            shifted_opening_proof=shifted,
            poly_evals=poly_evals,
            plookup_proof=None,
        )
        return proof, wire_polys, wire_comms
