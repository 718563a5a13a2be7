"""In-circuit Rescue transcript.

Mirror of `plonk/src/circuit/transcript.rs:31-220` (`RescueTranscriptVar`):
the same state/transcript structure as the native `RescueTranscript`, with
the challenge squeeze = in-circuit Rescue sponge + 248-bit truncation.
Requires an UltraPlonk circuit (truncate needs the range table) over a
253-bit-scalar/377-bit-base curve (BLS12-377).
"""

from __future__ import annotations

from ...primitives.circuit.rescue import rescue_sponge_with_padding
from ...primitives.rescue import STATE_SIZE
from ...relation.circuit import CircuitError, PlonkCircuit
from ...relation.gadgets.arith import truncate
from ...relation.gadgets.ecc import PointVariable


class RescueTranscriptVar:
    """transcript.rs:31-47."""

    def __init__(self, cs: PlonkCircuit):
        self.transcript_var: list = []
        self.state_var = [cs.zero()] * STATE_SIZE

    def append_vk_and_pub_input_vars(self, cs: PlonkCircuit, vk_var,
                                     pub_input_vars):
        """transcript.rs:51-83: selector comms (TE coords), sigma comms,
        public-input FpElemVars."""
        for com in vk_var.selector_comms:
            self.transcript_var.extend([com.x, com.y])
        for com in vk_var.sigma_comms:
            self.transcript_var.extend([com.x, com.y])
        for e in pub_input_vars:
            self.transcript_var.append(e.convert_to_var(cs))

    def append_variable(self, label: bytes, var: int):
        self.transcript_var.append(var)

    def append_message_vars(self, label: bytes, msg_vars):
        self.transcript_var.extend(msg_vars)

    def append_commitment_var(self, label: bytes, comm: PointVariable):
        self.transcript_var.extend([comm.x, comm.y])

    def append_commitments_vars(self, label: bytes, comms):
        for c in comms:
            self.append_commitment_var(label, c)

    def append_challenge_var(self, label: bytes, challenge_var: int):
        self.append_variable(label, challenge_var)

    def append_proof_evaluations_vars(self, cs: PlonkCircuit, evals):
        """transcript.rs:155-171 (ProofEvaluationsVar of FpElemVars)."""
        for e in evals.wires_evals:
            self.transcript_var.append(e.convert_to_var(cs))
        for e in evals.wire_sigma_evals:
            self.transcript_var.append(e.convert_to_var(cs))
        self.transcript_var.append(evals.perm_next_eval.convert_to_var(cs))

    def get_and_append_challenge_var(self, cs: PlonkCircuit,
                                     label: bytes = b"") -> int:
        """transcript.rs:176-220: state = sponge(state ++ transcript),
        challenge = truncate(state[0], 248)."""
        if not cs.support_lookup():
            raise CircuitError("rescue transcript var needs UltraPlonk")
        input_vars = list(self.state_var) + list(self.transcript_var)
        res = rescue_sponge_with_padding(cs, input_vars, STATE_SIZE)
        challenge_var = truncate(cs, res[0], 248)
        self.state_var = list(res[:STATE_SIZE])
        self.transcript_var = []
        self.append_challenge_var(label, challenge_var)
        return challenge_var
