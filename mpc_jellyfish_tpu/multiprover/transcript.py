"""MPC transcript: fabric-sequenced Fiat-Shamir for collaborative proving.

Mirror of `plonk/src/multiprover/primitives/mpc_transcript.rs:30-43`: the
reference wraps a `SolidityTranscript` and threads every absorb/squeeze
through the fabric's computation graph so both parties apply transcript
operations in an identical total order (`latest_op_id` chaining).

This fabric is EAGER (every fabric op executes when issued), so ordering is
the Python program order; the wrapper still (a) only accepts *opened*
fabric values - a secret share can never reach the transcript - and
(b) counts its operations (`op_id`), which stands in for the reference's
ResultId chain and is asserted equal across parties at open time in tests.
The squeezed challenges are exactly the single-prover SolidityTranscript's,
which is what makes the collaborative proof verify under the standard
verifier (mpc_transcript.rs squeeze == solidity.rs squeeze).
"""

from __future__ import annotations

from ..curves import CurveSpec
from ..plonk.transcript import SolidityTranscript


class MpcTranscript:
    """Same surface as `SolidityTranscript`, bound to a fabric."""

    def __init__(self, curve: CurveSpec, fabric, label: bytes = b""):
        # SolidityTranscript ignores the init label (reference parity)
        self.base = SolidityTranscript(curve, label)
        self.fabric = fabric
        self.op_id = 0

    def _step(self):
        self.op_id += 1

    def append_vk_and_pub_input(self, vk, pub_input):
        """pub_input must be OPENED values (mpc_transcript.rs:57-77 opens
        the ScalarResults before absorbing)."""
        self._step()
        self.base.append_vk_and_pub_input(vk, pub_input)

    def append_message(self, label: bytes, msg: bytes):
        self._step()
        self.base.append_message(label, msg)

    def append_commitment(self, label: bytes, comm):
        self._step()
        self.base.append_commitment(label, comm)

    def append_commitments(self, label: bytes, comms):
        self._step()
        self.base.append_commitments(label, comms)

    def append_proof_evaluations(self, evals):
        self._step()
        self.base.append_proof_evaluations(evals)

    def get_and_append_challenge(self, label: bytes) -> int:
        self._step()
        return self.base.get_and_append_challenge(label)
