"""Recursive-verifier circuit layer.

Mirror of the reference `plonk/src/circuit/` subsystem: the Plonk verifier
replayed inside a (larger) Plonk circuit — `RescueTranscriptVar` for
in-circuit Fiat-Shamir, non-native (FpElemVar) polynomial evaluations, and
`partial_verify_circuit` which reduces a batch of proofs to two deferred
pairing inputs.  Runs over the inner curve's BASE field (BLS12-377's Fq),
whose G1 has a twisted-Edwards form for the in-circuit MSM.
"""

from .transcript import RescueTranscriptVar                      # noqa: F401
from .structs import (BatchProofVar, NonNativeFieldInfo,         # noqa: F401
                      create_batch_proof_variables)
from .plonk_verifier import (VerifyingKeyVar,                    # noqa: F401
                             aggregate_verify_keys,
                             partial_verify_circuit)
