"""In-circuit Rescue commitment (mirror of primitives/src/circuit/commitment.rs:19-40).

commit(input, blinding) = sponge_no_padding([blinding] + input + zero-pad, 1),
matching the native `FixedLengthRescueCommitment`.
"""

from __future__ import annotations

from ...relation.circuit import PlonkCircuit
from ..rescue import CRHF_RATE
from .rescue import rescue_sponge_no_padding


def commit_gadget(cs: PlonkCircuit, input_vars, blinding: int) -> int:
    msg = [blinding] + list(input_vars)
    msg += [cs.zero()] * ((-len(msg)) % CRHF_RATE)
    return rescue_sponge_no_padding(cs, msg, 1)[0]


PlonkCircuit.commit_gadget = commit_gadget
