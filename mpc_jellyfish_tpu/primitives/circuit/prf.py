"""In-circuit Rescue PRF (mirror of primitives/src/circuit/prf.rs:15-31).

eval_prf(key, input) = full-state keyed sponge with zero padding, matching
the native `RescuePRF`.
"""

from __future__ import annotations

from ...relation.circuit import PlonkCircuit
from .rescue import rescue_full_state_keyed_sponge_with_zero_padding


def eval_prf(cs: PlonkCircuit, key: int, input_vars) -> int:
    return rescue_full_state_keyed_sponge_with_zero_padding(cs, key,
                                                            input_vars)


PlonkCircuit.eval_prf = eval_prf
