"""Stable test-facing wrappers over verifier internals.

Mirror of the reference's `test_apis`-feature module
(`plonk/src/testing_apis.rs:1-50+`), which re-exposes `Challenges`,
`PcsInfo`, `ScalarsAndBases` and the `Verifier` sub-steps
(`prepare_pcs_info`, `compute_challenges`,
`compute_lin_poly_constant_term`, `aggregate_poly_commitments`,
`linearization_scalars_and_bases`, `aggregate_evaluations`) so ecosystem
tests (notably the recursive-verifier gadget tests) can cross-check
in-circuit computations against the native verifier step by step.

Python has no crate-visibility barrier, so these are direct re-exports;
this module exists to make the supported test surface explicit and
stable — downstream tests should import from here, not from
`plonk.verifier` internals.
"""

from __future__ import annotations

from .structs import BatchProof, Challenges, Proof, ProofEvaluations
from .verifier import PcsInfo, ScalarsAndBases, Verifier

__all__ = [
    "BatchProof",
    "Challenges",
    "PcsInfo",
    "Proof",
    "ProofEvaluations",
    "ScalarsAndBases",
    "Verifier",
    "prepare_pcs_info",
    "compute_challenges",
]


def compute_challenges(curve, domain_size, vks, public_inputs, batch_proof,
                       extra_transcript_init_msg=None, **kw):
    """One-call challenge recomputation (testing_apis.rs `compute_challenges`)."""
    return Verifier(curve, domain_size, **kw).compute_challenges(
        vks, public_inputs, batch_proof, extra_transcript_init_msg)


def prepare_pcs_info(curve, domain_size, vks, public_inputs, batch_proof,
                     extra_transcript_init_msg=None, **kw):
    """One-call PCS-info preparation (testing_apis.rs `prepare_pcs_info`)."""
    return Verifier(curve, domain_size, **kw).prepare_pcs_info(
        vks, public_inputs, batch_proof, extra_transcript_init_msg)
