"""Collaborative (MPC) proof linking.

Mirror of `plonk/src/multiprover/proof_system/proof_linking.rs:41-229`:
two collaborative proofs are linked on a shared witness sub-vector by

    q(X)   = (a1(X) - a2(X)) / Z_D(X)         (shared quotient)
    eta    = H(a1_comm, a2_comm, q_comm)       (public challenge)
    open   a1 - a2 - q * Z_D(eta)  at eta      (shared opening)

Every polynomial operation here is LINEAR with public coefficients
(synthetic division by public roots, scaling by Z_D(eta)), so the whole
link prover is network-free except for the two authenticated-MSM
commitment openings - exactly the structure of the reference's lazy-graph
version.  The opened proof is a standard single-prover `LinkingProof`
accepted by `plonk.proof_linking.verify_link_proof`
(proof_linking.rs:100-123 `link_proofs`).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..curves import CurveSpec
from ..ops import poly as P
from ..plonk.proof_linking import (LinkingProof, _quotient_challenge,
                                   _group_roots, _vanishing_eval)
from ..relation.proof_linking import GroupLayout
from ..utils.ec_host import AffinePoint
from .fabric import MockFabric, Shared
from .prover import commit_shared


@dataclass
class MpcLinkingHint:
    """Reference multiprover structs `MpcLinkingHint`: the (still shared)
    linking wire polynomial plus its opened commitment."""
    linking_wire_poly: Shared
    linking_wire_comm: AffinePoint


def link_proofs(curve: CurveSpec, fabric: MockFabric,
                lhs_hint: MpcLinkingHint, rhs_hint: MpcLinkingHint,
                layout: GroupLayout, commit_key) -> LinkingProof:
    """Reference proof_linking.rs:100-123 (`link_proofs`).

    Returns the already-opened single-prover `LinkingProof` (the reference's
    `MultiproverLinkingProof::open_authenticated` resolution,
    proof_linking.rs:50-56).
    """
    spec = curve.fr
    a1 = lhs_hint.linking_wire_poly
    a2 = rhs_hint.linking_wire_poly
    diff = fabric.sub(a1, a2)

    # q = (a1 - a2) / Z_D: successive synthetic division by (X - root) is
    # linear in the coefficients, hence share-local (compute_linking_quotient,
    # proof_linking.rs:131-141).
    roots = _group_roots(spec, layout)
    q = diff
    for root in roots:
        root_dev = spec.to_device([root])[:, 0]
        q = fabric.map_local_b(
            lambda x, r=root_dev: P.divide_by_linear(spec, x, r)[0], q)
    quotient_comm = commit_shared(fabric, commit_key, q)

    # eta from the same keccak transcript as the single prover, so the
    # opened proof verifies under verify_link_proof
    # (compute_quotient_challenge, proof_linking.rs:190-205; the reference's
    # SolidityTranscript ignores init labels, so Mpc/single labels coincide).
    eta = _quotient_challenge(curve, lhs_hint.linking_wire_comm,
                              rhs_hint.linking_wire_comm, quotient_comm)

    # identity = diff - q * Z_D(eta); opening witness = identity / (X - eta)
    # (compute_identity_opening, proof_linking.rs:212-229).
    zd_eta = _vanishing_eval(spec, layout, eta)
    identity = fabric.sub(diff, fabric.mul_public(
        q, spec.to_device([zd_eta])))
    eta_dev = spec.to_device([eta])[:, 0]
    witness = fabric.map_local_b(
        lambda x: P.divide_by_linear(spec, x, eta_dev)[0], identity)
    opening_proof = commit_shared(fabric, commit_key, witness)
    return LinkingProof(quotient_commitment=quotient_comm,
                        opening_proof=opening_proof)
