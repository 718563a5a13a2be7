"""Proof-linking sub-protocol: prove two proofs share a witness sub-vector.

Mirror of `plonk/src/proof_system/proof_linking.rs:80-305`:
  q(X)  = (a1(X) - a2(X)) / Z_D(X)  on the link-group subdomain D,
  eta   = H(a1_comm, a2_comm, q_comm),
  open  (a1 - a2 - q * Z_D(eta)) at eta (value 0, KZG).
The verifier reconstructs the identity commitment homomorphically and runs a
single KZG opening check.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..curves import CurveSpec
from ..ops import field as F
from ..ops import poly as P
from ..pcs import kzg
from ..relation.proof_linking import GroupLayout, PROOF_LINK_WIRE_IDX
from ..utils.ec_host import AffinePoint, ec_add, ec_mul, ec_neg
from .structs import LinkingHint, Proof
from .transcript import SolidityTranscript


@dataclass
class LinkingProof:
    """Reference proof_linking.rs:33-39."""
    quotient_commitment: AffinePoint
    opening_proof: AffinePoint


def _group_roots(spec, layout: GroupLayout):
    """Roots g^offset, ..., g^(offset+size-1) of the linking domain."""
    g = layout.domain_generator(spec)
    r = pow(g, layout.offset, spec.p)
    roots = []
    for _ in range(layout.size):
        roots.append(r)
        r = r * g % spec.p
    return roots


def _vanishing_eval(spec, layout: GroupLayout, x: int) -> int:
    e = 1
    for r in _group_roots(spec, layout):
        e = e * (x - r) % spec.p
    return e


def _quotient_challenge(curve, a1_comm, a2_comm, quotient_comm) -> int:
    t = SolidityTranscript(curve, b"PlonkLinkingProof")
    t.append_commitments(b"linking_wire_comms", [a1_comm, a2_comm])
    t.append_commitment(b"quotient_comm", quotient_comm)
    return t.get_and_append_challenge(b"eta")


def link_proofs(curve: CurveSpec, lhs_hint: LinkingHint, rhs_hint: LinkingHint,
                layout: GroupLayout, commit_key) -> LinkingProof:
    """Reference proof_linking.rs:80-117."""
    spec = curve.fr
    a1 = lhs_hint.linking_wire_poly
    a2 = rhs_hint.linking_wire_poly
    diff = F.sub(spec, a1, a2)

    # q = diff / Z_D via successive synthetic divisions by (X - root)
    q = diff
    for root in _group_roots(spec, layout):
        q, _ = P.divide_by_linear(spec, q, spec.to_device([root])[:, 0])
    quotient_comm = kzg.commit(commit_key, q)

    eta = _quotient_challenge(curve, lhs_hint.linking_wire_comm,
                              rhs_hint.linking_wire_comm, quotient_comm)

    # identity = diff - q * Z_D(eta); open at eta (evaluates to 0)
    zd_eta = _vanishing_eval(spec, layout, eta)
    identity = F.sub(spec, diff,
                     F.mul(spec, q, spec.to_device([zd_eta])))
    witness, _ = P.divide_by_linear(spec, identity,
                                    spec.to_device([eta])[:, 0])
    opening_proof = kzg.commit(commit_key, witness)
    return LinkingProof(quotient_commitment=quotient_comm,
                        opening_proof=opening_proof)


def verify_link_proof(curve: CurveSpec, proof1: Proof, proof2: Proof,
                      link_proof: LinkingProof, layout: GroupLayout,
                      open_key) -> bool:
    """Reference proof_linking.rs:240-305."""
    spec = curve.fr
    p = curve.fq.p
    a1_comm = proof1.wires_poly_comms[PROOF_LINK_WIRE_IDX]
    a2_comm = proof2.wires_poly_comms[PROOF_LINK_WIRE_IDX]
    eta = _quotient_challenge(curve, a1_comm, a2_comm,
                              link_proof.quotient_commitment)
    zd_eta = _vanishing_eval(spec, layout, eta)
    identity_comm = ec_add(
        p, a1_comm,
        ec_add(p, ec_neg(p, a2_comm),
               ec_neg(p, ec_mul(p, link_proof.quotient_commitment, zd_eta))))
    return kzg.verify_open(open_key, identity_comm, eta, 0,
                           link_proof.opening_proof)
