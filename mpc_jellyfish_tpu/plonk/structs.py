"""Proof-system data structures.

Mirror of `plonk/src/proof_system/structs.rs:62-891`: Proof, BatchProof,
ProofEvaluations, Plookup variants, ProvingKey/VerifyingKey, Challenges.
Commitments and evaluations live on the host (ints / AffinePoints);
polynomials live on the device as Montgomery limb tensors.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from ..utils.ec_host import AffinePoint


@dataclass
class ProofEvaluations:
    """Reference structs.rs `ProofEvaluations`."""
    wires_evals: list            # [num_wire_types] ints
    wire_sigma_evals: list       # [num_wire_types - 1] ints
    perm_next_eval: int


@dataclass
class PlookupEvaluations:
    """Reference structs.rs `PlookupEvaluations` (15 evals)."""
    range_table_eval: int
    key_table_eval: int
    h_1_eval: int
    q_lookup_eval: int
    prod_next_eval: int
    table_dom_sep_eval: int
    q_dom_sep_eval: int
    range_table_next_eval: int
    key_table_next_eval: int
    h_1_next_eval: int
    h_2_next_eval: int
    q_lookup_next_eval: int
    w_3_next_eval: int
    w_4_next_eval: int
    table_dom_sep_next_eval: int

    def evals_vec(self):
        """Evals at zeta, order matches `plookup_open_polys_ref` (prover.rs:427)."""
        return [self.range_table_eval, self.key_table_eval, self.h_1_eval,
                self.q_lookup_eval, self.table_dom_sep_eval, self.q_dom_sep_eval]

    def next_evals_vec(self):
        """Evals at zeta*g, order matches `plookup_shifted_open_polys_ref`."""
        return [self.prod_next_eval, self.range_table_next_eval,
                self.key_table_next_eval, self.h_1_next_eval, self.h_2_next_eval,
                self.q_lookup_next_eval, self.w_3_next_eval, self.w_4_next_eval,
                self.table_dom_sep_next_eval]


@dataclass
class PlookupProof:
    h_poly_comms: list           # [2] AffinePoint
    prod_lookup_poly_comm: AffinePoint
    poly_evals: PlookupEvaluations


@dataclass
class Proof:
    """Reference structs.rs `Proof`."""
    wires_poly_comms: list       # [num_wire_types]
    prod_perm_poly_comm: AffinePoint
    split_quot_poly_comms: list  # [num_wire_types]
    opening_proof: AffinePoint
    shifted_opening_proof: AffinePoint
    poly_evals: ProofEvaluations
    plookup_proof: Optional[PlookupProof] = None


@dataclass
class BatchProof:
    """Reference structs.rs `BatchProof` (aggregated instances)."""
    wires_poly_comms_vec: list
    prod_perm_poly_comms_vec: list
    poly_evals_vec: list
    plookup_proofs_vec: list
    split_quot_poly_comms: list
    opening_proof: AffinePoint
    shifted_opening_proof: AffinePoint

    def __len__(self):
        return len(self.wires_poly_comms_vec)

    @staticmethod
    def from_proof(pf: Proof) -> "BatchProof":
        return BatchProof(
            wires_poly_comms_vec=[pf.wires_poly_comms],
            prod_perm_poly_comms_vec=[pf.prod_perm_poly_comm],
            poly_evals_vec=[pf.poly_evals],
            plookup_proofs_vec=[pf.plookup_proof],
            split_quot_poly_comms=pf.split_quot_poly_comms,
            opening_proof=pf.opening_proof,
            shifted_opening_proof=pf.shifted_opening_proof,
        )


@dataclass
class PlookupVerifyingKey:
    range_table_comm: AffinePoint
    key_table_comm: AffinePoint
    table_dom_sep_comm: AffinePoint
    q_dom_sep_comm: AffinePoint


@dataclass
class VerifyingKey:
    """Reference structs.rs `VerifyingKey`."""
    domain_size: int
    num_inputs: int
    sigma_comms: list
    selector_comms: list
    k: list                       # coset representatives (ints)
    open_key: object              # kzg.OpenKey
    plookup_vk: Optional[PlookupVerifyingKey] = None
    is_merged: bool = False

    def q_lookup_comm(self):
        assert self.plookup_vk is not None
        return self.selector_comms[-1]


@dataclass
class PlookupProvingKey:
    range_table_poly: object      # device coeff tensors
    key_table_poly: object
    table_dom_sep_poly: object
    q_dom_sep_poly: object
    # [L, 5, n] static EVAL columns (rt, key, tds, qds, q_lookup) consumed
    # by the device-side round-1.5 merge (Prover.plookup_merge)
    eval_tables: object = None


@dataclass
class ProvingKey:
    """Reference structs.rs `ProvingKey`."""
    sigmas: list                  # device coeff polys [num_wire_types][L, n]
    selectors: list               # device coeff polys [13 or 14][L, n]
    commit_key: object            # kzg.CommitKey
    vk: VerifyingKey
    plookup_pk: Optional[PlookupProvingKey] = None

    def domain_size(self) -> int:
        return self.vk.domain_size

    def q_lookup_poly(self):
        assert self.plookup_pk is not None
        return self.selectors[-1]


@dataclass
class Challenges:
    """Reference structs.rs `Challenges` (tau, alpha, beta, gamma, zeta, v, u)."""
    tau: int = 0
    alpha: int = 0
    beta: int = 0
    gamma: int = 0
    zeta: int = 0
    v: int = 0
    u: int = 0


@dataclass
class LinkingHint:
    """Reference structs.rs `LinkingHint`."""
    linking_wire_poly: object
    linking_wire_comm: AffinePoint


@dataclass
class PlookupOracles:
    """Online Plookup oracles (reference structs.rs `PlookupOracles`)."""
    h_polys: list = field(default_factory=list)
    prod_lookup_poly: object = None


@dataclass
class Oracles:
    """Online polynomial oracles (reference structs.rs `Oracles`)."""
    wire_polys: list = field(default_factory=list)
    pub_inp_poly: object = None
    prod_perm_poly: object = None
    plookup_oracles: object = None


def eval_merged_table(p, tau, range_eval, key_eval, q_lookup_eval, w3, w4, table_dom_sep):
    """Reference structs.rs `eval_merged_table`:
    t = range + q_lookup * tau * (dom_sep + tau*key + tau^2*w3 + tau^3*w4)."""
    return (range_eval
            + q_lookup_eval * tau * (table_dom_sep + tau * (key_eval + tau * (w3 + tau * w4)))) % p


def eval_merged_lookup_witness(p, tau, w5, w0, w1, w2, q_lookup_eval, q_dom_sep):
    """Reference structs.rs `eval_merged_lookup_witness`:
    w = w5 + q_lookup * tau * (dom_sep + tau*w0 + tau^2*w1 + tau^3*w2)."""
    return (w5 + q_lookup_eval * tau * (q_dom_sep + tau * (w0 + tau * (w1 + tau * w2)))) % p
