"""Variable structs for the recursive Plonk verifier.

Mirror of `plonk/src/circuit/plonk_verifier/structs.rs:18-196`: challenge
variables, their FpElemVar lifts, the deferred-MSM accumulator, PCS info and
the batch-proof variables.  The circuit field F is the inner curve's BASE
field; inner-curve scalars live in FpElemVar 2-limb form.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ...relation.circuit import PlonkCircuit
from ...relation.gadgets.ecc import PointVariable, create_point_variable
from ...relation.gadgets.mod_arith import FpElem, FpElemVar
from ...relation.gadgets.conversion import (BLS12_377_FQ_SW_TE,
                                            convert_sw_to_te)


@dataclass
class NonNativeFieldInfo:
    """structs.rs:191-196: split parameter m, 2^m, and the emulated modulus."""
    m: int
    modulus_in_f: int
    modulus_fp_elem: FpElem

    @classmethod
    def new(cls, cs: PlonkCircuit, scalar_modulus: int) -> "NonNativeFieldInfo":
        """mod.rs:184-196: m = next multiple of range_bit_len above
        (|Fr| + 1)/2."""
        rbl = cs.range_bit_len()
        m2 = (scalar_modulus.bit_length() + 1) >> 1
        m = (m2 - 1) // rbl * rbl + rbl
        modulus_in_f = scalar_modulus % cs.p
        return cls(m=m, modulus_in_f=modulus_in_f,
                   modulus_fp_elem=FpElem.new(modulus_in_f, m,
                                              cs.p.bit_length()))


@dataclass
class ChallengesVar:
    """structs.rs:20-28."""
    tau: int
    alpha: int
    beta: int
    gamma: int
    zeta: int
    v: int
    u: int


@dataclass
class ChallengesFpElemVar:
    """structs.rs:31-40."""
    tau: FpElemVar
    alphas: list                  # [alpha, alpha^2, alpha^3]
    beta: FpElemVar
    gamma: FpElemVar
    zeta: FpElemVar
    v: FpElemVar
    u: FpElemVar


def challenge_var_to_fp_elem_var(cs: PlonkCircuit, ch: ChallengesVar,
                                 info: NonNativeFieldInfo
                                 ) -> ChallengesFpElemVar:
    """structs.rs:42-104."""
    lift = lambda v: FpElemVar.new_unchecked(cs, v, info.m)
    alpha = lift(ch.alpha)
    alpha2 = cs.mod_mul(alpha, alpha, info.modulus_fp_elem)
    alpha3 = cs.mod_mul(alpha2, alpha, info.modulus_fp_elem)
    return ChallengesFpElemVar(
        tau=lift(ch.tau), alphas=[alpha, alpha2, alpha3], beta=lift(ch.beta),
        gamma=lift(ch.gamma), zeta=lift(ch.zeta), v=lift(ch.v), u=lift(ch.u))


@dataclass
class ScalarsAndBasesVar:
    """structs.rs:107-119."""
    scalars: list = field(default_factory=list)
    bases: list = field(default_factory=list)


@dataclass
class PcsInfoVar:
    """structs.rs:132-141."""
    u: FpElemVar
    eval_point: FpElemVar
    next_eval_point: FpElemVar
    eval: FpElemVar
    comm_scalars_and_bases: ScalarsAndBasesVar
    opening_proof: PointVariable
    shifted_opening_proof: PointVariable


@dataclass
class ProofEvaluationsVar:
    """structs.rs:172-184 (FpElemVar entries)."""
    wires_evals: list
    wire_sigma_evals: list
    perm_next_eval: FpElemVar


@dataclass
class BatchProofVar:
    """structs.rs:143-170."""
    wires_poly_comms_vec: list       # [[PointVariable]]
    prod_perm_poly_comms_vec: list   # [PointVariable]
    poly_evals_vec: list             # [ProofEvaluationsVar]
    split_quot_poly_comms: list      # [PointVariable]
    opening_proof: PointVariable
    shifted_opening_proof: PointVariable

    def __len__(self):
        return len(self.prod_perm_poly_comms_vec)


def _te_point(comm) -> tuple:
    """SW commitment -> TE coordinates (conversion.rs:30-57, BLS12-377)."""
    if getattr(comm, "inf", False):
        return (0, 1)
    return convert_sw_to_te(BLS12_377_FQ_SW_TE, comm.x, comm.y)


def create_te_point_variable(cs: PlonkCircuit, comm) -> PointVariable:
    return create_point_variable(cs, _te_point(comm))


def create_batch_proof_variables(cs: PlonkCircuit, batch_proof, m: int
                                 ) -> BatchProofVar:
    """Create circuit variables for a native BatchProof (the reference does
    this inside `BatchArgument::verify_batch_proof` setup; commitments enter
    as TE points, evaluations as FpElemVars)."""
    wires_vec = [[create_te_point_variable(cs, c) for c in comms]
                 for comms in batch_proof.wires_poly_comms_vec]
    prod_vec = [create_te_point_variable(cs, c)
                for c in batch_proof.prod_perm_poly_comms_vec]
    evals_vec = []
    for ev in batch_proof.poly_evals_vec:
        evals_vec.append(ProofEvaluationsVar(
            wires_evals=[FpElemVar.new_from_field_element(cs, w % cs.p, m)
                         for w in ev.wires_evals],
            wire_sigma_evals=[FpElemVar.new_from_field_element(cs, s % cs.p, m)
                              for s in ev.wire_sigma_evals],
            perm_next_eval=FpElemVar.new_from_field_element(
                cs, ev.perm_next_eval % cs.p, m),
        ))
    split = [create_te_point_variable(cs, c)
             for c in batch_proof.split_quot_poly_comms]
    return BatchProofVar(
        wires_poly_comms_vec=wires_vec,
        prod_perm_poly_comms_vec=prod_vec,
        poly_evals_vec=evals_vec,
        split_quot_poly_comms=split,
        opening_proof=create_te_point_variable(cs, batch_proof.opening_proof),
        shifted_opening_proof=create_te_point_variable(
            cs, batch_proof.shifted_opening_proof),
    )
