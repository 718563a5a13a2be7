"""Recursive Plonk verifier circuit.

Mirror of `plonk/src/circuit/plonk_verifier/mod.rs:36-300`:
`VerifyingKeyVar` (with merging for the batch argument) and
`partial_verify_circuit`, which replays the whole Plonk verifier inside a
circuit over the inner curve's base field and outputs the two G1 points of
the deferred pairing check.  Runs on BLS12-377 (G1 has a TE form).
"""

from __future__ import annotations

from ...relation.circuit import CircuitError, PlonkCircuit
from ...relation.gadgets.ecc import (PointVariable,
                                     create_constant_point_variable,
                                     ecc_add, msm_gadget)
from ...relation.gadgets.mod_arith import FpElemVar
from ...utils.te_curve import BLS12_377_G1_TE
from .gadgets import prepare_pcs_info_var
from .structs import NonNativeFieldInfo, _te_point, create_te_point_variable


class VerifyingKeyVar:
    """mod.rs:36-145."""

    def __init__(self, sigma_comms, selector_comms, is_merged: bool,
                 domain_size: int, num_inputs: int, k: list):
        self.sigma_comms = sigma_comms
        self.selector_comms = selector_comms
        self.is_merged = is_merged
        self.domain_size = domain_size
        self.num_inputs = num_inputs
        self.k = list(k)

    @classmethod
    def new(cls, cs: PlonkCircuit, vk) -> "VerifyingKeyVar":
        """mod.rs:57-86 (commitments enter as TE point variables)."""
        sigma = [create_te_point_variable(cs, c) for c in vk.sigma_comms]
        selector = [create_te_point_variable(cs, c)
                    for c in vk.selector_comms]
        return cls(sigma, selector, getattr(vk, "is_merged", False),
                   vk.domain_size, vk.num_inputs, vk.k)

    def to_list(self):
        """mod.rs:88-100."""
        out = []
        for c in self.sigma_comms:
            out.extend([c.x, c.y])
        for c in self.selector_comms:
            out.extend([c.x, c.y])
        return out

    def merge(self, cs: PlonkCircuit, other: "VerifyingKeyVar"
              ) -> "VerifyingKeyVar":
        """mod.rs:103-143: point-wise addition of the two keys."""
        if self.is_merged or other.is_merged:
            raise CircuitError("cannot merge a merged key again")
        if self.domain_size != other.domain_size:
            raise CircuitError("domain size mismatch in vk merge")
        if self.num_inputs != other.num_inputs:
            raise CircuitError("num_inputs mismatch in vk merge")
        curve = BLS12_377_G1_TE
        sigma = [ecc_add(cs, curve, a, b)
                 for a, b in zip(self.sigma_comms, other.sigma_comms)]
        selector = [ecc_add(cs, curve, a, b)
                    for a, b in zip(self.selector_comms,
                                    other.selector_comms)]
        return VerifyingKeyVar(sigma, selector, True, self.domain_size,
                               self.num_inputs + other.num_inputs, self.k)


def aggregate_verify_keys(cs: PlonkCircuit, vk_type_a_vars, vk_type_b_vars):
    """BatchableCircuit::aggregate_verify_keys (mod.rs:272-300)."""
    if len(vk_type_a_vars) != len(vk_type_b_vars):
        raise CircuitError("type A/B key count mismatch")
    return [a.merge(cs, b) for a, b in zip(vk_type_a_vars, vk_type_b_vars)]


def partial_verify_circuit(cs: PlonkCircuit, curve, beta_g, generator_g,
                           merged_vks, shared_public_input_vars,
                           batch_proof_var, blinding_factor: int,
                           extra_transcript_init_msg=None):
    """mod.rs:146-266: returns (inner1, inner2) PointVariables such that
    e(inner1, [beta]2) == e(inner2, [1]2) iff the batch proof verifies
    (up to the blinding term added to both sides).

    - curve: the inner CurveSpec (BLS12-377);
    - beta_g / generator_g: host SW G1 points ([beta]1 and [1]1 of the SRS);
    - shared_public_input_vars: FpElemVars of the shared public input;
    - blinding_factor: a variable blinding the pairing inputs.
    """
    from ...ops.ntt import Domain
    if not merged_vks:
        raise CircuitError("empty merged verification keys")
    if len(merged_vks) != len(batch_proof_var):
        raise CircuitError("vks/instances mismatch")
    domain_size = merged_vks[0].domain_size
    for vk in merged_vks[1:]:
        if vk.domain_size != domain_size:
            raise CircuitError("domain size mismatch across keys")

    fr = curve.fr.p
    info = NonNativeFieldInfo.new(cs, fr)
    domain = Domain(curve.fr, domain_size)
    te = BLS12_377_G1_TE

    # public input is copied once for the merged circuit (mod.rs:204-207)
    shared = list(shared_public_input_vars) + list(shared_public_input_vars)
    public_inputs = [shared] * len(merged_vks)

    pcs_info = prepare_pcs_info_var(cs, fr, merged_vks, public_inputs,
                                    batch_proof_var,
                                    extra_transcript_init_msg, domain, info)

    # inner1 = [open_proof] + u*[shifted_open_proof] + blinding*[1]1
    gen_var = create_constant_point_variable(cs, _te_point(generator_g))
    u_var = pcs_info.u.convert_to_var(cs)
    bases = [pcs_info.opening_proof, pcs_info.shifted_opening_proof, gen_var]
    scalars = [cs.one(), u_var, blinding_factor]
    inner1 = msm_gadget(cs, te, bases, scalars)

    # inner2 = eval_point*[open] + next_eval_point*u*[shifted]
    #        + [agg_comm] - eval*[1]1 + blinding*[beta]1
    sb = pcs_info.comm_scalars_and_bases
    sb.scalars.append(pcs_info.eval_point)
    sb.bases.append(pcs_info.opening_proof)
    tmp = cs.mod_mul(pcs_info.next_eval_point, pcs_info.u,
                     info.modulus_fp_elem)
    sb.scalars.append(tmp)
    sb.bases.append(pcs_info.shifted_opening_proof)
    gen_inv_var = create_constant_point_variable(
        cs, te.neg(_te_point(generator_g)))
    sb.scalars.append(pcs_info.eval)
    sb.bases.append(gen_inv_var)

    scalars2 = [s.convert_to_var(cs) for s in sb.scalars]
    scalars2.append(blinding_factor)
    bases2 = list(sb.bases)
    bases2.append(create_constant_point_variable(cs, _te_point(beta_g)))
    inner2 = msm_gadget(cs, te, bases2, scalars2)
    return inner1, inner2
