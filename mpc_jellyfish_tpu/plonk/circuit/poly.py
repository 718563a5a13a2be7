"""Non-native polynomial evaluations for the recursive Plonk verifier.

Mirror of `plonk/src/circuit/plonk_verifier/poly.rs:36-700`: all arithmetic
is over the inner curve's scalar field Fr emulated in the circuit field Fq
via 2-limb FpElemVars (mod_arith).  Division results are computed in the
clear and PROVEN by multiplication, exactly as the reference does.
"""

from __future__ import annotations

from ...relation.circuit import CircuitError, PlonkCircuit
from ...relation.gadgets.mod_arith import FpElem, FpElemVar
from .structs import (ChallengesFpElemVar, NonNativeFieldInfo,
                      ScalarsAndBasesVar)

GATE_WIDTH = 4


def evaluate_poly_helper(cs: PlonkCircuit, fr: int, zeta_fp: FpElemVar,
                         domain_size: int, info: NonNativeFieldInfo):
    """poly.rs:36-163: returns [zeta^n, zeta^n - 1, lagrange_1(zeta)] as
    FpElemVars over Fr."""
    m = info.m
    fb = cs.p.bit_length()
    domain_size_fp = FpElem.new(domain_size % cs.p, m, fb)
    one_fp = FpElem.new(1, m, fb)

    zeta = zeta_fp.witness(cs) % fr

    # zeta^n by repeated squaring (n a power of two)
    ctr = 1
    zeta_n_fp = zeta_fp
    while ctr < domain_size:
        ctr <<= 1
        zeta_n_fp = cs.mod_mul(zeta_n_fp, zeta_n_fp, info.modulus_fp_elem)

    # zeta^n - 1, computed in the clear over Fr and proven via
    # zeta^n == (zeta^n - 1) + 1 (mod Fr)
    zeta_n = zeta_n_fp.witness(cs) % fr
    zeta_n_minus_one = (zeta_n - 1) % fr
    zeta_n_minus_one_fp = FpElemVar.new_from_field_element(
        cs, zeta_n_minus_one % cs.p, m)
    rec = cs.mod_add_constant(zeta_n_minus_one_fp, one_fp,
                              info.modulus_fp_elem)
    zeta_n_fp.enforce_equal(cs, rec)

    # lagrange_1(zeta) = (zeta^n - 1) / (n * (zeta - 1)), proven via
    # n * lagrange_1 * (zeta - 1) == zeta^n - 1 (mod Fr)
    divisor = domain_size * (zeta - 1) % fr
    lagrange_1 = zeta_n_minus_one * pow(divisor, -1, fr) % fr \
        if divisor else 0
    lagrange_1_fp = FpElemVar.new_from_field_element(cs, lagrange_1 % cs.p, m)

    zeta_minus_one = (zeta - 1) % fr
    zeta_minus_one_fp = FpElemVar.new_from_field_element(
        cs, zeta_minus_one % cs.p, m)
    rec = cs.mod_add_constant(zeta_minus_one_fp, one_fp,
                              info.modulus_fp_elem)
    zeta_fp.enforce_equal(cs, rec)

    left = cs.mod_mul_constant(lagrange_1_fp, domain_size_fp,
                               info.modulus_fp_elem)
    left = cs.mod_mul(left, zeta_minus_one_fp, info.modulus_fp_elem)
    left.enforce_equal(cs, zeta_n_minus_one_fp)

    return [zeta_n_fp, zeta_n_minus_one_fp, lagrange_1_fp]


def evaluate_pi_poly_circuit(cs: PlonkCircuit, fr: int, domain,
                             pub_inputs_fp, zeta_fp: FpElemVar,
                             vanish_eval_fp: FpElemVar,
                             circuit_is_merged: bool,
                             info: NonNativeFieldInfo) -> FpElemVar:
    """poly.rs:165-283: PI(zeta) for a MERGED circuit — the first l/2 inputs
    at L_{i}, the second l/2 at L_{n-i}."""
    if not circuit_is_merged:
        raise CircuitError("circuit should already be merged")
    m = info.m
    fb = cs.p.bit_length()
    length = len(pub_inputs_fp) >> 1

    zeta = zeta_fp.witness(cs) % fr
    vanish_eval = vanish_eval_fp.witness(cs) % fr
    n = domain.n
    elements = domain.elements_host
    n_inv = pow(n, -1, fr)

    lagrange_fp = []
    idx_range = list(range(length)) + list(range(n - length, n))
    for i in idx_range:
        g_i = elements[i]
        v_i = g_i * n_inv % fr
        zeta_minus_gi = (zeta - g_i) % fr
        eval_i = vanish_eval * v_i % fr * pow(zeta_minus_gi, -1, fr) % fr \
            if zeta_minus_gi else 0

        # prove zeta - g^i
        zeta_minus_gi_fp = FpElemVar.new_from_field_element(
            cs, zeta_minus_gi % cs.p, m)
        rec = cs.mod_add_constant(zeta_minus_gi_fp,
                                  FpElem.new(g_i % cs.p, m, fb),
                                  info.modulus_fp_elem)
        zeta_fp.enforce_equal(cs, rec)

        # prove L_i(zeta) * (zeta - g^i) == Z_H(zeta) * v_i
        eval_i_fp = FpElemVar.new_from_field_element(cs, eval_i % cs.p, m)
        left = cs.mod_mul(eval_i_fp, zeta_minus_gi_fp, info.modulus_fp_elem)
        right = cs.mod_mul_constant(vanish_eval_fp,
                                    FpElem.new(v_i % cs.p, m, fb),
                                    info.modulus_fp_elem)
        left.enforce_equal(cs, right)
        lagrange_fp.append(eval_i_fp)

    res_terms = []
    for i in range(length):
        first = cs.mod_mul(lagrange_fp[i], pub_inputs_fp[i],
                           info.modulus_fp_elem)
        second = cs.mod_mul(lagrange_fp[(length << 1) - i - 1],
                            pub_inputs_fp[length + i], info.modulus_fp_elem)
        res_terms.extend([first, second])
    return cs.mod_add_vec(res_terms, info.modulus_fp_elem)


def compute_lin_poly_constant_term_circuit(cs: PlonkCircuit, fr: int, domain,
                                           challenges: ChallengesFpElemVar,
                                           vks, public_inputs, batch_proof,
                                           evals, alpha_bases,
                                           info: NonNativeFieldInfo
                                           ) -> FpElemVar:
    """poly.rs:286-455: r_0 = sum_j alpha^{3j} * (PI - L1*alpha^2 - alpha *
    prod_i (w_i + beta sigma_i + gamma) * (w_m + gamma) * z(zeta g))."""
    if not (len(vks) == len(batch_proof) == len(public_inputs)):
        raise CircuitError("inconsistent recursion verify inputs")
    m = info.m
    zeta_fp = challenges.zeta

    pi = public_inputs[0]
    for pi_i in public_inputs[1:]:
        if pi is not pi_i and pi != pi_i:
            raise CircuitError("public inputs do not match")

    pi_fp = evaluate_pi_poly_circuit(cs, fr, domain, pi, zeta_fp, evals[1],
                                     True, info)
    pi_fr = pi_fp.witness(cs) % fr

    l1_alpha2_fp = cs.mod_mul(evals[2], challenges.alphas[1],
                              info.modulus_fp_elem)
    l1_alpha2_fr = l1_alpha2_fp.witness(cs) % fr

    r0_components = []
    ab_iter = iter(alpha_bases)
    for poly_evals in batch_proof.poly_evals_vec:
        prod = FpElemVar.one(cs, m)
        for w_i, sigma_i in zip(poly_evals.wires_evals[:GATE_WIDTH],
                                poly_evals.wire_sigma_evals):
            beta_sigma = cs.mod_mul(challenges.beta, sigma_i,
                                    info.modulus_fp_elem)
            s = cs.mod_add_vec([w_i, beta_sigma, challenges.gamma],
                               info.modulus_fp_elem)
            prod = cs.mod_mul(prod, s, info.modulus_fp_elem)

        tmp = cs.mod_add(poly_evals.wires_evals[GATE_WIDTH],
                         challenges.gamma, info.modulus_fp_elem)
        tmp = cs.mod_mul(tmp, poly_evals.perm_next_eval,
                         info.modulus_fp_elem)
        tmp = cs.mod_mul(tmp, challenges.alphas[0], info.modulus_fp_elem)
        tmp = cs.mod_mul(tmp, prod, info.modulus_fp_elem)
        tmp_fr = tmp.witness(cs) % fr

        r_plonk_j = (pi_fr - l1_alpha2_fr - tmp_fr) % fr
        r_plonk_j_fp = FpElemVar.new_from_field_element(
            cs, r_plonk_j % cs.p, m)

        # prove r_plonk_j + L1*alpha^2 + tmp == PI (mod Fr)
        left = cs.mod_add(r_plonk_j_fp, l1_alpha2_fp, info.modulus_fp_elem)
        left = cs.mod_add(left, tmp, info.modulus_fp_elem)
        left.enforce_equal(cs, pi_fp)

        r0_components.append(cs.mod_mul(next(ab_iter), r_plonk_j_fp,
                                        info.modulus_fp_elem))
    return cs.mod_add_vec(r0_components, info.modulus_fp_elem)


def linearization_scalars_and_bases_circuit(cs: PlonkCircuit, fr: int, vks,
                                            challenges: ChallengesFpElemVar,
                                            poly_evals, batch_proof,
                                            alpha_bases,
                                            info: NonNativeFieldInfo
                                            ) -> ScalarsAndBasesVar:
    """poly.rs:459-700: the `[D]1` commitment in scalars-and-bases form."""
    from ...relation.gadgets.ecc import inverse_point
    from ...relation.gadgets.non_native_gates import non_native_power_5_gen
    m = info.m
    fb = cs.p.bit_length()
    beta_zeta = cs.mod_mul(challenges.beta, challenges.zeta,
                           info.modulus_fp_elem)
    alpha_beta = cs.mod_mul(challenges.alphas[0], challenges.beta,
                            info.modulus_fp_elem)
    alpha2_l1 = cs.mod_mul(challenges.alphas[1], poly_evals[2],
                           info.modulus_fp_elem)

    ab_iter = iter(alpha_bases)
    sb = ScalarsAndBasesVar()
    for i, vk in enumerate(vks):
        cur_alpha_base = next(ab_iter)
        w_evals = batch_proof.poly_evals_vec[i].wires_evals
        sigma_evals = batch_proof.poly_evals_vec[i].wire_sigma_evals

        # z-poly coefficient
        coeff = alpha2_l1
        prod = challenges.alphas[0]
        for x_bar, k_i in zip(w_evals, vk.k):
            beta_k_zeta = cs.mod_mul_constant(
                beta_zeta, FpElem.new(k_i % cs.p, m, fb),
                info.modulus_fp_elem)
            s = cs.mod_add_vec([beta_k_zeta, x_bar, challenges.gamma],
                               info.modulus_fp_elem)
            prod = cs.mod_mul(prod, s, info.modulus_fp_elem)
        coeff = cs.mod_add(coeff, prod, info.modulus_fp_elem)
        coeff = cs.mod_mul(coeff, cur_alpha_base, info.modulus_fp_elem)
        sb.scalars.append(coeff)
        sb.bases.append(batch_proof.prod_perm_poly_comms_vec[i])

        # last-sigma coefficient
        num_wire_types = len(batch_proof.wires_poly_comms_vec[i])
        coeff = cs.mod_mul(alpha_beta,
                           batch_proof.poly_evals_vec[i].perm_next_eval,
                           info.modulus_fp_elem)
        for x_bar, sigma_i in zip(w_evals[:num_wire_types - 1], sigma_evals):
            beta_sigma = cs.mod_mul(challenges.beta, sigma_i,
                                    info.modulus_fp_elem)
            s = cs.mod_add_vec([x_bar, challenges.gamma, beta_sigma],
                               info.modulus_fp_elem)
            coeff = cs.mod_mul(coeff, s, info.modulus_fp_elem)
        coeff = cs.mod_mul(coeff, cur_alpha_base, info.modulus_fp_elem)
        sb.scalars.append(coeff)
        sb.bases.append(inverse_point(cs, vk.sigma_comms[-1]))

        # selector coefficients: q_lc x4, q_mul x2, q_hash x4, q_o, q_c, q_ecc
        q_scalars = [w_evals[0], w_evals[1], w_evals[2], w_evals[3]]
        q_scalars.append(cs.mod_mul(w_evals[0], w_evals[1],
                                    info.modulus_fp_elem))
        q_scalars.append(cs.mod_mul(w_evals[2], w_evals[3],
                                    info.modulus_fp_elem))
        for j in range(4):
            q_scalars.append(non_native_power_5_gen(cs, fr, w_evals[j]))
        q_scalars.append(w_evals[4])          # q_o (basis inverted below)
        q_scalars.append(FpElemVar.one(cs, m))  # q_c
        tmp = cs.mod_mul(w_evals[0], w_evals[1], info.modulus_fp_elem)
        tmp = cs.mod_mul(tmp, w_evals[2], info.modulus_fp_elem)
        tmp = cs.mod_mul(tmp, w_evals[3], info.modulus_fp_elem)
        tmp = cs.mod_mul(tmp, w_evals[4], info.modulus_fp_elem)
        q_scalars.append(tmp)                 # q_ecc

        for j, (s, comm) in enumerate(zip(q_scalars, vk.selector_comms)):
            base = inverse_point(cs, comm) if j == 10 else comm
            sb.scalars.append(cs.mod_mul(s, cur_alpha_base,
                                         info.modulus_fp_elem))
            sb.bases.append(base)

    # split quotient commitments: -(zeta^n - 1) * sum (zeta^(n+2))^i [t_i]
    zeta_sq = cs.mod_mul(challenges.zeta, challenges.zeta,
                         info.modulus_fp_elem)
    zeta_n_plus_2 = cs.mod_mul(zeta_sq, poly_evals[0], info.modulus_fp_elem)
    coeff = poly_evals[1]
    sb.scalars.append(poly_evals[1])
    sb.bases.append(inverse_point(cs, batch_proof.split_quot_poly_comms[0]))
    for comm in batch_proof.split_quot_poly_comms[1:]:
        coeff = cs.mod_mul(coeff, zeta_n_plus_2, info.modulus_fp_elem)
        sb.scalars.append(coeff)
        sb.bases.append(inverse_point(cs, comm))
    return sb
