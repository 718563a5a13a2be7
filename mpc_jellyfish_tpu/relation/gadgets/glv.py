"""GLV scalar multiplication gadget (Bandersnatch endomorphism).

Mirror of `relation/src/gadgets/ecc/glv.rs:90-545`: decompose a ~253-bit
scalar s into two ~128-bit half-scalars k1, k2 with s = k1 - sign*k2*lambda
(mod r) via Babai rounding against the lattice basis N, prove the
decomposition in-circuit over the base field with two 128-bit range proofs
and sign-branched linear identities, then finish with a 2-base MSM of
128-bit scalars against (P, +-phi(P)).

Constants are the published Bandersnatch parameters (eprint 2021/1152);
decoded from little-endian byte form and re-verified in tests
(phi(G) == lambda*G, decomposition identity).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..circuit import PlonkCircuit, BoolVar, CircuitError
from ...utils.te_curve import TECurve
from . import ecc as ECC


@dataclass(frozen=True)
class GLVParams:
    """Endomorphism phi(x, y) = (f(y)/(xy), g(y)/h(y)) with
    f(y)=c(1-y^2), g(y)=b(y^2+b), h(y)=y^2-b, and phi = [lambda]."""
    b: int
    c: int
    lam: int
    # lattice basis for Babai rounding: scalar -> (k1, k2, sign)
    n11: int
    n12: int
    n21: int
    n22: int


# Bandersnatch (ed-on-bls12-381); glv.rs:26-84 byte arrays, decoded.
BANDERSNATCH_GLV = GLVParams(
    b=37446463827641770816307242315180085052603635617490163568005256780843403514036,
    c=49199877423542878313146170939139662862850515542392585932876811575731455068989,
    lam=8913659658109529928382530854484400854125314752504019737736543920008458395397,
    n11=113482231691339203864511368254957623327,
    n12=10741319382058138887739339959866629956,
    n21=21482638764116277775478679919733259912,
    n22=13108968793781547619861935127046491459195673661749231047921891938474730049474,
)


def endomorphism(curve: TECurve, glv: GLVParams, pt):
    """phi(P) = lambda*P on the curve (glv.rs:132-149)."""
    q = curve.q
    x, y = pt
    xy = x * y % q
    y2 = y * y % q
    f_y = glv.c * (1 - y2) % q
    g_y = glv.b * (y2 + glv.b) % q
    h_y = (y2 - glv.b) % q
    return (f_y * pow(xy, -1, q) % q, g_y * pow(h_y, -1, q) % q)


def scalar_decomposition(curve: TECurve, glv: GLVParams, s: int):
    """s = k1 - sign*k2*lambda (mod r), k1/k2 < 2^128 (glv.rs:216-243)."""
    r = curve.order
    s %= r
    beta1 = s * glv.n11 // r
    beta2 = s * glv.n12 // r
    b1 = beta1 * glv.n11 + beta2 * glv.n21
    b2 = (beta1 * glv.n12 + beta2 * glv.n22) % r
    k1 = s - b1
    is_pos = b2 < r // 2
    k2 = b2 if is_pos else r - b2
    return k1, k2, is_pos


def endomorphism_circuit(cs: PlonkCircuit, curve: TECurve, glv: GLVParams,
                         pv: ECC.PointVariable) -> ECC.PointVariable:
    """Constrain endo = phi(point) (glv.rs:152-202)."""
    p = cs.p
    endo_pt = endomorphism(curve, glv, ECC.point_witness(cs, pv))
    endo_var = ECC.create_point_variable(cs, endo_pt)
    b, c = glv.b % p, glv.c % p
    zero = cs.zero()
    xy = cs.mul(pv.x, pv.y)
    # f(y) = c(1 - y^2); g(y) = b(y^2 + b); h(y) = y^2 - b
    f_y = cs.gen_quad_poly([pv.y, pv.y, zero, zero], [0, 0, 0, 0],
                           [(-c) % p, 0], c)
    g_y = cs.gen_quad_poly([pv.y, pv.y, zero, zero], [0, 0, 0, 0],
                           [b, 0], b * b % p)
    h_y = cs.gen_quad_poly([pv.y, pv.y, zero, zero], [0, 0, 0, 0],
                           [1, 0], (-b) % p)
    # endo_x * xy = f(y);  endo_y * h(y) = g(y)
    cs.mul_gate(endo_var.x, xy, f_y)
    cs.mul_gate(endo_var.y, h_y, g_y)
    return endo_var


def scalar_decomposition_gate(cs: PlonkCircuit, curve: TECurve,
                              glv: GLVParams, s_var: int):
    """Prove s = k1 - sign*k2*lambda (mod r) over the base field
    (glv.rs:270-545). Returns (k1_var, k2_var, sign_var)."""
    cs.check_var(s_var)
    p = cs.p
    r = curve.order
    two_128 = 1 << 128
    lam = glv.lam
    lam1 = lam % two_128
    lam2 = lam >> 128
    r1 = r % two_128
    r2 = r >> 128

    s_int = cs.witness_of(s_var)
    k1, k2, is_pos = scalar_decomposition(curve, glv, s_int)
    k2s = k2 if is_pos else -k2
    # t * t_sign = (lambda*k2s + s - k1) / r, exact over Z; t_sign == k2 sign
    t_num = lam * k2s + s_int - k1
    if t_num % r != 0:
        raise CircuitError("glv: decomposition not divisible")
    t_signed = t_num // r
    t = abs(t_signed)
    if (t_signed < 0) == is_pos and t != 0:
        raise CircuitError("glv: t sign mismatch")
    ts = t if is_pos else -t
    # tmp = tmp1 + 2^128 tmp2 with tmp1 == 0
    tmp = lam1 * k2s + s_int - ts * r1 - k1
    if tmp < 0 or tmp % two_128 != 0:
        raise CircuitError("glv: tmp low limb nonzero")
    tmp2 = tmp >> 128

    k1_var = cs.create_variable(k1)
    k2_var = cs.create_variable(k2)
    sign_var = cs.create_boolean_variable(is_pos)
    t_var = cs.create_variable(t)
    tmp_var = cs.create_variable(tmp % p)
    tmp2_var = cs.create_variable(tmp2)

    # (a)/(b) k1, k2 < 2^128; (c)-(e) tmp = 2^128*tmp2, tmp2 < 2^128
    cs.enforce_in_range(k1_var, 128)
    cs.enforce_in_range(k2_var, 128)
    cs.mul_constant_gate(tmp2_var, two_128 % p, tmp_var)
    cs.enforce_in_range(tmp2_var, 128)

    zero = cs.zero()
    # (f) tmp + t*sign*r1 + k1 = lambda_1*sign*k2 + s, branched on sign
    pos_l = cs.lc([tmp_var, t_var, k1_var, zero], [1, r1 % p, 1, 0])
    pos_r = cs.lc([k2_var, s_var, zero, zero], [lam1 % p, 1, 0, 0])
    f_pos = cs.is_equal(pos_l, pos_r)
    neg_l = cs.lc([k2_var, tmp_var, k1_var, zero], [lam1 % p, 1, 1, 0])
    neg_r = cs.lc([s_var, t_var, zero, zero], [1, r1 % p, 0, 0])
    f_neg = cs.is_equal(neg_l, neg_r)
    cs.enforce_constant(cs.mux(sign_var, int(f_pos), int(f_neg)), 1)

    # (g) tmp2 + lambda_2*sign*k2 = t*sign*r2, branched on sign
    pos_l = cs.lc([tmp2_var, k2_var, zero, zero], [1, lam2 % p, 0, 0])
    pos_r = cs.mul_constant(t_var, r2 % p)
    g_pos = cs.is_equal(pos_l, pos_r)
    neg_l = cs.lc([tmp2_var, t_var, zero, zero], [1, r2 % p, 0, 0])
    neg_r = cs.mul_constant(k2_var, lam2 % p)
    g_neg = cs.is_equal(neg_l, neg_r)
    cs.enforce_constant(cs.mux(sign_var, int(g_pos), int(g_neg)), 1)

    return k1_var, k2_var, sign_var


def glv_mul(cs: PlonkCircuit, curve: TECurve, scalar_var: int,
            base: ECC.PointVariable,
            glv: GLVParams = BANDERSNATCH_GLV) -> ECC.PointVariable:
    """scalar * base via endomorphism decomposition (glv.rs:90-110):
    ~half the doublings of a plain variable-base scalar mul."""
    cs.check_var(scalar_var)
    cs.check_vars([base.x, base.y])
    k1_var, k2_var, sign_var = scalar_decomposition_gate(cs, curve, glv,
                                                         scalar_var)
    endo = endomorphism_circuit(cs, curve, glv, base)
    endo_neg = ECC.inverse_point(cs, endo)
    # sign true (k2 positive) -> use -phi(P): s*P = k1*P - k2*phi(P)
    endo_sel = ECC.binary_point_vars_select(cs, sign_var, endo, endo_neg)
    return ECC.msm_gadget(cs, curve, [base, endo_sel], [k1_var, k2_var],
                          scalar_bit_length=128)


PlonkCircuit.glv_mul = glv_mul
