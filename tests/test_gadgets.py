"""Gadget library tests: cmp, ECC, in-circuit MSM, emulated field, mod_arith.

Mirrors the reference test style (relation/src/gadgets/*): build circuit ->
check satisfiability with a good witness -> corrupt witness -> expect failure.
All host-side (no JAX compile), so these are fast.
"""

import random

import pytest

from mpc_jellyfish_tpu.curves import BN254
import mpc_jellyfish_tpu.relation.gadgets  # noqa: F401 (installs methods)
from mpc_jellyfish_tpu.relation.circuit import PlonkCircuit, CircuitError
from mpc_jellyfish_tpu.relation.gadgets.mod_arith import FpElem, FpElemVar
from mpc_jellyfish_tpu.relation.gadgets.emulated import bn254_fq_over_fr
from mpc_jellyfish_tpu.utils.te_curve import BABY_JUBJUB as JUB

FR = BN254.fr
P = FR.p
HALF = (P - 1) // 2


class TestCmp:
    CASES = [(5, 5), (1, 2), (HALF + 1, 2), (HALF + 1, P - 2), (P - 3, P - 2),
             (0, HALF)]

    def test_is_cmp(self):
        for a, b in self.CASES:
            cs = PlonkCircuit(FR)
            va, vb = cs.create_variable(a), cs.create_variable(b)
            assert cs.witness_of(int(cs.is_lt(va, vb))) == int(a < b)
            assert cs.witness_of(int(cs.is_leq(va, vb))) == int(a <= b)
            assert cs.witness_of(int(cs.is_gt(va, vb))) == int(a > b)
            assert cs.witness_of(int(cs.is_geq(va, vb))) == int(a >= b)
            cs.check_circuit_satisfiability([])

    def test_is_cmp_constant(self):
        for a, b in self.CASES:
            cs = PlonkCircuit(FR)
            va = cs.create_variable(a)
            assert cs.witness_of(int(cs.is_lt_constant(va, b))) == int(a < b)
            assert cs.witness_of(int(cs.is_gt_constant(va, b))) == int(a > b)
            cs.check_circuit_satisfiability([])

    def test_enforce_cmp(self):
        for a, b in self.CASES:
            cs = PlonkCircuit(FR)
            va, vb = cs.create_variable(a), cs.create_variable(b)
            cs.enforce_lt(va, vb)
            if a < b:
                cs.check_circuit_satisfiability([])
            else:
                with pytest.raises(CircuitError):
                    cs.check_circuit_satisfiability([])

    def test_enforce_geq_negative(self):
        cs = PlonkCircuit(FR)
        va, vb = cs.create_variable(3), cs.create_variable(9)
        cs.enforce_geq(va, vb)
        with pytest.raises(CircuitError):
            cs.check_circuit_satisfiability([])


class TestEcc:
    def test_on_curve_and_add(self):
        rng = random.Random(11)
        cs = PlonkCircuit(FR)
        g = JUB.gen
        h = JUB.mul(g, rng.randrange(2, JUB.order))
        vg = cs.create_point_variable(g)
        vh = cs.create_point_variable(h)
        cs.enforce_on_curve(JUB, vg)
        cs.enforce_on_curve(JUB, vh)
        vsum = cs.ecc_add(JUB, vg, vh)
        assert cs.point_witness(vsum) == JUB.add(g, h)
        cs.check_circuit_satisfiability([])
        # corrupt: claim a different sum
        cs.witness[vsum.x] = (cs.witness[vsum.x] + 1) % P
        with pytest.raises(CircuitError):
            cs.check_circuit_satisfiability([])

    def test_not_on_curve_rejected(self):
        cs = PlonkCircuit(FR)
        bad = cs.create_point_variable((1, 1))
        cs.enforce_on_curve(JUB, bad)
        with pytest.raises(CircuitError):
            cs.check_circuit_satisfiability([])

    def test_neutral_and_select(self):
        cs = PlonkCircuit(FR)
        pv = cs.create_point_variable((0, 1))
        qv = cs.create_point_variable(JUB.gen)
        assert cs.witness_of(int(cs.is_neutral_point(pv))) == 1
        assert cs.witness_of(int(cs.is_neutral_point(qv))) == 0
        b = cs.create_boolean_variable(1)
        sel = cs.binary_point_vars_select(b, pv, qv)
        assert cs.point_witness(sel) == JUB.gen
        eq = cs.is_point_equal(sel, qv)
        assert cs.witness_of(int(eq)) == 1
        inv = cs.inverse_point(qv)
        assert cs.point_witness(inv) == JUB.neg(JUB.gen)
        cs.check_circuit_satisfiability([])

    def test_fixed_base_scalar_mul(self):
        rng = random.Random(7)
        k = rng.randrange(JUB.order)
        cs = PlonkCircuit(FR)
        vk = cs.create_variable(k)
        out = cs.fixed_base_scalar_mul(JUB, vk, JUB.gen)
        assert cs.point_witness(out) == JUB.mul(JUB.gen, k)
        cs.check_circuit_satisfiability([])

    def test_variable_base_scalar_mul_naive(self):
        rng = random.Random(8)
        k = rng.randrange(JUB.order)
        cs = PlonkCircuit(FR)
        base = cs.create_point_variable(JUB.gen)
        vk = cs.create_variable(k)
        out = cs.variable_base_scalar_mul(JUB, vk, base)
        assert cs.point_witness(out) == JUB.mul(JUB.gen, k)
        cs.check_circuit_satisfiability([])

    def test_msm_pippenger_lookup(self):
        rng = random.Random(9)
        cs = PlonkCircuit(FR, ultra_plonk=True, range_bit_len=8)
        pts = [JUB.mul(JUB.gen, rng.randrange(2, JUB.order)) for _ in range(3)]
        ks = [rng.randrange(JUB.order) for _ in range(3)]
        bases = [cs.create_point_variable(p) for p in pts]
        scalars = [cs.create_variable(k) for k in ks]
        out = cs.msm_gadget(JUB, bases, scalars)
        want = (0, 1)
        for p, k in zip(pts, ks):
            want = JUB.add(want, JUB.mul(p, k))
        assert cs.point_witness(out) == want
        cs.check_circuit_satisfiability([])
        # corrupting the result must break it
        cs.witness[out.y] = (cs.witness[out.y] + 1) % P
        with pytest.raises(CircuitError):
            cs.check_circuit_satisfiability([])


class TestEmulated:
    def test_mul_add_sub(self):
        rng = random.Random(3)
        cfg = bn254_fq_over_fr()
        q = cfg.modulus
        a, b = rng.randrange(q), rng.randrange(q)
        cs = PlonkCircuit(FR)
        va = cs.create_emulated_variable(cfg, a)
        vb = cs.create_emulated_variable(cfg, b)
        assert cs.emulated_witness(cs.emulated_mul(va, vb)) == a * b % q
        assert cs.emulated_witness(cs.emulated_add(va, vb)) == (a + b) % q
        assert cs.emulated_witness(cs.emulated_sub(va, vb)) == (a - b) % q
        assert cs.emulated_witness(cs.emulated_mul_constant(va, b)) == a * b % q
        assert cs.emulated_witness(cs.emulated_add_constant(va, b)) == (a + b) % q
        assert cs.emulated_witness(cs.emulated_sub_constant(va, b)) == (a - b) % q
        cs.check_circuit_satisfiability([])

    def test_mul_bad_witness_rejected(self):
        cfg = bn254_fq_over_fr()
        q = cfg.modulus
        cs = PlonkCircuit(FR)
        va = cs.create_emulated_variable(cfg, 12345)
        vb = cs.create_emulated_variable(cfg, 6789)
        vc = cs.emulated_mul(va, vb)
        cs.witness[vc.limbs[0]] = (cs.witness[vc.limbs[0]] + 1) % P
        with pytest.raises(CircuitError):
            cs.check_circuit_satisfiability([])

    def test_select_equal_zero(self):
        cfg = bn254_fq_over_fr()
        cs = PlonkCircuit(FR)
        va = cs.create_emulated_variable(cfg, 111)
        vb = cs.create_emulated_variable(cfg, 222)
        b = cs.create_boolean_variable(1)
        sel = cs.conditional_select_emulated(b, va, vb)
        assert cs.emulated_witness(sel) == 222
        assert cs.witness_of(int(cs.is_emulated_var_equal(sel, vb))) == 1
        assert cs.witness_of(int(cs.is_emulated_var_zero(va))) == 0
        z = cs.create_emulated_variable(cfg, 0)
        assert cs.witness_of(int(cs.is_emulated_var_zero(z))) == 1
        cs.check_circuit_satisfiability([])


class TestModArith:
    M = 80
    T_MOD = (1 << 160) - 47

    def _mk(self):
        cs = PlonkCircuit(FR, ultra_plonk=True, range_bit_len=16)
        p_elem = FpElem.new(self.T_MOD, self.M, P.bit_length())
        return cs, p_elem

    def test_mod_ops(self):
        rng = random.Random(5)
        cs, p_elem = self._mk()
        t = self.T_MOD
        x_val, y_val = rng.randrange(t), rng.randrange(t)
        x = FpElemVar.new_unchecked(cs, cs.create_variable(x_val), self.M)
        y = FpElemVar.new_unchecked(cs, cs.create_variable(y_val), self.M)
        assert cs.mod_add(x, y, p_elem).witness(cs) == (x_val + y_val) % t
        z = cs.mod_mul(x, y, p_elem)
        assert z.witness(cs) == x_val * y_val % t
        yc = FpElem.new(y_val, self.M, P.bit_length())
        assert cs.mod_mul_constant(x, yc, p_elem).witness(cs) == x_val * y_val % t
        assert cs.mod_add_constant(x, yc, p_elem).witness(cs) == (x_val + y_val) % t
        assert cs.mod_negate(x, t).witness(cs) == (t - x_val) % t
        cs.check_circuit_satisfiability([])
        cs.witness[z.v1] = (cs.witness[z.v1] + 1) % P
        with pytest.raises(CircuitError):
            cs.check_circuit_satisfiability([])

    def test_non_native_powers(self):
        rng = random.Random(6)
        cs, p_elem = self._mk()
        t = self.T_MOD
        x_val = rng.randrange(t)
        x = FpElemVar.new_unchecked(cs, cs.create_variable(x_val), self.M)
        assert cs.non_native_power_5_gen(t, x).witness(cs) == pow(x_val, 5, t)
        assert cs.non_native_power_11_gen(t, x).witness(cs) == pow(x_val, 11, t)
        lin = cs.non_native_linear_gen(
            t, [x], [FpElem.new(3, self.M, P.bit_length())],
            FpElem.new(7, self.M, P.bit_length()))
        assert lin.witness(cs) == (3 * x_val + 7) % t
        cs.check_circuit_satisfiability([])


class TestArithExtras:
    def test_power_11(self):
        rng = random.Random(4)
        x = rng.randrange(P)
        cs = PlonkCircuit(FR)
        vx = cs.create_variable(x)
        assert cs.witness_of(cs.power_11_gen(vx)) == pow(x, 11, P)
        v11 = cs.create_variable(pow(x, 11, P))
        cs.power_11_gate(vx, v11)
        cs.check_circuit_satisfiability([])

    def test_truncate(self):
        rng = random.Random(5)
        x = rng.randrange(P)
        cs = PlonkCircuit(FR, ultra_plonk=True, range_bit_len=16)
        vx = cs.create_variable(x)
        vt = cs.truncate(vx, 100)
        assert cs.witness_of(vt) == x % (1 << 100)
        cs.check_circuit_satisfiability([])

    def test_truncate_requires_lookup(self):
        cs = PlonkCircuit(FR)
        vx = cs.create_variable(5)
        with pytest.raises(CircuitError):
            cs.truncate(vx, 100)


def test_variable_independence_turbo():
    """Two satisfying assignments must give identical sigma polynomials
    (reference relation/src/gadgets/mod.rs:24-42)."""
    def build(a, b):
        cs = PlonkCircuit(FR)
        va, vb = cs.create_variable(a), cs.create_variable(b)
        cs.is_lt(va, vb)
        out = cs.mul(va, vb)
        cs.ecc_add(JUB, cs.create_point_variable(JUB.gen),
                   cs.create_point_variable(JUB.mul(JUB.gen, a % 97 + 2)))
        cs.finalize_for_arithmetization()
        return cs

    c1 = build(3, 5)
    c2 = build(7, 2)
    assert c1.eval_domain_size() == c2.eval_domain_size()
    assert c1.extended_permutation() == c2.extended_permutation()


def test_variable_independence():
    """Two circuits with the same statement but different assignments must
    have identical extended permutation polynomials
    (relation/src/gadgets/mod.rs:24-42)."""
    def build(a, b):
        cs = PlonkCircuit(FR, ultra_plonk=True, range_bit_len=4)
        va, vb = cs.create_variable(a), cs.create_variable(b)
        pub = cs.create_public_variable((a * b + a) % P)
        m = cs.mul(va, vb)
        s = cs.add(m, va)
        cs.enforce_equal(s, pub)
        cs.enforce_in_range(va, 8)
        cs.is_lt(va, vb)
        cs.finalize_for_arithmetization()
        return cs

    c1 = build(17, 101)
    c2 = build(23, 255)
    assert c1.num_gates() == c2.num_gates()
    assert c1.num_vars == c2.num_vars
    assert c1.extended_permutation() == c2.extended_permutation()


class TestGLV:
    """Mirror of glv.rs tests: glv_mul vs native mul + decomposition."""

    def test_host_endo_and_decomposition(self):
        from mpc_jellyfish_tpu.relation.gadgets.glv import (
            BANDERSNATCH_GLV as G, endomorphism, scalar_decomposition)
        from mpc_jellyfish_tpu.utils.te_curve import BANDERSNATCH as BS
        rng = random.Random(11)
        pt = BS.mul(BS.gen, rng.randrange(2, BS.order))
        assert endomorphism(BS, G, pt) == BS.mul(pt, G.lam)
        for _ in range(4):
            s = rng.randrange(BS.order)
            k1, k2, pos = scalar_decomposition(BS, G, s)
            sgn = 1 if pos else -1
            assert (k1 - sgn * k2 * G.lam) % BS.order == s
            assert k1 < (1 << 128) and k2 < (1 << 128)

    def test_glv_mul(self):
        from mpc_jellyfish_tpu.curves import BLS12_381
        from mpc_jellyfish_tpu.utils.te_curve import BANDERSNATCH as BS
        rng = random.Random(12)
        for trial in range(2):
            cs = PlonkCircuit(BLS12_381.fr)
            s = rng.randrange(BS.order)
            base_pt = BS.mul(BS.gen, rng.randrange(2, BS.order))
            base = cs.create_point_variable(base_pt)
            sv = cs.create_variable(s)
            out = cs.glv_mul(BS, sv, base)
            assert cs.point_witness(out) == BS.mul(base_pt, s)
            cs.check_circuit_satisfiability([])
            # corrupt the output: must be rejected
            cs.witness[out.x] = (cs.witness[out.x] + 1) % BLS12_381.fr.p
            with pytest.raises(CircuitError):
                cs.check_circuit_satisfiability([])


class TestEmulatedECC:
    """Mirror of ecc/emulated tests: non-native SW and TE point addition."""

    def test_emulated_sw_add(self):
        from mpc_jellyfish_tpu.curves import BLS12_377
        from mpc_jellyfish_tpu.relation.gadgets.emulated import (
            bls12_377_fq_over_bn254_fr)
        from mpc_jellyfish_tpu.relation.gadgets import emulated_ecc as EE
        from mpc_jellyfish_tpu.utils import ec_host as E
        cfg = bls12_377_fq_over_bn254_fr()
        q = cfg.modulus
        rng = random.Random(21)
        g = E.AffinePoint(*BLS12_377.g1_gen)
        cs = PlonkCircuit(FR)
        pts = [E.ec_mul(q, g, rng.randrange(2, 1 << 64)) for _ in range(3)]
        sw = [EE.SWPoint(pt.x, pt.y, False) for pt in pts]
        sw.append(EE.SWPoint(0, 0, True))           # infinity
        sw.append(sw[0])                            # doubling case
        pv = [EE.create_emulated_sw_point_variable(cs, cfg, s) for s in sw]
        acc, acc_pt = pv[0], sw[0]
        for nxt_v, nxt_p in zip(pv[1:], sw[1:]):
            acc = EE.emulated_sw_ecc_add(cs, acc, nxt_v, 0)
            acc_pt = EE.sw_point_add(q, 0, acc_pt, nxt_p)
        got = EE.emulated_sw_point_witness(cs, acc)
        # cross-check against the Jacobian host oracle
        want = E.AffinePoint.infinity()
        for pt in pts + [pts[0]]:
            want = E.ec_add(q, want, pt)
        assert (got.x, got.y, got.inf) == (want.x, want.y, want.inf)
        assert got == acc_pt
        cs.check_circuit_satisfiability([])
        # corrupt a coordinate limb: must be rejected
        cs.witness[acc.x.limbs[0]] = (cs.witness[acc.x.limbs[0]] + 1) % P
        with pytest.raises(CircuitError):
            cs.check_circuit_satisfiability([])

    def test_emulated_te_add(self):
        from mpc_jellyfish_tpu.relation.gadgets.emulated import EmulationConfig
        from mpc_jellyfish_tpu.relation.gadgets import emulated_ecc as EE
        # ed-on-bls12-377 (a=-1, d=3021) over bn254 Fr: base field is the
        # bls12-377 scalar field (253 bits) -> 3x100-bit limbs
        q = 8444461749428370424248824938781546531375899335154063827935233455917409239041
        cfg = EmulationConfig(modulus=q, T=300, B=100, num_limbs=3)
        a, d = q - 1, 3021
        rng = random.Random(22)

        def sqrt_mod(n):
            # Tonelli-Shanks (q - 1 = 2^s * t)
            if pow(n, (q - 1) // 2, q) != 1:
                return None
            s, t = 0, q - 1
            while t % 2 == 0:
                s, t = s + 1, t // 2
            z = 2
            while pow(z, (q - 1) // 2, q) == 1:
                z += 1
            m, c, u, r = s, pow(z, t, q), pow(n, t, q), pow(n, (t + 1) // 2, q)
            while u != 1:
                i, tmp = 0, u
                while tmp != 1:
                    tmp = tmp * tmp % q
                    i += 1
                b = pow(c, 1 << (m - i - 1), q)
                m, c = i, b * b % q
                r, u = r * b % q, u * b % q * b % q
            return r

        def sample_point():
            while True:
                x = rng.randrange(q)
                den = (1 - d * x * x) % q
                y2 = (1 + x * x) * pow(den, -1, q) % q
                y = sqrt_mod(y2)
                if y is not None:
                    return (x, y)

        def te_add(p0, p1):
            x0, y0 = p0
            x1, y1 = p1
            dxy = d * x0 * x1 % q * y0 % q * y1 % q
            x2 = (x0 * y1 + x1 * y0) * pow(1 + dxy, -1, q) % q
            y2 = (y0 * y1 - a * x0 * x1) * pow(1 - dxy, -1, q) % q
            return (x2, y2)

        pts = [sample_point() for _ in range(3)]
        cs = PlonkCircuit(FR)
        pv = [EE.create_emulated_te_point_variable(cs, cfg, pt) for pt in pts]
        acc_v, acc = pv[0], pts[0]
        for v, pt in zip(pv[1:], pts[1:]):
            acc_v = EE.emulated_te_ecc_add(cs, acc_v, v, a, d)
            acc = te_add(acc, pt)
        assert EE.emulated_te_point_witness(cs, acc_v) == acc
        cs.check_circuit_satisfiability([])
        cs.witness[acc_v.y.limbs[0]] = (cs.witness[acc_v.y.limbs[0]] + 1) % P
        with pytest.raises(CircuitError):
            cs.check_circuit_satisfiability([])
