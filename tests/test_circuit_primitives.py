"""Gadget-vs-native cross-checks for the in-circuit primitive mirrors.

Reference test style (primitives/src/circuit/*): run the native primitive,
rebuild it in-circuit, compare the output witness, check satisfiability,
corrupt the witness, expect failure.  All host-side (no JAX compile).
"""

import random

import pytest

from mpc_jellyfish_tpu.curves import BN254
import mpc_jellyfish_tpu.primitives.circuit as CP  # noqa: F401 (installs methods)
from mpc_jellyfish_tpu.primitives.circuit.rescue import (
    RescueStateVar, create_rescue_state_variable, rescue_permutation,
    rescue_prp_gadget, rescue_sponge_no_padding, rescue_sponge_with_padding)
from mpc_jellyfish_tpu.primitives.circuit import merkle as CM
from mpc_jellyfish_tpu.primitives.circuit import schnorr as CS
from mpc_jellyfish_tpu.primitives.circuit import elgamal as CE
from mpc_jellyfish_tpu.primitives.elgamal import ElGamalEncryption
from mpc_jellyfish_tpu.primitives.merkle import (RescueMerkleTree,
                                                 UniversalMerkleTree)
from mpc_jellyfish_tpu.primitives.rescue import (RescueCRHF, RescueCommitment,
                                                 RescueParams, RescuePRF)
from mpc_jellyfish_tpu.primitives.signatures import SchnorrSignatureScheme
from mpc_jellyfish_tpu.relation.circuit import CircuitError, PlonkCircuit
from mpc_jellyfish_tpu.utils.te_curve import BABY_JUBJUB as JUB

FR = BN254.fr
P = FR.p
RNG = random.Random(2024)


def rand_f():
    return RNG.randrange(P)


class TestRescueGadget:
    def test_permutation_matches_native(self):
        params = RescueParams(FR)
        state = [rand_f() for _ in range(4)]
        expect = params.permute(state)
        cs = PlonkCircuit(FR)
        sv = create_rescue_state_variable(cs, state)
        out = rescue_permutation(cs, sv)
        assert [cs.witness_of(v) for v in out.vars] == expect
        cs.check_circuit_satisfiability([])
        # corrupt an output wire -> unsatisfiable
        cs.witness[out.vars[0]] = (expect[0] + 1) % P
        with pytest.raises(CircuitError):
            cs.check_circuit_satisfiability([])

    def test_prp_matches_native(self):
        params = RescueParams(FR)
        key = [rand_f() for _ in range(4)]
        inp = [rand_f() for _ in range(4)]
        expect = params.prp(key, inp)
        cs = PlonkCircuit(FR)
        kv = create_rescue_state_variable(cs, key)
        iv = create_rescue_state_variable(cs, inp)
        out = rescue_prp_gadget(cs, kv, iv)
        assert [cs.witness_of(v) for v in out.vars] == expect
        cs.check_circuit_satisfiability([])

    def test_sponge_matches_native(self):
        crhf = RescueCRHF(FR)
        for nin, nout in [(3, 1), (6, 2), (3, 4)]:
            data = [rand_f() for _ in range(nin)]
            expect = crhf.sponge_no_padding(data, nout)
            cs = PlonkCircuit(FR)
            dv = [cs.create_variable(d) for d in data]
            out = rescue_sponge_no_padding(cs, dv, nout)
            assert [cs.witness_of(v) for v in out] == expect
            cs.check_circuit_satisfiability([])

    def test_sponge_with_padding_matches_native(self):
        crhf = RescueCRHF(FR)
        for nin in (1, 2, 3, 5):
            data = [rand_f() for _ in range(nin)]
            expect = crhf.sponge_with_bit_padding(data, 1)
            cs = PlonkCircuit(FR)
            dv = [cs.create_variable(d) for d in data]
            out = rescue_sponge_with_padding(cs, dv, 1)
            assert [cs.witness_of(v) for v in out] == expect

    def test_commitment_and_prf_match_native(self):
        data = [rand_f() for _ in range(4)]
        blind = rand_f()
        expect = RescueCommitment(FR).commit(data, blind)
        cs = PlonkCircuit(FR)
        dv = [cs.create_variable(d) for d in data]
        bv = cs.create_variable(blind)
        assert cs.witness_of(cs.commit_gadget(dv, bv)) == expect
        cs.check_circuit_satisfiability([])

        key, inp = rand_f(), [rand_f() for _ in range(5)]
        expect = RescuePRF(FR).full_state_keyed_sponge(key, inp, 1)[0]
        cs = PlonkCircuit(FR)
        kv = cs.create_variable(key)
        iv = [cs.create_variable(x) for x in inp]
        assert cs.witness_of(cs.eval_prf(kv, iv)) == expect
        cs.check_circuit_satisfiability([])


class TestMerkleGadget:
    def test_membership(self):
        elems = [rand_f() for _ in range(11)]
        tree = RescueMerkleTree.from_elems(FR, 3, elems)
        com = tree.commitment()
        pos = 7
        _, proof = tree.lookup(pos)
        assert RescueMerkleTree.verify(FR, com, pos, proof)

        cs = PlonkCircuit(FR)
        pos_var = cs.create_variable(pos)
        proof_var = CM.create_membership_proof_variable(cs, proof)
        root_var = CM.create_root_variable(cs, com.digest)
        CM.enforce_membership_proof(cs, pos_var, proof_var, root_var)
        cs.check_circuit_satisfiability([])
        # wrong root -> unsatisfiable
        cs.witness[root_var] = (com.digest + 1) % P
        with pytest.raises(CircuitError):
            cs.check_circuit_satisfiability([])

    def test_non_membership(self):
        kvs = [(2, rand_f()), (9, rand_f()), (20, rand_f())]
        tree = UniversalMerkleTree.from_kv_set(FR, 3, kvs)
        com = tree.commitment()
        pos = 10  # absent; shares a subtree with occupied 9 and 11->none
        proof = tree.universal_lookup(pos)
        assert tree.verify_non_membership(com, pos, proof)

        cs = PlonkCircuit(FR)
        idx_var = cs.create_variable(pos)
        proof_var = CM.create_non_membership_proof_variable(cs, pos, proof)
        root_var = CM.create_root_variable(cs, com.digest)
        CM.enforce_non_membership_proof(cs, idx_var, proof_var, root_var)
        cs.check_circuit_satisfiability([])
        cs.witness[root_var] = (com.digest + 1) % P
        with pytest.raises(CircuitError):
            cs.check_circuit_satisfiability([])


class TestSchnorrGadget:
    def test_verify_signature(self):
        scheme = SchnorrSignatureScheme(JUB)
        sk, vk = scheme.key_gen(RNG)
        msg = [rand_f() for _ in range(5)]
        sig = scheme.sign(sk, msg)
        assert scheme.verify(vk, msg, sig)

        cs = PlonkCircuit(FR)
        vk_var = CS.create_signature_vk_variable(cs, vk)
        sig_var = CS.create_signature_variable(cs, JUB, sig)
        msg_vars = [cs.create_variable(m) for m in msg]
        CS.verify_signature(cs, JUB, vk_var, msg_vars, sig_var)
        cs.check_circuit_satisfiability([])

    def test_bad_signature_rejected(self):
        scheme = SchnorrSignatureScheme(JUB)
        sk, vk = scheme.key_gen(RNG)
        msg = [rand_f() for _ in range(3)]
        sig = scheme.sign(sk, msg)
        bad_msg = list(msg)
        bad_msg[0] = (bad_msg[0] + 1) % P

        cs = PlonkCircuit(FR)
        vk_var = CS.create_signature_vk_variable(cs, vk)
        sig_var = CS.create_signature_variable(cs, JUB, sig)
        msg_vars = [cs.create_variable(m) for m in bad_msg]
        b = CS.check_signature_validity(cs, JUB, vk_var, msg_vars, sig_var)
        assert cs.witness_of(int(b)) == 0
        cs.check_circuit_satisfiability([])


class TestElGamalGadget:
    def test_encrypt_matches_native(self):
        enc = ElGamalEncryption(JUB)
        sk, pk = enc.key_gen(RNG)
        msg = [rand_f() for _ in range(7)]
        r = RNG.randrange(1, JUB.order)
        ct = enc.deterministic_encrypt(r, pk, msg)
        assert enc.decrypt(sk, ct) == msg

        cs = PlonkCircuit(FR)
        pk_var = CE.create_enc_key_variable(cs, pk)
        msg_vars = [cs.create_variable(m) for m in msg]
        r_var = cs.create_variable(r)
        out = CE.elgamal_encrypt(cs, JUB, pk_var, msg_vars, r_var)
        assert cs.witness_of(out.ephemeral.x) == ct.ephemeral[0]
        assert cs.witness_of(out.ephemeral.y) == ct.ephemeral[1]
        assert [cs.witness_of(v) for v in out.symm_ctxts] == ct.data
        cs.check_circuit_satisfiability([])


class TestRescueNonNative:
    """Mirror of circuit/rescue/non_native.rs tests: T = bls12-377 Fr
    (alpha 11) emulated inside an F = bls12-377 Fq UltraPlonk circuit."""

    def _mk(self):
        from mpc_jellyfish_tpu.curves import BLS12_377
        cs = PlonkCircuit(BLS12_377.fq, ultra_plonk=True, range_bit_len=16)
        return cs, BLS12_377.fr

    def test_permutation_matches_native(self):
        from mpc_jellyfish_tpu.primitives.circuit import rescue_non_native as NN
        cs, tspec = self._mk()
        rng = random.Random(31)
        state = [rng.randrange(tspec.p) for _ in range(4)]
        expect = RescueParams(tspec).permute(state)
        sv = NN.create_rescue_state_variable_non_native(cs, tspec, state)
        out = NN.rescue_permutation_non_native(cs, tspec, sv)
        got = [(cs.witness_of(x.v0) + (cs.witness_of(x.v1) << x.m)) % tspec.p
               for x in out.state]
        assert got == expect
        cs.check_circuit_satisfiability([])
        cs.witness[out.state[0].v0] = (cs.witness[out.state[0].v0] + 1) \
            % cs.p
        with pytest.raises(CircuitError):
            cs.check_circuit_satisfiability([])

    def test_sponge_matches_native(self):
        from mpc_jellyfish_tpu.primitives.circuit import rescue_non_native as NN
        from mpc_jellyfish_tpu.relation.gadgets.mod_arith import FpElemVar
        cs, tspec = self._mk()
        rng = random.Random(32)
        data = [rng.randrange(tspec.p) for _ in range(3)]
        expect = RescueCRHF(tspec).sponge_no_padding(data, 1)
        m = NN.param_m(cs, tspec)
        dv = [FpElemVar.new_from_field_element(cs, d, m) for d in data]
        out = NN.rescue_sponge_no_padding_non_native(cs, tspec, dv, 1)
        got = (cs.witness_of(out[0].v0)
               + (cs.witness_of(out[0].v1) << out[0].m)) % tspec.p
        assert got == expect[0]
        cs.check_circuit_satisfiability([])

    def test_prp_matches_native(self):
        from mpc_jellyfish_tpu.primitives.circuit import rescue_non_native as NN
        cs, tspec = self._mk()
        rng = random.Random(33)
        key = [rng.randrange(tspec.p) for _ in range(4)]
        inp = [rng.randrange(tspec.p) for _ in range(4)]
        expect = RescueParams(tspec).prp(key, inp)
        kv = NN.create_rescue_state_variable_non_native(cs, tspec, key)
        iv = NN.create_rescue_state_variable_non_native(cs, tspec, inp)
        out = NN.rescue_prp_non_native(cs, tspec, kv, iv)
        got = [(cs.witness_of(x.v0) + (cs.witness_of(x.v1) << x.m)) % tspec.p
               for x in out.state]
        assert got == expect
        cs.check_circuit_satisfiability([])
