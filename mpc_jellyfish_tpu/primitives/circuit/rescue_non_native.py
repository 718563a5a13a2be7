"""In-circuit Rescue over a NON-NATIVE field (FpElemVar state).

Mirror of `primitives/src/circuit/rescue/non_native.rs:26-638`: the same
permutation/PRP/sponge schedule as the native gadget, but the state is four
`FpElemVar`s carrying elements of a smaller target field T inside the
circuit field F, with every S-box / affine row proved through the
ultraplonk mod_arith gadgets (`non_native_power_11_gate`,
`non_native_linear_gen`).  Like the reference, only alpha = 11 targets are
supported (BLS12-377 Fq: the recursion use case).

Requires an UltraPlonk circuit (mod_arith range checks are lookup-backed).
"""

from __future__ import annotations

from ...relation.circuit import PlonkCircuit, CircuitError
from ...relation.gadgets.mod_arith import FpElem, FpElemVar
from ...relation.gadgets.non_native_gates import (
    non_native_power_11_gate, non_native_linear_gen)
from ...ops.field import FieldSpec
from ..rescue import RescueParams, ROUNDS, STATE_SIZE


class RescueNonNativeStateVar:
    """[FpElemVar; 4] + the target modulus split (non_native.rs:31-35)."""

    __slots__ = ("state", "modulus", "t_modulus")

    def __init__(self, state, modulus: FpElem, t_modulus: int):
        self.state = list(state)
        self.modulus = modulus
        self.t_modulus = t_modulus
        assert len(self.state) == STATE_SIZE


def param_m(cs: PlonkCircuit, t_spec: FieldSpec) -> int:
    """Limb split size (non_native.rs:233-235)."""
    rbl = cs.range_bit_len()
    return (t_spec.p.bit_length() // 2 // rbl + 1) * rbl


def _modulus_elem(cs: PlonkCircuit, t_spec: FieldSpec, m: int) -> FpElem:
    return FpElem.new(t_spec.p, m, cs.p.bit_length())


def create_rescue_state_variable_non_native(
        cs: PlonkCircuit, t_spec: FieldSpec, state_vals
) -> RescueNonNativeStateVar:
    """non_native.rs:228-251 (values are target-field ints)."""
    m = param_m(cs, t_spec)
    sv = [FpElemVar.new_from_field_element(cs, v % t_spec.p, m)
          for v in state_vals]
    return RescueNonNativeStateVar(sv, _modulus_elem(cs, t_spec, m), t_spec.p)


def add_constant_state_nn(cs: PlonkCircuit, st: RescueNonNativeStateVar,
                          constant) -> RescueNonNativeStateVar:
    """non_native.rs:341-369."""
    m = st.state[0].m
    out = [cs.mod_add_constant(
        x, FpElem.new(c % st.t_modulus, m, cs.p.bit_length()), st.modulus)
        for x, c in zip(st.state, constant)]
    return RescueNonNativeStateVar(out, st.modulus, st.t_modulus)


def add_state_nn(cs: PlonkCircuit, a: RescueNonNativeStateVar,
                 b: RescueNonNativeStateVar) -> RescueNonNativeStateVar:
    """non_native.rs:555-586."""
    out = [cs.mod_add(x, y, a.modulus) for x, y in zip(a.state, b.state)]
    return RescueNonNativeStateVar(out, a.modulus, a.t_modulus)


def pow_alpha_inv_nn(cs: PlonkCircuit, t_spec: FieldSpec,
                     x: FpElemVar) -> FpElemVar:
    """out = x^(1/11) over T, proved backwards via out^11 == x
    (non_native.rs:524-553)."""
    par = RescueParams(t_spec)
    if par.alpha != 11:
        raise CircuitError("non-native Rescue requires alpha == 11")
    val = (cs.witness_of(x.v0) + (cs.witness_of(x.v1) << x.m)) % t_spec.p
    out_val = pow(val, par.alpha_inv, t_spec.p)
    out = FpElemVar.new_from_field_element(cs, out_val, x.m)
    non_native_power_11_gate(cs, t_spec.p, out, x)
    return out


def pow_alpha_inv_state_nn(cs: PlonkCircuit, t_spec: FieldSpec,
                           st: RescueNonNativeStateVar
                           ) -> RescueNonNativeStateVar:
    out = [pow_alpha_inv_nn(cs, t_spec, x) for x in st.state]
    return RescueNonNativeStateVar(out, st.modulus, st.t_modulus)


def _state_witness_t(cs, st: RescueNonNativeStateVar):
    t = st.t_modulus
    return [(cs.witness_of(x.v0) + (cs.witness_of(x.v1) << x.m)) % t
            for x in st.state]


def affine_transform_nn(cs: PlonkCircuit, st: RescueNonNativeStateVar,
                        mds, constant) -> RescueNonNativeStateVar:
    """out = MDS * state + constant over T, one non_native_linear_gen per
    row with the witnessed output enforced equal (non_native.rs:388-465)."""
    t = st.t_modulus
    m = st.state[0].m
    fb = cs.p.bit_length()
    in_t = _state_witness_t(cs, st)
    out_vars = []
    for i in range(STATE_SIZE):
        val = (sum(mds[i][j] * in_t[j] for j in range(STATE_SIZE))
               + constant[i]) % t
        ov = FpElemVar.new_from_field_element(cs, val, m)
        row = [FpElem.new(mds[i][j] % t, m, fb) for j in range(STATE_SIZE)]
        c = FpElem.new(constant[i] % t, m, fb)
        ov2 = non_native_linear_gen(cs, t, st.state, row, c)
        cs.enforce_equal(ov.v0, ov2.v0)
        cs.enforce_equal(ov.v1, ov2.v1)
        out_vars.append(ov)
    return RescueNonNativeStateVar(out_vars, st.modulus, t)


def non_linear_transform_nn(cs: PlonkCircuit, t_spec: FieldSpec,
                            st: RescueNonNativeStateVar, mds, constant
                            ) -> RescueNonNativeStateVar:
    """out = MDS * state^11 + constant (non_native.rs:467-522)."""
    par = RescueParams(t_spec)
    if par.alpha != 11:
        raise CircuitError("non-native Rescue requires alpha == 11")
    t = st.t_modulus
    m = st.state[0].m
    in_t = _state_witness_t(cs, st)
    p11 = []
    for x, v in zip(st.state, in_t):
        pv = FpElemVar.new_from_field_element(cs, pow(v, 11, t), m)
        non_native_power_11_gate(cs, t, x, pv)
        p11.append(pv)
    st11 = RescueNonNativeStateVar(p11, st.modulus, t)
    return affine_transform_nn(cs, st11, mds, constant)


def permutation_with_const_round_keys_nn(
        cs: PlonkCircuit, t_spec: FieldSpec, st: RescueNonNativeStateVar,
        mds, round_keys) -> RescueNonNativeStateVar:
    """non_native.rs:589-638."""
    if len(round_keys) != 2 * ROUNDS + 1:
        raise CircuitError("bad round key count")
    st = add_constant_state_nn(cs, st, round_keys[0])
    for r, key in enumerate(round_keys[1:]):
        if r % 2 == 0:
            st = pow_alpha_inv_state_nn(cs, t_spec, st)
            st = affine_transform_nn(cs, st, mds, key)
        else:
            st = non_linear_transform_nn(cs, t_spec, st, mds, key)
    return st


def rescue_permutation_non_native(cs: PlonkCircuit, t_spec: FieldSpec,
                                  st: RescueNonNativeStateVar
                                  ) -> RescueNonNativeStateVar:
    """non_native.rs:50-61."""
    par = RescueParams(t_spec)
    return permutation_with_const_round_keys_nn(cs, t_spec, st, par.mds,
                                                par.zero_key_schedule)


def key_schedule_nn(cs: PlonkCircuit, t_spec: FieldSpec,
                    key_var: RescueNonNativeStateVar) -> list:
    """non_native.rs:252-287."""
    par = RescueParams(t_spec)
    st = add_constant_state_nn(cs, key_var, par.init_vec)
    result = [st]
    for r, inj in enumerate(par.key_injection):
        if r % 2 == 0:
            st = pow_alpha_inv_state_nn(cs, t_spec, st)
            st = affine_transform_nn(cs, st, par.mds, inj)
        else:
            st = non_linear_transform_nn(cs, t_spec, st, par.mds, inj)
        result.append(st)
    return result


def prp_with_round_keys_nn(cs: PlonkCircuit, t_spec: FieldSpec,
                           input_var: RescueNonNativeStateVar,
                           keys_vars: list) -> RescueNonNativeStateVar:
    """non_native.rs:289-327."""
    par = RescueParams(t_spec)
    if len(keys_vars) != 2 * ROUNDS + 1:
        raise CircuitError("bad round key count")
    zero = [0] * STATE_SIZE
    st = add_state_nn(cs, input_var, keys_vars[0])
    for r, key_var in enumerate(keys_vars[1:]):
        if r % 2 == 0:
            st = pow_alpha_inv_state_nn(cs, t_spec, st)
            st = affine_transform_nn(cs, st, par.mds, zero)
        else:
            st = non_linear_transform_nn(cs, t_spec, st, par.mds, zero)
        st = add_state_nn(cs, st, key_var)
    return st


def rescue_prp_non_native(cs: PlonkCircuit, t_spec: FieldSpec,
                          key_var: RescueNonNativeStateVar,
                          input_var: RescueNonNativeStateVar
                          ) -> RescueNonNativeStateVar:
    """non_native.rs:62-72."""
    keys = key_schedule_nn(cs, t_spec, key_var)
    return prp_with_round_keys_nn(cs, t_spec, input_var, keys)


def rescue_sponge_no_padding_non_native(cs: PlonkCircuit, t_spec: FieldSpec,
                                        data_vars, num_output: int):
    """non_native.rs:97-153 (rate-3 sponge over FpElemVars)."""
    rate = STATE_SIZE - 1
    if not data_vars or len(data_vars) % rate != 0:
        raise CircuitError("input length must be a positive multiple of rate")
    m = data_vars[0].m
    zero = FpElemVar.zero(cs, m)
    modulus = _modulus_elem(cs, t_spec, m)
    st = RescueNonNativeStateVar(
        [data_vars[0], data_vars[1], data_vars[2], zero], modulus, t_spec.p)
    st = rescue_permutation_non_native(cs, t_spec, st)
    for off in range(rate, len(data_vars), rate):
        blk = RescueNonNativeStateVar(
            [data_vars[off], data_vars[off + 1], data_vars[off + 2], zero],
            modulus, t_spec.p)
        st = add_state_nn(cs, st, blk)
        st = rescue_permutation_non_native(cs, t_spec, st)
    result = []
    remaining = num_output
    while True:
        extract = min(remaining, rate)
        result.extend(st.state[:extract])
        remaining -= extract
        if remaining == 0:
            return result
        st = rescue_permutation_non_native(cs, t_spec, st)


def rescue_sponge_with_padding_non_native(cs: PlonkCircuit, t_spec: FieldSpec,
                                          data_vars, num_output: int):
    """Bit padding: append one then zeros (non_native.rs:73-95)."""
    if not data_vars:
        raise CircuitError("empty data vars")
    rate = STATE_SIZE - 1
    m = data_vars[0].m
    one = FpElemVar.one(cs, m)
    zero = FpElemVar.zero(cs, m)
    total = ((len(data_vars) + 1 + rate - 1) // rate) * rate
    padded = list(data_vars) + [one] + \
        [zero] * (total - len(data_vars) - 1)
    return rescue_sponge_no_padding_non_native(cs, t_spec, padded, num_output)


def rescue_full_state_keyed_sponge_no_padding_non_native(
        cs: PlonkCircuit, t_spec: FieldSpec, key: FpElemVar, data_vars
) -> FpElemVar:
    """non_native.rs:184-227."""
    if not data_vars or len(data_vars) % STATE_SIZE != 0:
        raise CircuitError("FSKS input must be a multiple of STATE_SIZE")
    m = data_vars[0].m
    zero = FpElemVar.zero(cs, m)
    modulus = _modulus_elem(cs, t_spec, m)
    st = RescueNonNativeStateVar([zero, zero, zero, key], modulus, t_spec.p)
    for off in range(0, len(data_vars), STATE_SIZE):
        chunk = RescueNonNativeStateVar(
            list(data_vars[off:off + STATE_SIZE]), modulus, t_spec.p)
        st = add_state_nn(cs, st, chunk)
        st = rescue_permutation_non_native(cs, t_spec, st)
    return st.state[0]


def rescue_full_state_keyed_sponge_with_zero_padding_non_native(
        cs: PlonkCircuit, t_spec: FieldSpec, key: FpElemVar, data_vars
) -> FpElemVar:
    """non_native.rs:155-182."""
    if not data_vars:
        raise CircuitError("empty data vars")
    m = data_vars[0].m
    zero = FpElemVar.zero(cs, m)
    pad = (-len(data_vars)) % STATE_SIZE
    return rescue_full_state_keyed_sponge_no_padding_non_native(
        cs, t_spec, key, list(data_vars) + [zero] * pad)
