"""In-circuit Rescue permutation / PRP / sponges (native field).

Mirror of `primitives/src/circuit/rescue/native.rs:26-515`.  Each affine or
non-linear state transition is ONE gate per output element: the q_lc row for
MDS-plus-key, the q_hash (x^5) row for the forward S-box, and the inverse
S-box proved backwards (out^5 == in).  A full permutation costs
4 + 24*8 = ~200 gates.
"""

from __future__ import annotations

from ...relation import gates as G
from ...relation.circuit import PlonkCircuit, CircuitError
from ..rescue import RescueParams, ROUNDS, STATE_SIZE


class RescueStateVar:
    """[Variable; 4] (native.rs:26)."""

    __slots__ = ("vars",)

    def __init__(self, vars_):
        self.vars = list(vars_)
        assert len(self.vars) == STATE_SIZE


def _params(cs: PlonkCircuit) -> RescueParams:
    return RescueParams(cs.spec)


# -- PermutationGadget internals (native.rs:317-515) -------------------------

def add_constant_state(cs: PlonkCircuit, state: RescueStateVar,
                       constant) -> RescueStateVar:
    return RescueStateVar([cs.add_constant(v, c)
                           for v, c in zip(state.vars, constant)])


def add_state(cs: PlonkCircuit, left: RescueStateVar,
              right: RescueStateVar) -> RescueStateVar:
    return RescueStateVar([cs.add(a, b)
                           for a, b in zip(left.vars, right.vars)])


def pow_alpha_inv(cs: PlonkCircuit, var: int) -> int:
    """out with out^alpha == in, proved with the forward gate backwards
    (native.rs:448-464)."""
    par = _params(cs)
    out_val = pow(cs.witness_of(var), par.alpha_inv, cs.p)
    out = cs.create_variable(out_val)
    if par.alpha == 5:
        cs.insert_gate([out, 0, 0, 0, var], G.FifthRootGate())
    elif par.alpha == 11:
        cs.power_11_gate(out, var)
    else:
        raise CircuitError("unsupported Rescue alpha")
    return out


def pow_alpha_inv_state(cs: PlonkCircuit,
                        state: RescueStateVar) -> RescueStateVar:
    return RescueStateVar([pow_alpha_inv(cs, v) for v in state.vars])


def affine_transform(cs: PlonkCircuit, state: RescueStateVar, mds,
                     constant) -> RescueStateVar:
    """out = MDS * state + constant, one RescueAffineGate per row
    (native.rs:365-395)."""
    p = cs.p
    in_vals = [cs.witness_of(v) for v in state.vars]
    out_vars = []
    for i in range(STATE_SIZE):
        val = (sum(mds[i][j] * in_vals[j] for j in range(STATE_SIZE))
               + constant[i]) % p
        out = cs.create_variable(val)
        cs.insert_gate(state.vars + [out],
                       G.RescueAffineGate([m % p for m in mds[i]],
                                          constant[i] % p))
        out_vars.append(out)
    return RescueStateVar(out_vars)


def non_linear_transform(cs: PlonkCircuit, state: RescueStateVar, mds,
                         constant) -> RescueStateVar:
    """out = MDS * state^alpha + constant (native.rs:397-446)."""
    par = _params(cs)
    p = cs.p
    if par.alpha == 5:
        in_vals = [pow(cs.witness_of(v), 5, p) for v in state.vars]
        out_vars = []
        for i in range(STATE_SIZE):
            val = (sum(mds[i][j] * in_vals[j] for j in range(STATE_SIZE))
                   + constant[i]) % p
            out = cs.create_variable(val)
            cs.insert_gate(state.vars + [out],
                           G.Power5NonLinearGate([m % p for m in mds[i]],
                                                 constant[i] % p))
            out_vars.append(out)
        return RescueStateVar(out_vars)
    elif par.alpha == 11:
        p11 = []
        for v in state.vars:
            out = cs.create_variable(pow(cs.witness_of(v), 11, p))
            cs.power_11_gate(v, out)
            p11.append(out)
        return affine_transform(cs, RescueStateVar(p11), mds, constant)
    raise CircuitError("unsupported Rescue alpha")


def permutation_with_const_round_keys(cs: PlonkCircuit, state: RescueStateVar,
                                      mds, round_keys) -> RescueStateVar:
    """native.rs:481-514."""
    if len(round_keys) != 2 * ROUNDS + 1:
        raise CircuitError("bad round key count")
    state = add_constant_state(cs, state, round_keys[0])
    for r, key in enumerate(round_keys[1:]):
        if r % 2 == 0:
            state = pow_alpha_inv_state(cs, state)
            state = affine_transform(cs, state, mds, key)
        else:
            state = non_linear_transform(cs, state, mds, key)
    return state


# -- RescueGadget API (native.rs:113-315) ------------------------------------

def rescue_permutation(cs: PlonkCircuit,
                       state: RescueStateVar) -> RescueStateVar:
    par = _params(cs)
    return permutation_with_const_round_keys(cs, state, par.mds,
                                             par.zero_key_schedule)


def rescue_key_schedule(cs: PlonkCircuit,
                        key_var: RescueStateVar) -> list:
    """In-circuit PRP key schedule (native.rs:248-272)."""
    par = _params(cs)
    state = add_constant_state(cs, key_var, par.init_vec)
    result = [state]
    for r, inj in enumerate(par.key_injection):
        if r % 2 == 0:
            state = pow_alpha_inv_state(cs, state)
            state = affine_transform(cs, state, par.mds, inj)
        else:
            state = non_linear_transform(cs, state, par.mds, inj)
        result.append(state)
    return result


def rescue_prp_with_round_keys(cs: PlonkCircuit, input_var: RescueStateVar,
                               keys_vars: list) -> RescueStateVar:
    """native.rs:291-315."""
    par = _params(cs)
    zero = [0] * STATE_SIZE
    state = add_state(cs, input_var, keys_vars[0])
    for r, key_var in enumerate(keys_vars[1:]):
        if r % 2 == 0:
            state = pow_alpha_inv_state(cs, state)
            state = affine_transform(cs, state, par.mds, zero)
        else:
            state = non_linear_transform(cs, state, par.mds, zero)
        state = add_state(cs, state, key_var)
    return state


def rescue_prp_gadget(cs: PlonkCircuit, key_var: RescueStateVar,
                      input_var: RescueStateVar) -> RescueStateVar:
    """Keyed PRP with in-circuit key schedule (native.rs:129-139)."""
    keys = rescue_key_schedule(cs, key_var)
    return rescue_prp_with_round_keys(cs, input_var, keys)


def rescue_sponge_no_padding(cs: PlonkCircuit, data_vars, num_output: int):
    """native.rs:141-180."""
    rate = STATE_SIZE - 1
    if not data_vars or len(data_vars) % rate != 0:
        raise CircuitError("input length must be a positive multiple of rate")
    zero = cs.zero()
    state = RescueStateVar([data_vars[0], data_vars[1], data_vars[2], zero])
    state = rescue_permutation(cs, state)
    for off in range(rate, len(data_vars), rate):
        block = RescueStateVar([data_vars[off], data_vars[off + 1],
                                data_vars[off + 2], zero])
        state = add_state(cs, state, block)
        state = rescue_permutation(cs, state)
    result = []
    remaining = num_output
    while True:
        extract = min(remaining, rate)
        result.extend(state.vars[:extract])
        remaining -= extract
        if remaining == 0:
            return result
        state = rescue_permutation(cs, state)


def rescue_sponge_with_padding(cs: PlonkCircuit, data_vars, num_output: int):
    """Bit padding: append 1 then zeros (native.rs:182-199)."""
    if not data_vars:
        raise CircuitError("empty data vars")
    rate = STATE_SIZE - 1
    total = ((len(data_vars) + 1 + rate - 1) // rate) * rate
    padded = list(data_vars) + [cs.one()] + \
        [cs.zero()] * (total - len(data_vars) - 1)
    return rescue_sponge_no_padding(cs, padded, num_output)


def rescue_full_state_keyed_sponge_no_padding(cs: PlonkCircuit, key: int,
                                              data_vars) -> int:
    """native.rs:201-223."""
    if len(data_vars) % STATE_SIZE != 0:
        raise CircuitError("FSKS input must be a multiple of STATE_SIZE")
    state = RescueStateVar([cs.zero(), cs.zero(), cs.zero(), key])
    for off in range(0, len(data_vars), STATE_SIZE):
        chunk = RescueStateVar(list(data_vars[off:off + STATE_SIZE]))
        state = add_state(cs, state, chunk)
        state = rescue_permutation(cs, state)
    return state.vars[0]


def rescue_full_state_keyed_sponge_with_zero_padding(cs: PlonkCircuit,
                                                     key: int,
                                                     data_vars) -> int:
    """native.rs:225-246."""
    if not data_vars:
        raise CircuitError("empty data vars")
    pad = (-len(data_vars)) % STATE_SIZE
    return rescue_full_state_keyed_sponge_no_padding(
        cs, key, list(data_vars) + [cs.zero()] * pad)


def create_rescue_state_variable(cs: PlonkCircuit, state) -> RescueStateVar:
    return RescueStateVar([cs.create_variable(v) for v in state])


for _f in (add_constant_state, add_state, pow_alpha_inv, pow_alpha_inv_state,
           affine_transform, non_linear_transform,
           permutation_with_const_round_keys, rescue_permutation,
           rescue_key_schedule, rescue_prp_with_round_keys, rescue_prp_gadget,
           rescue_sponge_no_padding, rescue_sponge_with_padding,
           rescue_full_state_keyed_sponge_no_padding,
           rescue_full_state_keyed_sponge_with_zero_padding,
           create_rescue_state_variable):
    setattr(PlonkCircuit, _f.__name__, _f)
