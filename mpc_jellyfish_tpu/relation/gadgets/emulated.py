"""Emulated (non-native) field arithmetic gadgets.

Mirror of `relation/src/gadgets/emulated.rs:35-680`.  An element of F_q is
represented inside an F_p circuit by NUM_LIMBS B-bit limbs under the CRT
modulus pair [p, 2^T] with p * 2^T > q^2 + q, so a*b - k*q = c can be checked
mod 2^T (limb-wise schoolbook products with carry variables) and mod p (one
native quad gate) without overflow.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..circuit import PlonkCircuit, BoolVar, CircuitError


@dataclass(frozen=True)
class EmulationConfig:
    """Parameters for emulating F_q inside F_p (emulated.rs:24-31)."""
    modulus: int          # q
    T: int                # second CRT modulus is 2^T
    B: int                # bits per limb; 2^{2B} < p
    num_limbs: int        # B * num_limbs == T

    def __post_init__(self):
        assert self.B * self.num_limbs == self.T


# reference configs (emulated.rs:683-693)
def bn254_fq_over_fr() -> EmulationConfig:
    from ...curves import BN254
    return EmulationConfig(modulus=BN254.fq.p, T=300, B=100, num_limbs=3)


def bls12_377_fq_over_bn254_fr() -> EmulationConfig:
    q377 = 0x01ae3a4617c510eac63b05c06ca1493b1a22d9f300f5138f1ef3622fba094800170b5d44300000008508c00000000001
    return EmulationConfig(modulus=q377, T=500, B=100, num_limbs=5)


def int_to_limbs(val: int, b: int, num_limbs: int):
    mask = (1 << b) - 1
    return [(val >> (b * i)) & mask for i in range(num_limbs)]


def limbs_to_int(limbs, b: int) -> int:
    out = 0
    for v in reversed(limbs):
        out = (out << b) + v
    return out


class EmulatedVariable:
    """Limb variables of an emulated F_q element (emulated.rs:81)."""

    __slots__ = ("limbs", "config")

    def __init__(self, limbs, config: EmulationConfig):
        self.limbs = list(limbs)
        self.config = config

    def native_vars(self):
        return list(self.limbs)


def emulated_witness(cs: PlonkCircuit, var: EmulatedVariable) -> int:
    vals = [cs.witness_of(v) for v in var.limbs]
    return limbs_to_int(vals, var.config.B) % var.config.modulus


def create_emulated_variable(cs: PlonkCircuit, config: EmulationConfig,
                             val: int) -> EmulatedVariable:
    var = _create_emulated_variable_unchecked(cs, config, val)
    for v in var.limbs:
        cs.enforce_in_range(v, config.B)
    return var


def _create_emulated_variable_unchecked(cs, config, val):
    val %= config.modulus
    return EmulatedVariable(
        [cs.create_variable(l) for l in int_to_limbs(val, config.B,
                                                     config.num_limbs)],
        config)


def create_constant_emulated_variable(cs: PlonkCircuit,
                                      config: EmulationConfig,
                                      val: int) -> EmulatedVariable:
    val %= config.modulus
    return EmulatedVariable(
        [cs.create_constant_variable(l)
         for l in int_to_limbs(val, config.B, config.num_limbs)], config)


def create_public_emulated_variable(cs: PlonkCircuit, config: EmulationConfig,
                                    val: int) -> EmulatedVariable:
    val %= config.modulus
    return EmulatedVariable(
        [cs.create_public_variable(l)
         for l in int_to_limbs(val, config.B, config.num_limbs)], config)


def _mod_to_native_field(cs: PlonkCircuit, a: EmulatedVariable) -> int:
    """sum_i a_i 2^{Bi} mod p via chained lc gates (emulated.rs:649-680)."""
    p = cs.p
    B = a.config.B
    b_pow = pow(2, B, p)
    zero = cs.zero()
    L = a.config.num_limbs
    get = lambda i: a.limbs[i] if i < L else zero
    result = cs.lc([get(0), get(1), get(2), get(3)],
                   [1, b_pow, b_pow * b_pow % p, pow(2, 3 * B, p)])
    if L > 4:
        cur = pow(2, 4 * B, p)
        for i in range(4, L, 3):
            result = cs.lc([result, get(i), get(i + 1), get(i + 2)],
                           [1, cur, cur * b_pow % p, cur * b_pow * b_pow % p])
            cur = cur * pow(2, 3 * B, p) % p
    return result


def emulated_mul_gate(cs: PlonkCircuit, a: EmulatedVariable,
                      b: EmulatedVariable, c: EmulatedVariable):
    """Constrain a*b == c mod q via a*b - k q = c over [2^T, p]
    (emulated.rs:157-285)."""
    cfg = a.config
    q, T, B, L = cfg.modulus, cfg.T, cfg.B, cfg.num_limbs
    p = cs.p
    b_pow = 1 << B
    neg_b_pow = (p - b_pow % p) % p

    val_a = emulated_witness(cs, a)
    val_b = emulated_witness(cs, b)
    val_k = (val_a * val_b) // q       # k < q since a, b < q
    k = create_emulated_variable(cs, cfg, val_k)
    a_limbs = int_to_limbs(val_a, B, L)
    b_limbs = int_to_limbs(val_b, B, L)
    k_limbs = int_to_limbs(val_k, B, L)
    val_expected = val_a * val_b % q
    exp_limbs = int_to_limbs(val_expected, B, L)
    neg_modulus = int_to_limbs((1 << T) - q, B, L)

    # limb 0
    val_carry = (a_limbs[0] * b_limbs[0] + k_limbs[0] * neg_modulus[0]
                 - exp_limbs[0]) // b_pow
    carry_out = cs.create_variable(val_carry)
    cs.enforce_in_range(carry_out, B + 1)
    cs.quad_poly_gate([a.limbs[0], b.limbs[0], k.limbs[0], carry_out,
                       c.limbs[0]],
                      [0, 0, neg_modulus[0], neg_b_pow], [1, 0], 1, 0)

    for i in range(1, L):
        val_next = (sum(k_limbs[j] * neg_modulus[i - j]
                        + a_limbs[j] * b_limbs[i - j] for j in range(i + 1))
                    + val_carry - exp_limbs[i]) // b_pow
        next_carry = cs.create_variable(val_next)
        num_vals = 2 * i + 2
        log_num_vals = num_vals.bit_length()
        cs.enforce_in_range(next_carry, B + log_num_vals)

        stack = [(k.limbs[j], neg_modulus[i - j]) for j in range(i + 1)]
        stack.append((carry_out, 1))
        stack.append((next_carry, neg_b_pow))
        for j in range(0, i, 2):
            t = cs.mul_add([a.limbs[j], b.limbs[i - j], a.limbs[j + 1],
                            b.limbs[i - j - 1]], [1, 1])
            stack.append((t, 1))
        if i % 2 == 0:
            t1 = stack.pop()
            t2 = stack.pop()
            t = cs.gen_quad_poly([a.limbs[i], b.limbs[0], t1[0], t2[0]],
                                 [0, 0, t1[1], t2[1]], [1, 0], 0)
            stack.append((t, 1))
        while len(stack) > 4:
            t1, t2, t3, t4 = stack.pop(), stack.pop(), stack.pop(), stack.pop()
            t = cs.lc([t1[0], t2[0], t3[0], t4[0]],
                      [t1[1], t2[1], t3[1], t4[1]])
            stack.append((t, 1))
        while len(stack) < 4:
            stack.append((cs.zero(), 0))
        t4, t3, t2, t1 = stack.pop(), stack.pop(), stack.pop(), stack.pop()
        cs.lc_gate([t1[0], t2[0], t3[0], t4[0], c.limbs[i]],
                   [t1[1], t2[1], t3[1], t4[1]])
        val_carry = val_next
        carry_out = next_carry

    # mod p check: a*b - k*q = c (mod p)
    a_mod = _mod_to_native_field(cs, a)
    b_mod = _mod_to_native_field(cs, b)
    k_mod = _mod_to_native_field(cs, k)
    c_mod = _mod_to_native_field(cs, c)
    cs.quad_poly_gate([a_mod, b_mod, k_mod, cs.zero(), c_mod],
                      [0, 0, (p - q % p) % p, 0], [1, 0], 1, 0)


def emulated_mul(cs: PlonkCircuit, a: EmulatedVariable,
                 b: EmulatedVariable) -> EmulatedVariable:
    c = emulated_witness(cs, a) * emulated_witness(cs, b) % a.config.modulus
    c = create_emulated_variable(cs, a.config, c)
    emulated_mul_gate(cs, a, b, c)
    return c


def emulated_mul_constant_gate(cs: PlonkCircuit, a: EmulatedVariable, b: int,
                               c: EmulatedVariable):
    """a * const_b == c mod q (emulated.rs:302-404)."""
    cfg = a.config
    q, T, B, L = cfg.modulus, cfg.T, cfg.B, cfg.num_limbs
    p = cs.p
    b_pow = 1 << B
    neg_b_pow = (p - b_pow % p) % p

    val_a = emulated_witness(cs, a)
    val_b = b % q
    val_k = (val_a * val_b) // q       # k < q
    k = create_emulated_variable(cs, cfg, val_k)
    a_limbs = int_to_limbs(val_a, B, L)
    b_limbs = int_to_limbs(val_b, B, L)
    k_limbs = int_to_limbs(val_k, B, L)
    exp_limbs = int_to_limbs(val_a * val_b % q, B, L)
    neg_modulus = int_to_limbs((1 << T) - q, B, L)

    val_carry = (a_limbs[0] * b_limbs[0] + k_limbs[0] * neg_modulus[0]
                 - exp_limbs[0]) // b_pow
    carry_out = cs.create_variable(val_carry)
    cs.enforce_in_range(carry_out, B + 1)
    cs.lc_gate([a.limbs[0], k.limbs[0], carry_out, cs.zero(), c.limbs[0]],
               [b_limbs[0], neg_modulus[0], neg_b_pow, 0])

    for i in range(1, L):
        val_next = (sum(k_limbs[j] * neg_modulus[i - j]
                        + a_limbs[j] * b_limbs[i - j] for j in range(i + 1))
                    + val_carry - exp_limbs[i]) // b_pow
        next_carry = cs.create_variable(val_next)
        num_vals = 2 * i + 2
        cs.enforce_in_range(next_carry, B + num_vals.bit_length())

        stack = [(k.limbs[j], neg_modulus[i - j]) for j in range(i + 1)]
        stack += [(a.limbs[j], b_limbs[i - j]) for j in range(i + 1)]
        stack.append((carry_out, 1))
        stack.append((next_carry, neg_b_pow))
        while len(stack) > 4:
            t1, t2, t3, t4 = stack.pop(), stack.pop(), stack.pop(), stack.pop()
            t = cs.lc([t1[0], t2[0], t3[0], t4[0]],
                      [t1[1], t2[1], t3[1], t4[1]])
            stack.append((t, 1))
        while len(stack) < 4:
            stack.append((cs.zero(), 0))
        t4, t3, t2, t1 = stack.pop(), stack.pop(), stack.pop(), stack.pop()
        cs.lc_gate([t1[0], t2[0], t3[0], t4[0], c.limbs[i]],
                   [t1[1], t2[1], t3[1], t4[1]])
        val_carry = val_next
        carry_out = next_carry

    a_mod = _mod_to_native_field(cs, a)
    k_mod = _mod_to_native_field(cs, k)
    c_mod = _mod_to_native_field(cs, c)
    cs.lc_gate([a_mod, k_mod, cs.zero(), cs.zero(), c_mod],
               [val_b % p, (p - q % p) % p, 0, 0])


def emulated_mul_constant(cs: PlonkCircuit, a: EmulatedVariable,
                          b: int) -> EmulatedVariable:
    c = emulated_witness(cs, a) * b % a.config.modulus
    c = create_emulated_variable(cs, a.config, c)
    emulated_mul_constant_gate(cs, a, b, c)
    return c


def emulated_add_gate(cs: PlonkCircuit, a: EmulatedVariable,
                      b: EmulatedVariable, c: EmulatedVariable):
    """a + b == k q + c with boolean k (emulated.rs:419-474)."""
    cfg = a.config
    q, B, L = cfg.modulus, cfg.B, cfg.num_limbs
    p = cs.p
    b_pow = 1 << B
    neg_b_pow = (p - b_pow % p) % p

    val_a = emulated_witness(cs, a)
    val_b = emulated_witness(cs, b)
    add_no_mod = val_a + val_b
    k_bit = 1 if add_no_mod >= q else 0
    var_k = int(cs.create_boolean_variable(k_bit))
    q_limbs = int_to_limbs(q, B, L)
    anm_vals = int_to_limbs(add_no_mod, B, L)
    anm = [cs.create_variable(v) for v in anm_vals]

    # a + b == add_no_mod (limb carry chain)
    carry = cs.zero()
    for av, bv, cv in zip(a.limbs, b.limbs, anm):
        nxt_val = (cs.witness_of(av) + cs.witness_of(bv)
                   + cs.witness_of(carry)) // b_pow
        nxt = cs.create_variable(nxt_val)
        cs.enforce_bool(nxt)
        cs.lc_gate([av, bv, carry, nxt, cv], [1, 1, 1, neg_b_pow])
        carry = nxt
        cs.enforce_in_range(cv, B)

    # k q + c == add_no_mod
    carry = cs.zero()
    for ql, cv, av in zip(q_limbs, c.limbs, anm):
        nxt_val = (ql * k_bit + cs.witness_of(cv)
                   + cs.witness_of(carry)) // b_pow
        nxt = cs.create_variable(nxt_val)
        cs.enforce_bool(nxt)
        cs.lc_gate([var_k, cv, carry, nxt, av], [ql % p, 1, 1, neg_b_pow])
        carry = nxt


def emulated_add(cs, a, b):
    c = (emulated_witness(cs, a) + emulated_witness(cs, b)) % a.config.modulus
    c = create_emulated_variable(cs, a.config, c)
    emulated_add_gate(cs, a, b, c)
    return c


def emulated_sub(cs, a, b):
    c = (emulated_witness(cs, a) - emulated_witness(cs, b)) % a.config.modulus
    c = create_emulated_variable(cs, a.config, c)
    emulated_add_gate(cs, c, b, a)
    return c


def emulated_add_constant_gate(cs: PlonkCircuit, a: EmulatedVariable, b: int,
                               c: EmulatedVariable):
    """a + const_b == k q + c (emulated.rs:489-545)."""
    cfg = a.config
    q, B, L = cfg.modulus, cfg.B, cfg.num_limbs
    p = cs.p
    b_pow = 1 << B
    neg_b_pow = (p - b_pow % p) % p

    val_a = emulated_witness(cs, a)
    val_b = b % q
    add_no_mod = val_a + val_b
    k_bit = 1 if add_no_mod >= q else 0
    var_k = int(cs.create_boolean_variable(k_bit))
    q_limbs = int_to_limbs(q, B, L)
    b_limbs = int_to_limbs(val_b, B, L)
    anm = [cs.create_variable(v) for v in int_to_limbs(add_no_mod, B, L)]

    carry = cs.zero()
    for av, bl, cv in zip(a.limbs, b_limbs, anm):
        nxt_val = (cs.witness_of(av) + bl + cs.witness_of(carry)) // b_pow
        nxt = cs.create_variable(nxt_val)
        cs.enforce_bool(nxt)
        cs.lc_gate([av, cs.one(), carry, nxt, cv], [1, bl % p, 1, neg_b_pow])
        carry = nxt
        cs.enforce_in_range(cv, B)

    carry = cs.zero()
    for ql, cv, av in zip(q_limbs, c.limbs, anm):
        nxt_val = (ql * k_bit + cs.witness_of(cv)
                   + cs.witness_of(carry)) // b_pow
        nxt = cs.create_variable(nxt_val)
        cs.enforce_bool(nxt)
        cs.lc_gate([var_k, cv, carry, nxt, av], [ql % p, 1, 1, neg_b_pow])
        carry = nxt


def emulated_add_constant(cs, a, b):
    c = (emulated_witness(cs, a) + b) % a.config.modulus
    c = create_emulated_variable(cs, a.config, c)
    emulated_add_constant_gate(cs, a, b, c)
    return c


def emulated_sub_constant(cs, a, b):
    c = (emulated_witness(cs, a) - b) % a.config.modulus
    c = create_emulated_variable(cs, a.config, c)
    emulated_add_constant_gate(cs, c, b, a)
    return c


def conditional_select_emulated(cs: PlonkCircuit, b: BoolVar,
                                p0: EmulatedVariable,
                                p1: EmulatedVariable) -> EmulatedVariable:
    vals = [cs.mux(b, x1, x0) for x0, x1 in zip(p0.limbs, p1.limbs)]
    return EmulatedVariable(vals, p0.config)


def enforce_emulated_var_equal(cs, a, b):
    for x, y in zip(a.limbs, b.limbs):
        cs.enforce_equal(x, y)


def is_emulated_var_equal(cs, a, b) -> BoolVar:
    eqs = [cs.is_equal(x, y) for x, y in zip(a.limbs, b.limbs)]
    return cs.logic_and_all(eqs)


def is_emulated_var_zero(cs, a) -> BoolVar:
    zs = [cs.is_zero(x) for x in a.limbs]
    return cs.logic_and_all(zs)


for _f in (emulated_witness, create_emulated_variable,
           create_constant_emulated_variable, create_public_emulated_variable,
           emulated_mul_gate, emulated_mul, emulated_mul_constant_gate,
           emulated_mul_constant, emulated_add_gate, emulated_add,
           emulated_sub, emulated_add_constant_gate, emulated_add_constant,
           emulated_sub_constant, conditional_select_emulated,
           enforce_emulated_var_equal, is_emulated_var_equal,
           is_emulated_var_zero):
    setattr(PlonkCircuit, _f.__name__, _f)
