"""In-circuit ElGamal hybrid encryption.

Mirror of `primitives/src/circuit/elgamal.rs:30-243`: proves a ciphertext is
the correct encryption of a plaintext under a public key and randomness r —
shared = r*PK, symmetric key = RescuePerm(shared.x, shared.y, 0, 0),
counter-mode Rescue PRP stream added blockwise, ephemeral = r*G.
"""

from __future__ import annotations

from ...relation.circuit import PlonkCircuit
from ...relation.gadgets.ecc import (PointVariable, create_point_variable,
                                     fixed_base_scalar_mul,
                                     variable_base_scalar_mul)
from ...utils.te_curve import TECurve
from ..elgamal import ElGamalCiphertext
from ..rescue import STATE_SIZE
from .rescue import (RescueStateVar, add_state, rescue_key_schedule,
                     rescue_permutation, rescue_prp_with_round_keys)


class EncKeyVars:
    """elgamal.rs:30."""

    __slots__ = ("point",)

    def __init__(self, point: PointVariable):
        self.point = point


class ElGamalHybridCtxtVars:
    """elgamal.rs:34-40."""

    __slots__ = ("ephemeral", "symm_ctxts")

    def __init__(self, ephemeral: PointVariable, symm_ctxts: list):
        self.ephemeral = ephemeral
        self.symm_ctxts = symm_ctxts


def apply_counter_mode_stream_no_padding(cs: PlonkCircuit,
                                         key_var: RescueStateVar,
                                         data_vars: list) -> list:
    """One in-circuit key schedule + one PRP per state-size block
    (elgamal.rs:78-117)."""
    zero = cs.zero()
    round_keys = rescue_key_schedule(cs, key_var)
    out = []
    counter = zero
    for chunk in data_vars:
        stream = rescue_prp_with_round_keys(
            cs, RescueStateVar([counter, zero, zero, zero]), round_keys)
        counter = cs.add_constant(counter, 1)
        out.append(add_state(cs, chunk, stream))
    return out


def apply_counter_mode_stream(cs: PlonkCircuit, key_var: RescueStateVar,
                              data_vars: list) -> list:
    """Pad to a state-size multiple, stream, strip padding
    (elgamal.rs:118-162)."""
    zero = cs.zero()
    padded = list(data_vars)
    padded += [zero] * ((-len(padded)) % STATE_SIZE)
    states = [RescueStateVar(padded[i:i + STATE_SIZE])
              for i in range(0, len(padded), STATE_SIZE)]
    enc = apply_counter_mode_stream_no_padding(cs, key_var, states)
    flat = [v for st in enc for v in st.vars]
    return flat[:len(data_vars)]


def elgamal_encrypt(cs: PlonkCircuit, curve: TECurve, pk_var: EncKeyVars,
                    data_vars: list, r: int) -> ElGamalHybridCtxtVars:
    """elgamal.rs:198-219."""
    shared = variable_base_scalar_mul(cs, curve, r, pk_var.point)
    zero = cs.zero()
    key_perm_input = RescueStateVar([shared.x, shared.y, zero, zero])
    symm_key = rescue_permutation(cs, key_perm_input)
    symm_ctxts = apply_counter_mode_stream(cs, symm_key, data_vars)
    ephemeral = fixed_base_scalar_mul(cs, curve, r, curve.gen)
    return ElGamalHybridCtxtVars(ephemeral, symm_ctxts)


def create_enc_key_variable(cs: PlonkCircuit, pk) -> EncKeyVars:
    """elgamal.rs:220-224."""
    return EncKeyVars(create_point_variable(cs, pk))


def create_ciphertext_variable(cs: PlonkCircuit, ct: ElGamalCiphertext
                               ) -> ElGamalHybridCtxtVars:
    """elgamal.rs:226-240."""
    eph = create_point_variable(cs, ct.ephemeral)
    data = [cs.create_variable(m) for m in ct.data]
    return ElGamalHybridCtxtVars(eph, data)


for _f in (apply_counter_mode_stream_no_padding, apply_counter_mode_stream,
           elgamal_encrypt, create_enc_key_variable,
           create_ciphertext_variable):
    setattr(PlonkCircuit, _f.__name__, _f)
