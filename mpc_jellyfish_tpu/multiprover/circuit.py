"""MpcPlonkCircuit: circuit building over secret-shared wires.

Mirror of `plonk/src/multiprover/proof_system/constraint_system.rs:89-990`:
the same `Circuit` gadget API as the plaintext `PlonkCircuit`, but
`Wire = Shared` - witness values are authenticated shares and gadget
witness computation goes through the MPC fabric (Beaver muls etc.).
Gate/permutation layout is witness-independent and inherited unchanged.

TurboPlonk only (as in the reference).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import field as F
from ..relation import gates as G
from ..relation.circuit import PlonkCircuit, CircuitError
from .fabric import MockFabric, Shared

GATE_WIDTH = 4


class MpcPlonkCircuit(PlonkCircuit):
    """Shared-witness TurboPlonk circuit bound to a fabric."""

    def __init__(self, fabric: MockFabric):
        self.fabric = fabric
        super().__init__(fabric.spec, ultra_plonk=False)

    # The base __init__ seeds witness [0, 1]; re-seed as shared constants.
    def _ensure_shared_bootstrap(self):
        if not isinstance(self.witness[0], Shared):
            zero = self.fabric.share_scalars([0])
            one = self.fabric.share_scalars([1])
            self.witness[0] = zero
            self.witness[1] = one

    # -- overrides: witness arithmetic goes through the fabric ------------
    def create_variable(self, val) -> int:
        """val: a Shared scalar (or host int, which gets shared)."""
        self._ensure_shared_bootstrap()
        if self.is_finalized():
            raise CircuitError("cannot modify finalized circuit")
        if not isinstance(val, Shared):
            val = self.fabric.share_scalars([int(val) % self.p])
        self.witness.append(val)
        self.num_vars += 1
        return self.num_vars - 1

    def witness_of(self, var: int) -> Shared:
        self.check_var(var)
        self._ensure_shared_bootstrap()
        return self.witness[var]

    def add(self, a, b):
        c = self.create_variable(self.fabric.add(self.witness_of(a),
                                                 self.witness_of(b)))
        self.add_gate(a, b, c)
        return c

    def sub(self, a, b):
        c = self.create_variable(self.fabric.sub(self.witness_of(a),
                                                 self.witness_of(b)))
        self.sub_gate(a, b, c)
        return c

    def mul(self, a, b):
        c = self.create_variable(self.fabric.mul(self.witness_of(a),
                                                 self.witness_of(b)))
        self.mul_gate(a, b, c)
        return c

    def lc(self, wires_in, coeffs):
        assert len(wires_in) == 4 and len(coeffs) == 4
        fab = self.fabric
        acc = None
        for wv, cf in zip(wires_in, coeffs):
            t = fab.mul_public(self.witness_of(wv),
                               fab.public([cf % self.p]))
            acc = t if acc is None else fab.add(acc, t)
        out = self.create_variable(acc)
        self.lc_gate(list(wires_in) + [out], coeffs)
        return out

    def mul_add(self, wires_in, q_muls):
        fab = self.fabric
        ab = fab.mul(self.witness_of(wires_in[0]), self.witness_of(wires_in[1]))
        cd = fab.mul(self.witness_of(wires_in[2]), self.witness_of(wires_in[3]))
        acc = fab.add(fab.mul_public(ab, fab.public([q_muls[0] % self.p])),
                      fab.mul_public(cd, fab.public([q_muls[1] % self.p])))
        out = self.create_variable(acc)
        self.mul_add_gate(list(wires_in) + [out], q_muls)
        return out

    def enforce_constant(self, var: int, constant):
        self.check_var(var)
        c = constant if isinstance(constant, int) else 0
        self.insert_gate([0, 0, 0, 0, var], G.ConstantGate(c % self.p))

    # public inputs: values stay shared until prove-time opening
    def public_input_shared(self) -> list:
        return [self.witness[self.wire_variables[GATE_WIDTH][g]]
                for g in self.pub_input_gate_ids]

    def public_input(self) -> list:
        """Opened public inputs (mock fabric opens directly)."""
        return [self.fabric.open_to_ints(s)[0] for s in self.public_input_shared()]

    # -- satisfiability over shares (mock: open and check, SURVEY §4) ------
    def check_circuit_satisfiability(self, pub_input) -> None:
        opened = [self.fabric.open_to_ints(w)[0] if isinstance(w, Shared) else w
                  for w in self.witness]
        plain = object.__new__(PlonkCircuit)
        plain.__dict__ = {**self.__dict__}
        plain.witness = opened
        PlonkCircuit.check_circuit_satisfiability(plain, pub_input)

    # -- arithmetization over shares ---------------------------------------
    def wire_values_shared(self) -> list:
        """Per wire type, a Shared batch of [L, 2, n] gate values."""
        self._ensure_shared_bootstrap()
        spec = self.spec
        n = self.eval_domain_size()
        share_mat = jnp.concatenate([w.share for w in self.witness], axis=2)
        mac_mat = jnp.concatenate([w.mac for w in self.witness], axis=2)
        out = []
        for i in range(self.num_wire_types):
            idx = jnp.asarray(self.wire_variables[i], dtype=jnp.int32)
            out.append(Shared(share_mat[:, :, idx], mac_mat[:, :, idx]))
        return out
