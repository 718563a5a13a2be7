"""Plonk constraint system (host-side circuit builder).

Mirror of the reference `PlonkCircuit<F>` (`relation/src/constraint_system.rs:117`)
and the `Circuit<F>` trait's default gadget methods
(`relation/src/traits.rs:45-670`).  Circuit building is pure host work
(Python ints mod p); `finalize_for_arithmetization` fixes the evaluation
domain, moves IO gates to the front, computes the wire permutation and the
extended identity permutation.  The Arithmetization accessors then hand the
prover plain host vectors (selectors, sigmas, wire values, public inputs)
which the prover moves to the device once per proof.

UltraPlonk adds a 6th (lookup) wire, range gates over a 2^range_bit_len
table, and key-value lookup gates (`constraint_system.rs:59-85, 239-248`).
"""

from __future__ import annotations

from . import gates as G
from .gates import GATE_WIDTH


class CircuitError(Exception):
    pass


class BoolVar(int):
    """Index of a witness known to be boolean (mirror BoolVar)."""


RANGE_WIRE_ID = 5
LOOKUP_KEY_WIRE_ID = 0
LOOKUP_VAL_1_WIRE_ID = 1
LOOKUP_VAL_2_WIRE_ID = 2
TABLE_VAL_1_WIRE_ID = 3
TABLE_VAL_2_WIRE_ID = 4


def compute_coset_representatives(p: int, num_wire_types: int, coset_size: int):
    """Constants k_0=1, k_1, ... with pairwise-disjoint cosets k_i * H.

    Bit-exact mirror of `relation/src/constants.rs:30-81`: k_0 = 1 and
    each subsequent k_i is drawn from arkworks `F::rand` over
    `ChaChaRng::from_seed([0u8; 32])`, rejecting draws whose coset k^N
    collides with an earlier one — so the k vectors (and hence every
    VerifyingKey) match the reference's for each (field, wire count).
    """
    from ..utils.chacha import ChaCha20Rng, ark_fp_rand
    rng = ChaCha20Rng(b"\x00" * 32)
    ks = [1]
    pows = [1]  # k^N mod p
    while len(ks) < num_wire_types:
        cand = ark_fp_rand(rng, p)
        pk = pow(cand, coset_size, p)
        if all(pk != q for q in pows):
            ks.append(cand)
            pows.append(pk)
    return ks


class PlonkCircuit:
    """TurboPlonk / UltraPlonk circuit over the scalar field of `spec`."""

    def __init__(self, spec, ultra_plonk: bool = False, range_bit_len: int | None = None):
        self.spec = spec
        self.p = spec.p
        self.ultra_plonk = ultra_plonk
        if ultra_plonk and range_bit_len is None:
            raise CircuitError("range bit len required for UltraPlonk")
        self.range_bit_len_ = range_bit_len
        self.num_wire_types = GATE_WIDTH + 1 + (1 if ultra_plonk else 0)

        self.witness = [0, 1]
        self.num_vars = 2
        self.gates: list = []
        self.wire_variables = [[] for _ in range(GATE_WIDTH + 2)]
        self.pub_input_gate_ids: list = []
        self.wire_permutation = None
        self.extended_id_permutation = None
        self.eval_domain_n = 1   # 1 = not finalized
        self._domain_elements = None
        self.num_table_elems = 0
        self.table_gate_ids: list = []
        # proof linking (TurboPlonk only)
        self.link_groups: dict = {}
        self.link_group_layouts: dict = {}

        self.enforce_constant(0, 0)
        self.enforce_constant(1, 1)

    # -- basic accessors (Circuit trait) --------------------------------
    def zero(self) -> int:
        return 0

    def one(self) -> int:
        return 1

    def num_gates(self) -> int:
        return len(self.gates)

    def num_inputs(self) -> int:
        return len(self.pub_input_gate_ids)

    def support_lookup(self) -> bool:
        return self.ultra_plonk

    def range_bit_len(self) -> int:
        if not self.ultra_plonk:
            raise CircuitError("not an UltraPlonk circuit")
        return self.range_bit_len_

    def range_size(self) -> int:
        return 1 << self.range_bit_len()

    def is_finalized(self) -> bool:
        return self.eval_domain_n != 1

    def check_var(self, var: int):
        if not (0 <= var < self.num_vars):
            raise CircuitError(f"variable {var} out of bound {self.num_vars}")

    def check_vars(self, vs):
        for v in vs:
            self.check_var(v)

    def witness_of(self, var: int) -> int:
        self.check_var(var)
        return self.witness[var]

    def invalidate_device_cache(self):
        """Drop cached device witness tensors (call after mutating
        `self.witness` post-finalization)."""
        if hasattr(self, "_device_cache"):
            del self._device_cache

    def public_input(self) -> list:
        return [self.witness[self.wire_variables[GATE_WIDTH][g]]
                for g in self.pub_input_gate_ids]

    # -- variable & gate creation ---------------------------------------
    def create_variable(self, val: int) -> int:
        if self.is_finalized():
            raise CircuitError("cannot modify finalized circuit")
        self.witness.append(val % self.p)
        self.num_vars += 1
        return self.num_vars - 1

    def create_constant_variable(self, val: int) -> int:
        var = self.create_variable(val)
        self.enforce_constant(var, val)
        return var

    def create_boolean_variable(self, val) -> BoolVar:
        v = self.create_variable(int(bool(val)))
        self.enforce_bool(v)
        return BoolVar(v)

    def create_public_variable(self, val: int) -> int:
        var = self.create_variable(val)
        self.set_variable_public(var)
        return var

    def create_public_boolean_variable(self, val) -> BoolVar:
        return BoolVar(self.create_public_variable(int(bool(val))))

    def set_variable_public(self, var: int):
        if self.is_finalized():
            raise CircuitError("cannot modify finalized circuit")
        self.pub_input_gate_ids.append(self.num_gates())
        self.insert_gate([0, 0, 0, 0, var], G.IoGate())

    def insert_gate(self, wire_vars, gate):
        if self.is_finalized():
            raise CircuitError("cannot modify finalized circuit")
        for i in range(GATE_WIDTH + 1):
            self.wire_variables[i].append(wire_vars[i])
        self.gates.append(gate)

    def pad_gates(self, n: int):
        for _ in range(n):
            self.insert_gate([0, 0, 0, 0, 0], G.PaddingGate())

    # -- UltraPlonk range / lookup --------------------------------------
    def add_range_check_variable(self, var: int):
        if not self.ultra_plonk:
            raise CircuitError("wrong plonk type")
        if self.is_finalized():
            raise CircuitError("cannot modify finalized circuit")
        self.check_var(var)
        self.wire_variables[RANGE_WIRE_ID].append(var)

    def create_table_and_lookup_variables(self, lookup_vars, table_vars):
        """Create a key-value table [(i, v0_i, v1_i)] and a list of lookup
        triples (key, val0, val1) to be checked against it.  One gate carries
        BOTH a lookup triple (wires 0-2, q_dom_sep) and a table row (wires
        3-4, table_key/table_dom_sep).  Mirror of
        `gadgets/ultraplonk/lookup_table.rs:21-57`."""
        if not self.ultra_plonk:
            raise CircuitError("wrong plonk type")
        for (k, v1, v2) in lookup_vars:
            self.check_vars([k, v1, v2])
        for (v1, v2) in table_vars:
            self.check_vars([v1, v2])
        n = max(len(lookup_vars), len(table_vars))
        n_gate = self.num_gates()
        self.table_gate_ids.append((n_gate, n))
        table_ctr = len(self.table_gate_ids)     # unique per-table dom-sep
        for i in range(n):
            if i < len(lookup_vars):
                q_dom_sep, key, val0, val1 = table_ctr, *lookup_vars[i]
            else:
                q_dom_sep, key, val0, val1 = 0, 0, 0, 0
            if i < len(table_vars):
                table_dom_sep, table_key = table_ctr, i
                tv0, tv1 = table_vars[i]
            else:
                table_dom_sep, table_key, tv0, tv1 = 0, 0, 0, 0
            self.insert_gate(
                [key, val0, val1, tv0, tv1],
                G.LookupGate(self.p, q_dom_sep=q_dom_sep,
                             table_dom_sep=table_dom_sep, table_key=table_key))
        self.num_table_elems += n

    # -- range gadgets (reference gadgets/range.rs, ultraplonk/range.rs) --
    def enforce_in_range(self, a, bit_len: int):
        """Constrain a in [0, 2^bit_len) (range.rs:19-26)."""
        if self.support_lookup():
            self.range_gate_with_lookup(a, bit_len)
        else:
            self.range_gate_internal(a, bit_len)

    def is_in_range(self, a, bit_len: int) -> BoolVar:
        """Boolean: a in [0, 2^bit_len)?  (range.rs:31-38)."""
        bits = self.unpack(a, self.p.bit_length())
        high = self.sum([int(b) for b in bits[bit_len:]])
        return self.is_zero(high)

    def unpack(self, a, bit_len: int):
        """bit_len-long little-endian bit decomposition (range.rs:44-53)."""
        if bit_len < self.p.bit_length() and self.witness_of(a) >= (1 << bit_len):
            raise CircuitError("unpack: witness exceeds 2^bit_len")
        return self.range_gate_internal(a, bit_len)

    def range_gate_internal(self, a, bit_len: int):
        """Binary-decomposition range gate (range.rs:98-130)."""
        self.check_var(a)
        if bit_len == 0:
            raise CircuitError("bit_len must be positive")
        wa = self.witness_of(a)
        bits = [(wa >> i) & 1 for i in range(bit_len)]
        bit_vars = [self.create_boolean_variable(b) for b in bits]
        self.decomposition_gate([int(b) for b in bit_vars], a, 2)
        return bit_vars

    def decomposition_gate(self, a_chunks_le, a, range_size: int):
        """a = sum range_size^i * chunk_i via chained lc gates
        (range.rs:60-93)."""
        padded = list(a_chunks_le)
        rate = GATE_WIDTH - 1
        padded_len = ((max(len(padded) - 1, 1) + rate - 1) // rate) * rate + 1
        padded += [0] * (padded_len - len(padded))
        rs2 = range_size * range_size % self.p
        rs3 = rs2 * range_size % self.p
        coeffs = [rs3, rs2, range_size, 1]
        accum = padded[padded_len - 1]
        for i in range(1, padded_len // rate):
            accum = self.lc(
                [accum, padded[padded_len - 1 - rate * i + 2],
                 padded[padded_len - 1 - rate * i + 1],
                 padded[padded_len - 1 - rate * i]], coeffs)
        self.lc_gate([accum, padded[2], padded[1], padded[0], a], coeffs)

    def range_gate_with_lookup(self, a, bit_len: int):
        """Lookup-backed range check: decompose into range_bit_len chunks on
        the lookup wire (ultraplonk/range.rs:22-56)."""
        range_bit_len = self.range_bit_len()
        range_size = self.range_size()
        if bit_len == 0:
            raise CircuitError("bit_len cannot be zero")
        self.check_var(a)
        leftover = bit_len % range_bit_len
        lookup_len = bit_len // range_bit_len
        length = lookup_len + (1 if leftover else 0)
        wa = self.witness_of(a)
        reprs = [(wa >> (i * range_bit_len)) & (range_size - 1)
                 for i in range(length)]
        repr_vars = [self.create_variable(v) for v in reprs]
        for var in repr_vars[:lookup_len]:
            self.add_range_check_variable(var)
        if leftover:
            self.range_gate_internal(repr_vars[lookup_len], leftover)
        self.decomposition_gate(repr_vars, a, range_size)

    def is_zero(self, a) -> BoolVar:
        """Boolean: a == 0 (gadgets/logic.rs:16-53)."""
        self.check_var(a)
        wa = self.witness_of(a)
        b_val = 1 if wa == 0 else 0
        a_inv = 0 if wa == 0 else pow(wa, -1, self.p)
        b = self.create_variable(b_val)
        inv_var = self.create_variable(a_inv)
        # 1 - a * a_inv = b
        self.insert_gate([a, inv_var, 0, 0, b],
                         G.QuadPolyGate((0, 0, 0, 0), (self.p - 1, 0), 1, 1))
        # a * b = 0
        self.insert_gate([a, b, 0, 0, 0], G.MultiplicationGate())
        return BoolVar(b)

    def non_zero_gate(self, a):
        """Constrain a != 0 (logic.rs): a * a_inv = 1."""
        wa = self.witness_of(a)
        if wa == 0:
            inv_var = self.create_variable(0)
        else:
            inv_var = self.create_variable(pow(wa, -1, self.p))
        self.insert_gate([a, inv_var, 0, 0, self.one()], G.MultiplicationGate())

    def is_equal(self, a, b) -> BoolVar:
        """Boolean: a == b (gadgets/logic.rs)."""
        return self.is_zero(self.sub(a, b))

    # -- core gadgets (Circuit trait default methods) -------------------
    def enforce_constant(self, var: int, constant: int):
        self.check_var(var)
        self.insert_gate([0, 0, 0, 0, var], G.ConstantGate(constant % self.p))

    def add_gate(self, a, b, c):
        self.check_vars([a, b, c])
        self.insert_gate([a, b, 0, 0, c], G.AdditionGate())

    def add(self, a, b):
        val = (self.witness_of(a) + self.witness_of(b)) % self.p
        c = self.create_variable(val)
        self.add_gate(a, b, c)
        return c

    def sub_gate(self, a, b, c):
        self.check_vars([a, b, c])
        self.insert_gate([a, b, 0, 0, c], G.SubtractionGate(self.p))

    def sub(self, a, b):
        val = (self.witness_of(a) - self.witness_of(b)) % self.p
        c = self.create_variable(val)
        self.sub_gate(a, b, c)
        return c

    def mul_gate(self, a, b, c):
        self.check_vars([a, b, c])
        self.insert_gate([a, b, 0, 0, c], G.MultiplicationGate())

    def mul(self, a, b):
        val = self.witness_of(a) * self.witness_of(b) % self.p
        c = self.create_variable(val)
        self.mul_gate(a, b, c)
        return c

    def lc_gate(self, wires, coeffs):
        self.check_vars(wires)
        self.insert_gate(list(wires), G.LinCombGate([c % self.p for c in coeffs]))

    def lc(self, wires_in, coeffs):
        assert len(wires_in) == 4 and len(coeffs) == 4
        val = sum(c * self.witness_of(w) for w, c in zip(wires_in, coeffs)) % self.p
        out = self.create_variable(val)
        self.lc_gate(list(wires_in) + [out], coeffs)
        return out

    def mul_add_gate(self, wires, q_muls):
        self.check_vars(wires)
        self.insert_gate(list(wires), G.MulAddGate([c % self.p for c in q_muls]))

    def mul_add(self, wires_in, q_muls):
        assert len(wires_in) == 4 and len(q_muls) == 2
        w = [self.witness_of(x) for x in wires_in]
        val = (q_muls[0] * w[0] * w[1] + q_muls[1] * w[2] * w[3]) % self.p
        out = self.create_variable(val)
        self.mul_add_gate(list(wires_in) + [out], q_muls)
        return out

    def add_with_coeffs(self, a, b, coeff_a, coeff_b):
        return self.lc([a, b, 0, 0], [coeff_a, coeff_b, 0, 0])

    def mul_with_coeff(self, a, b, coeff):
        return self.mul_add([a, b, 0, 0], [coeff, 0])

    def sum(self, elems):
        """Chunked linear-combination sum (reference traits.rs:369-410)."""
        if not elems:
            raise CircuitError("sum over empty slice")
        self.check_vars(elems)
        total = sum(self.witness_of(e) for e in elems) % self.p
        out = self.create_variable(total)
        rate = GATE_WIDTH - 1
        padded = list(elems)
        padded_len = ((max(len(elems) - 1, 1) + rate - 1) // rate) * rate + 1
        padded += [0] * (padded_len - len(elems))
        accum = padded[0]
        for i in range(1, padded_len // rate):
            accum = self.lc([accum, padded[rate * i - 2], padded[rate * i - 1],
                             padded[rate * i]], [1, 1, 1, 1])
        self.lc_gate([accum, padded[-3], padded[-2], padded[-1], out], [1, 1, 1, 1])
        return out

    def lc_sum(self, elems, coeffs):
        assert len(elems) == len(coeffs)
        partials = []
        n_lcs = ((len(elems) + GATE_WIDTH - 1) // GATE_WIDTH) * GATE_WIDTH
        ws = list(elems) + [0] * (n_lcs - len(elems))
        cs = list(coeffs) + [0] * (n_lcs - len(coeffs))
        for i in range(0, n_lcs, GATE_WIDTH):
            partials.append(self.lc(ws[i:i + 4], cs[i:i + 4]))
        return self.sum(partials)

    def add_constant_gate(self, x, c, y):
        self.check_vars([x, y])
        self.insert_gate([x, self.one(), 0, 0, y], G.ConstantAdditionGate(c % self.p))

    def add_constant(self, x, c):
        val = (self.witness_of(x) + c) % self.p
        y = self.create_variable(val)
        self.add_constant_gate(x, c, y)
        return y

    def mul_constant_gate(self, x, c, y):
        self.check_vars([x, y])
        self.insert_gate([x, 0, 0, 0, y], G.ConstantMultiplicationGate(c % self.p))

    def mul_constant(self, x, c):
        val = self.witness_of(x) * c % self.p
        y = self.create_variable(val)
        self.mul_constant_gate(x, c, y)
        return y

    def pow5(self, x):
        val = pow(self.witness_of(x), 5, self.p)
        y = self.create_variable(val)
        self.insert_gate([x, 0, 0, 0, y], G.FifthRootGate())
        return y

    def quad_poly_gate(self, wires, q_lc, q_mul, q_o, q_c):
        """Reference gadgets/arithmetic.rs:27."""
        self.check_vars(wires)
        self.insert_gate(list(wires), G.QuadPolyGate(
            [c % self.p for c in q_lc], [c % self.p for c in q_mul],
            q_o % self.p, q_c % self.p))

    def gen_quad_poly(self, wires, q_lc, q_mul, q_c):
        """Create the output of a general quadratic poly (arithmetic.rs:77)."""
        assert len(wires) == 4
        w = [self.witness_of(x) for x in wires]
        val = (q_lc[0] * w[0] + q_lc[1] * w[1] + q_lc[2] * w[2] + q_lc[3] * w[3]
               + q_mul[0] * w[0] * w[1] + q_mul[1] * w[2] * w[3] + q_c) % self.p
        out = self.create_variable(val)
        self.quad_poly_gate(list(wires) + [out], q_lc, q_mul, 1, q_c)
        return out

    # -- boolean / logic -------------------------------------------------
    def enforce_bool(self, a):
        self.check_var(a)
        self.insert_gate([a, a, 0, 0, a], G.BoolGate())

    def enforce_equal(self, a, b):
        self.check_vars([a, b])
        self.insert_gate([a, b, 0, 0, 0], G.EqualityGate(self.p))

    def enforce_true(self, a):
        self.enforce_constant(int(a), 1)

    def enforce_false(self, a):
        self.enforce_constant(int(a), 0)

    def false_var(self) -> BoolVar:
        return BoolVar(self.zero())

    def true_var(self) -> BoolVar:
        return BoolVar(self.one())

    def logic_or_gate(self, a, b):
        self.insert_gate([int(a), int(b), 0, 0, 0], G.LogicOrGate(self.p))

    def logic_or(self, a, b) -> BoolVar:
        wa, wb = self.witness_of(int(a)), self.witness_of(int(b))
        val = (wa + wb - wa * wb) % self.p
        c = self.create_variable(val)
        self.insert_gate([int(a), int(b), 0, 0, c], G.LogicOrOutputGate(self.p))
        return BoolVar(c)

    def logic_and(self, a, b) -> BoolVar:
        c = self.mul(int(a), int(b))
        return BoolVar(c)

    def logic_and_all(self, vs) -> BoolVar:
        acc = vs[0]
        for v in vs[1:]:
            acc = self.logic_and(acc, v)
        return acc

    def logic_or_all(self, vs) -> BoolVar:
        acc = vs[0]
        for v in vs[1:]:
            acc = self.logic_or(acc, v)
        return acc

    def logic_neg(self, a) -> BoolVar:
        # 1 - a
        val = (1 - self.witness_of(int(a))) % self.p
        c = self.create_variable(val)
        self.lc_gate([self.one(), int(a), 0, 0, c], [1, -1, 0, 0])
        return BoolVar(c)

    def mux_gate(self, sel, a, b, out):
        self.check_vars([int(sel), a, b, out])
        self.insert_gate([int(sel), a, int(sel), b, out], G.MuxGate(self.p))

    def mux(self, sel, a, b):
        val = self.witness_of(a) if self.witness_of(int(sel)) else self.witness_of(b)
        out = self.create_variable(val)
        self.mux_gate(sel, a, b, out)
        return out

    def conditional_select(self, sel, x_0, x_1):
        """sel ? x_1 : x_0 (reference traits.rs CondSelectGate wiring)."""
        val = self.witness_of(x_1) if self.witness_of(int(sel)) else self.witness_of(x_0)
        out = self.create_variable(val)
        self.insert_gate([int(sel), x_0, int(sel), x_1, out], G.CondSelectGate(self.p))
        return out

    # -- finalization ----------------------------------------------------
    def srs_size(self) -> int:
        return self.eval_domain_size() + 2

    def eval_domain_size(self) -> int:
        if not self.is_finalized():
            raise CircuitError("unfinalized circuit")
        return self.eval_domain_n

    # -- proof-linking group API (reference LinkableCircuit) --------------
    def create_link_group(self, gid: str, layout=None) -> str:
        """Create a proof-linking group (TurboPlonk only;
        linkable_circuit.rs:72)."""
        if self.ultra_plonk:
            raise CircuitError("only TurboPlonk supports link groups")
        self.link_groups[gid] = []
        if layout is not None:
            self.link_group_layouts[gid] = layout
        return gid

    def add_to_link_groups(self, var: int, groups):
        self.check_var(var)
        for g in groups:
            if g not in self.link_groups:
                raise CircuitError(f"link group {g} not found")
            self.link_groups[g].append(var)

    def create_variable_with_link_groups(self, val: int, groups) -> int:
        var = self.create_variable(val)
        self.add_to_link_groups(var, groups)
        return var

    def num_links(self) -> int:
        return sum(len(v) for v in self.link_groups.values())

    def min_alignment(self) -> int:
        max_a = 0
        for gid in self.link_groups:
            lay = self.link_group_layouts.get(gid)
            if lay is not None:
                max_a = max(max_a, lay.alignment)
        n_links = max(self.num_links(), 1)
        all_links_a = (n_links - 1).bit_length()
        return max(max_a, all_links_a)

    def generate_layout(self):
        """Place link groups (reference linkable_circuit.rs:136-176)."""
        from .proof_linking import (CircuitLayout, place_group_with_alignment,
                                    validate_layout)
        placed, unplaced = [], []
        for gid in self.link_groups:
            lay = self.link_group_layouts.get(gid)
            if lay is not None:
                placed.append((gid, lay))
            else:
                unplaced.append(gid)
        alignment = self.min_alignment()
        placed.sort(key=lambda kv: kv[1].range_in_nth_roots(alignment))
        inputs = self.num_inputs()
        for gid in unplaced:
            size = len(self.link_groups[gid])
            while not place_group_with_alignment(size, inputs, alignment, gid,
                                                 placed):
                alignment += 1
        layout = CircuitLayout(n_inputs=self.num_inputs(),
                               n_gates=self.num_gates(),
                               group_layouts=dict(placed))
        validate_layout(self.num_inputs(), layout)
        for gid, gl in layout.group_layouts.items():
            self.link_group_layouts[gid] = gl
        return layout

    def apply_layout(self, layout):
        """Rebuild the trace with proof-linking gates placed on their
        roots-of-unity slots (reference linkable_circuit.rs:182-238)."""
        from .proof_linking import PROOF_LINK_WIRE_IDX
        self._rearrange_io_gates_pre_pad()
        size = layout.circuit_size()
        old_gates = iter(self.gates)
        old_vars = [iter(col) for col in self.wire_variables]
        new_gates = []
        new_wires = [[] for _ in range(GATE_WIDTH + 2)]

        def place(n):
            for _ in range(n):
                g = next(old_gates, None)
                new_gates.append(g if g is not None else G.PaddingGate())
                for w in range(GATE_WIDTH + 2):
                    v = next(old_vars[w], None)
                    new_wires[w].append(v if v is not None else 0)

        place(layout.n_inputs)
        calign = layout.circuit_alignment()
        for gid, gl in layout.sorted_groups_iter():
            start, _ = gl.range_in_nth_roots(calign)
            place(start - len(new_gates))
            spacing = 1 << (calign - gl.alignment)
            for link_var in self.link_groups[gid]:
                new_gates.append(G.ProofLinkingGate())
                for w in range(GATE_WIDTH + 2):
                    new_wires[w].append(
                        link_var if w == PROOF_LINK_WIRE_IDX else 0)
                place(spacing - 1)
        place(size - len(new_gates))
        self.gates = new_gates
        self.wire_variables = new_wires

    def _rearrange_io_gates_pre_pad(self):
        """IO gates to the front (order_gates, pre-padding)."""
        for gate_id, io_gate_id in enumerate(self.pub_input_gate_ids):
            if io_gate_id > gate_id:
                self.gates[gate_id], self.gates[io_gate_id] = \
                    self.gates[io_gate_id], self.gates[gate_id]
                for i in range(GATE_WIDTH + 1):
                    wv = self.wire_variables[i]
                    wv[gate_id], wv[io_gate_id] = wv[io_gate_id], wv[gate_id]
                self.pub_input_gate_ids[gate_id] = gate_id

    def finalize_for_arithmetization(self):
        """Reference constraint_system.rs:966-999."""
        if self.is_finalized():
            return
        if self.ultra_plonk:
            n_gates = max(
                self.num_gates(),
                max(self.range_size(), len(self.wire_variables[RANGE_WIRE_ID]))
                + self.num_table_elems + 1,
            )
            n = 1 << (max(n_gates, 2) - 1).bit_length()
            self.eval_domain_n = n
            self._pad()
            self._rearrange_gates()
        elif self.link_groups:
            layout = self.generate_layout()
            self.eval_domain_n = layout.circuit_size()
            self.apply_layout(layout)
            # wire columns already sized to the domain by apply_layout
            for wid in range(self.num_wire_types):
                assert len(self.wire_variables[wid]) == self.eval_domain_n
        else:
            n_gates = max(self.num_gates(), 2)
            n = 1 << (n_gates - 1).bit_length()
            self.eval_domain_n = n
            self._pad()
            self._rearrange_gates()
        self._compute_wire_permutation()
        self._compute_extended_id_permutation()

    def _pad(self):
        n = self.eval_domain_n
        self.pad_gates_unchecked(n - self.num_gates())
        for wid in range(self.num_wire_types):
            self.wire_variables[wid] += [0] * (n - len(self.wire_variables[wid]))

    def pad_gates_unchecked(self, k):
        for _ in range(k):
            for i in range(GATE_WIDTH + 1):
                self.wire_variables[i].append(0)
            self.gates.append(G.PaddingGate())

    def _rearrange_gates(self):
        """IO gates to the front; lookup table gates to the rear
        (reference constraint_system.rs:630-666)."""
        for gate_id, io_gate_id in enumerate(self.pub_input_gate_ids):
            if io_gate_id > gate_id:
                self.gates[gate_id], self.gates[io_gate_id] = \
                    self.gates[io_gate_id], self.gates[gate_id]
                for i in range(GATE_WIDTH + 1):
                    wv = self.wire_variables[i]
                    wv[gate_id], wv[io_gate_id] = wv[io_gate_id], wv[gate_id]
                self.pub_input_gate_ids[gate_id] = gate_id
        if self.ultra_plonk:
            n = self.eval_domain_n
            cur_gate_id = n - 2
            for (table_gate_id, table_size) in reversed(self.table_gate_ids):
                for gate_id in reversed(range(table_gate_id, table_gate_id + table_size)):
                    if gate_id < cur_gate_id:
                        self.gates[gate_id], self.gates[cur_gate_id] = \
                            self.gates[cur_gate_id], self.gates[gate_id]
                        for j in range(GATE_WIDTH + 1):
                            wv = self.wire_variables[j]
                            wv[gate_id], wv[cur_gate_id] = wv[cur_gate_id], wv[gate_id]
                        cur_gate_id -= 1

    def _compute_wire_permutation(self):
        """Reference constraint_system.rs:743-778."""
        n = self.eval_domain_n
        m = self.num_vars
        variable_wires_map = [[] for _ in range(m)]
        for wid in range(self.num_wire_types):
            for gid, var in enumerate(self.wire_variables[wid]):
                variable_wires_map[var].append((wid, gid))
        self.wire_permutation = [(0, 0)] * (self.num_wire_types * n)
        for wires_vec in variable_wires_map:
            if wires_vec:
                cyc = wires_vec + [wires_vec[0]]
                for (w0, g0), nxt in zip(cyc, cyc[1:]):
                    self.wire_permutation[w0 * n + g0] = nxt

    def _compute_extended_id_permutation(self):
        """id[i*n+j] = k_i * w^j (reference constraint_system.rs:913-931)."""
        n = self.eval_domain_n
        p = self.p
        self.k = compute_coset_representatives(p, self.num_wire_types, n)
        from ..ops.ntt import Domain
        dom = Domain(self.spec, n)
        elems = dom.elements_host
        self._domain_elements = elems
        self.extended_id_permutation = [0] * (self.num_wire_types * n)
        for i, ki in enumerate(self.k):
            for j in range(n):
                self.extended_id_permutation[i * n + j] = ki * elems[j] % p

    # -- mergeable circuits (reference constraint_system.rs:1004-1146) ----
    def finalize_for_mergeable_circuit(self, circuit_type: str):
        """circuit_type: 'A' or 'B'.  Finalize, double the domain, and for
        type B reverse the gate order so two circuits can be merged."""
        if self.ultra_plonk:
            raise CircuitError("only TurboPlonk circuits are mergeable")
        self.finalize_for_arithmetization()
        n = self.eval_domain_size()
        self.eval_domain_n = 2 * n
        self.pad_gates_unchecked(n)
        for wid in range(self.num_wire_types):
            self.wire_variables[wid] += [0] * (2 * n - len(self.wire_variables[wid]))
        W = self.num_wire_types
        if circuit_type == "A":
            new_perm = [(W, 0)] * (W * 2 * n)
            for i in range(W):
                for j in range(n):
                    new_perm[i * 2 * n + j] = self.wire_permutation[i * n + j]
            self.wire_permutation = new_perm
        elif circuit_type == "B":
            self.gates.reverse()
            for wid in range(self.num_wire_types):
                self.wire_variables[wid].reverse()
            self.pub_input_gate_ids = [2 * n - 1 - g
                                       for g in self.pub_input_gate_ids]
            new_perm = [(W, 0)] * (W * 2 * n)
            for i in range(W):
                for j in range(n):
                    (wid, gid) = self.wire_permutation[i * n + j]
                    new_perm[i * 2 * n + 2 * n - 1 - j] = (wid, 2 * n - 1 - gid)
            self.wire_permutation = new_perm
        else:
            raise CircuitError("circuit_type must be 'A' or 'B'")
        self._compute_extended_id_permutation()

    def merge(self, other: "PlonkCircuit") -> "PlonkCircuit":
        """Merge a finalized type-A circuit (self) with a type-B circuit."""
        if self.link_groups or other.link_groups:
            raise CircuitError("proof linking not supported for merged circuits")
        if self.eval_domain_size() != other.eval_domain_size():
            raise CircuitError("mismatched domain sizes")
        if self.num_inputs() != other.num_inputs():
            raise CircuitError("mismatched public input counts")
        if self.pub_input_gate_ids[0] != 0:
            raise CircuitError("first circuit is not type A")
        if other.pub_input_gate_ids[0] != other.eval_domain_size() - 1:
            raise CircuitError("second circuit is not type B")
        n = self.eval_domain_size() // 2
        W = self.num_wire_types
        merged = PlonkCircuit.__new__(PlonkCircuit)
        merged.__dict__ = {k: v for k, v in self.__dict__.items()
                           if k not in ("witness", "gates", "wire_variables",
                                        "pub_input_gate_ids",
                                        "wire_permutation", "_device_cache")}
        merged.num_vars = self.num_vars + other.num_vars
        merged.witness = list(self.witness) + list(other.witness)
        merged.pub_input_gate_ids = (list(self.pub_input_gate_ids)
                                     + list(other.pub_input_gate_ids))
        merged.gates = list(self.gates[:n]) + list(other.gates[n:])
        merged.wire_variables = [[] for _ in range(GATE_WIDTH + 2)]
        for i in range(W):
            col = list(self.wire_variables[i][:n]) + \
                [v + self.num_vars for v in other.wire_variables[i][n:]]
            merged.wire_variables[i] = col
        perm = [(0, 0)] * (W * 2 * n)
        for i in range(W):
            for j in range(n):
                perm[i * 2 * n + j] = self.wire_permutation[i * 2 * n + j]
                perm[i * 2 * n + n + j] = other.wire_permutation[i * 2 * n + n + j]
        merged.wire_permutation = perm
        merged.link_groups = {}
        merged.link_group_layouts = {}
        return merged

    # -- satisfiability check (reference constraint_system.rs:389-451) ---
    def check_gate(self, gate_id: int, pub_input: int):
        p = self.p
        w = [self.witness[self.wire_variables[i][gate_id]] for i in range(GATE_WIDTH + 1)]
        g = self.gates[gate_id]
        expected = (pub_input + g.q_c
                    + sum(g.q_lc[i] * w[i] for i in range(4))
                    + g.q_mul[0] * w[0] * w[1] + g.q_mul[1] * w[2] * w[3]
                    + g.q_ecc * w[0] * w[1] * w[2] * w[3] * w[4]
                    + sum(g.q_hash[i] * pow(w[i], 5, p) for i in range(4))) % p
        out = g.q_o * w[4] % p
        if expected != out:
            raise CircuitError(
                f"gate {gate_id} ({g.name}) unsatisfied: {expected} != {out}")

    def check_circuit_satisfiability(self, pub_input):
        if len(pub_input) != self.num_inputs():
            raise CircuitError("public input length mismatch")
        for i, gid in enumerate(self.pub_input_gate_ids):
            self.check_gate(gid, pub_input[i] % self.p)
        io_set = set(self.pub_input_gate_ids)
        for gid in range(self.num_gates()):
            if gid not in io_set:
                self.check_gate(gid, 0)
        if self.ultra_plonk:
            self._check_lookup_gates()

    def _check_lookup_gates(self):
        p = self.p
        rs = self.range_size()
        for var in self.wire_variables[RANGE_WIRE_ID]:
            if self.witness[var] >= rs:
                raise CircuitError(f"range gate failed: {self.witness[var]} >= {rs}")
        table = {(0, 0, 0, 0)}
        for gid, g in enumerate(self.gates):
            if g.q_lookup != 0:
                v0 = self.witness[self._wire_variable(TABLE_VAL_1_WIRE_ID, gid)]
                v1 = self.witness[self._wire_variable(TABLE_VAL_2_WIRE_ID, gid)]
                table.add((g.table_dom_sep, g.table_key, v0, v1))
        for gid, g in enumerate(self.gates):
            if g.q_lookup != 0:
                key = self.witness[self._wire_variable(LOOKUP_KEY_WIRE_ID, gid)]
                v0 = self.witness[self._wire_variable(LOOKUP_VAL_1_WIRE_ID, gid)]
                v1 = self.witness[self._wire_variable(LOOKUP_VAL_2_WIRE_ID, gid)]
                if (g.q_dom_sep, key, v0, v1) not in table:
                    raise CircuitError(f"lookup gate {gid} failed")

    def _wire_variable(self, i, j):
        return self.wire_variables[i][j] if j < len(self.wire_variables[i]) else 0

    # -- arithmetization accessors (host vectors) ------------------------
    def all_selectors(self) -> list:
        """Order: q_lc x4, q_mul x2, q_hash x4, q_o, q_c, q_ecc, [q_lookup]
        (reference constraint_system.rs:890-905)."""
        cols = []
        for i in range(4):
            cols.append([g.q_lc[i] for g in self.gates])
        for i in range(2):
            cols.append([g.q_mul[i] for g in self.gates])
        for i in range(4):
            cols.append([g.q_hash[i] for g in self.gates])
        cols.append([g.q_o for g in self.gates])
        cols.append([g.q_c for g in self.gates])
        cols.append([g.q_ecc for g in self.gates])
        if self.ultra_plonk:
            cols.append([g.q_lookup for g in self.gates])
        return cols

    def extended_permutation(self) -> list:
        """sigma values: num_wire_types vectors of length n
        (reference constraint_system.rs:934-960)."""
        n = self.eval_domain_n
        out = []
        for i in range(self.num_wire_types):
            row = []
            for j in range(n):
                (wi, gi) = self.wire_permutation[i * n + j]
                row.append(self.extended_id_permutation[wi * n + gi]
                           if wi < self.num_wire_types else 0)
            out.append(row)
        return out

    def wire_values(self) -> list:
        """Witness value per wire column (evaluations, pre-iFFT)."""
        return [[self.witness[v] for v in self.wire_variables[i]]
                for i in range(self.num_wire_types)]

    def pub_input_vector(self) -> list:
        n = self.eval_domain_n
        vec = [0] * n
        for gid in self.pub_input_gate_ids:
            vec[gid] = self.witness[self.wire_variables[GATE_WIDTH][gid]]
        return vec

    # UltraPlonk table vectors
    def range_table_vector(self) -> list:
        n = self.eval_domain_n
        t = list(range(self.range_size())) + [0] * (n - self.range_size())
        return t

    def key_table_vector(self) -> list:
        return [g.table_key for g in self.gates]

    def table_dom_sep_vector(self) -> list:
        return [g.table_dom_sep for g in self.gates]

    def q_dom_sep_vector(self) -> list:
        return [g.q_dom_sep for g in self.gates]

    def q_lookup_vector(self) -> list:
        return [g.q_lookup for g in self.gates]

    # -- Plookup per-proof vectors (host; reference constraint_system.rs
    #    :1290-1417 and structs.rs eval_merged_*) ------------------------
    def merged_lookup_table(self, tau: int) -> list:
        """t_i = range_i + q_lookup_i * tau * (dom + tau(key + tau(w3 + tau w4)))."""
        p = self.p
        n = self.eval_domain_size()
        rt = self.range_table_vector()
        out = []
        for i in range(n):
            g = self.gates[i]
            if g.q_lookup:
                w3 = self.witness[self._wire_variable(TABLE_VAL_1_WIRE_ID, i)]
                w4 = self.witness[self._wire_variable(TABLE_VAL_2_WIRE_ID, i)]
                v = (rt[i] + g.q_lookup * tau
                     * (g.table_dom_sep + tau * (g.table_key + tau * (w3 + tau * w4)))) % p
            else:
                v = rt[i] % p
            out.append(v)
        return out

    def merged_lookup_wire_values(self, tau: int) -> list:
        """lw_i = w5_i + q_lookup_i * tau * (q_dom + tau(w0 + tau(w1 + tau w2)))."""
        p = self.p
        n = self.eval_domain_size()
        out = []
        for i in range(n):
            g = self.gates[i]
            w5 = self.witness[self._wire_variable(RANGE_WIRE_ID, i)]
            if g.q_lookup:
                w0 = self.witness[self._wire_variable(LOOKUP_KEY_WIRE_ID, i)]
                w1 = self.witness[self._wire_variable(LOOKUP_VAL_1_WIRE_ID, i)]
                w2 = self.witness[self._wire_variable(LOOKUP_VAL_2_WIRE_ID, i)]
                v = (w5 + g.q_lookup * tau
                     * (g.q_dom_sep + tau * (w0 + tau * (w1 + tau * w2)))) % p
            else:
                v = w5 % p
            out.append(v)
        return out

    def lookup_sorted_indices(self, merged_table: list, lookups: list) -> list:
        """Index form of `lookup_sorted_vec`: positions INTO merged_table
        whose gather reproduces the sorted vector (len 2n-1).  The merged
        values arrive as plain ints (computed on device by the prover:
        `Prover.plookup_merge`); this does only hashing/counting — no field
        math — so round 1.5 stays off the host bigint path."""
        n = self.eval_domain_size()
        counts = {}
        for v in lookups[:n - 1]:
            counts[v] = counts.get(v, 0) + 1
        idx = []
        for i, t in enumerate(merged_table):
            if t in counts:
                idx.extend([i] * (1 + counts.pop(t)))
            else:
                idx.append(i)
        if len(idx) != 2 * n - 1:
            raise CircuitError(
                "lookup variable outside the table (sorted vector length mismatch)")
        return idx

    def lookup_sorted_vec(self, tau: int, merged_table: list) -> list:
        """Sorted concatenation of lookups and table, ordered by the table
        (reference constraint_system.rs:1370-1417).  Length 2n-1."""
        n = self.eval_domain_size()
        lookups = self.merged_lookup_wire_values(tau)[:n - 1]
        counts = {}
        for v in lookups:
            counts[v] = counts.get(v, 0) + 1
        sorted_vec = []
        for t in merged_table:
            if t in counts:
                sorted_vec.extend([t] * (1 + counts.pop(t)))
            else:
                sorted_vec.append(t)
        if len(sorted_vec) != 2 * n - 1:
            raise CircuitError(
                "lookup variable outside the table (sorted vector length mismatch)")
        return sorted_vec
