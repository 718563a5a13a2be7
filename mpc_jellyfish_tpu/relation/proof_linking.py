"""Proof-linking layout types and placement (reference `relation/src/proof_linking/`).

A link group is an ordered set of witness elements that must equal the
corresponding group of another proof.  Groups are placed on 2^alignment-th
roots of unity in the trace as `ProofLinkingGate`s (a(x)*0 = 0) on wire
`PROOF_LINK_WIRE_IDX`, so the wire-0 polynomials of two proofs agree on the
group subdomain (proof_linking/mod.rs:18-116, linkable_circuit.rs).
"""

from __future__ import annotations

from dataclasses import dataclass

# The wire index into which proof-linking gates place linked witnesses
# (reference linkable_circuit.rs:23).
PROOF_LINK_WIRE_IDX = 0


@dataclass(frozen=True)
class GroupLayout:
    """Placement on the 2^alignment-th roots of unity
    (reference proof_linking/mod.rs:18-55)."""
    alignment: int
    offset: int
    size: int

    def range_in_nth_roots(self, n: int):
        """Inclusive trace range when embedded in the 2^n-th roots."""
        assert n >= self.alignment
        spacing = 1 << (n - self.alignment)
        start = self.offset * spacing
        end = start + max(self.size - 1, 0) * spacing
        return (start, end)

    def domain_generator(self, spec) -> int:
        """Generator of the 2^alignment-th roots of unity in spec's field."""
        return spec.nth_root(1 << self.alignment)


@dataclass
class CircuitLayout:
    """Full circuit layout (reference proof_linking/mod.rs:58-116)."""
    n_inputs: int
    n_gates: int
    group_layouts: dict  # id -> GroupLayout

    def circuit_size(self) -> int:
        max_alignment = max((l.alignment for l in self.group_layouts.values()),
                            default=1)
        link_gates = sum(l.size for l in self.group_layouts.values())
        gates = max(self.n_gates + link_gates, 2)
        gates = 1 << (gates - 1).bit_length()
        return max(gates, 1 << max_alignment)

    def circuit_alignment(self) -> int:
        return self.circuit_size().bit_length() - 1

    def sorted_groups_iter(self):
        align = max((l.alignment for l in self.group_layouts.values()),
                    default=1)
        return sorted(self.group_layouts.items(),
                      key=lambda kv: kv[1].range_in_nth_roots(align))


def place_group_with_alignment(size, n_inputs, alignment, group_id,
                               placed_groups) -> bool:
    """First-fit placement in the gaps between already-placed groups
    (reference linkable_circuit.rs:242-291)."""
    placed_ranges = sorted(l.range_in_nth_roots(alignment)
                           for (_, l) in placed_groups)
    offset = n_inputs
    curr = 0
    while curr < len(placed_ranges):
        start, end = placed_ranges[curr]
        if offset + size <= start:
            placed_groups.insert(
                curr, (group_id, GroupLayout(alignment, offset, size)))
            return True
        offset = end + 1
        curr += 1
    if offset + size < (1 << alignment):
        placed_groups.append((group_id, GroupLayout(alignment, offset, size)))
        return True
    return False


def validate_layout(num_inputs: int, layout: CircuitLayout):
    """reference linkable_circuit.rs:352-398."""
    n = layout.circuit_alignment()
    for gid, gl in layout.group_layouts.items():
        if gl.size == 0:
            raise ValueError(f"link group {gid} is empty")
        if gl.offset + gl.size >= (1 << gl.alignment):
            raise ValueError(f"link group {gid} exceeds its alignment")
        start, _ = gl.range_in_nth_roots(n)
        if start < num_inputs:
            raise ValueError(f"link group {gid} would mangle public inputs")
    srt = list(layout.sorted_groups_iter())
    for (id1, l1), (id2, l2) in zip(srt, srt[1:]):
        s1, e1 = l1.range_in_nth_roots(n)
        s2, e2 = l2.range_in_nth_roots(n)
        if max(s1, s2) <= min(e1, e2):
            raise ValueError(f"link groups {id1} and {id2} overlap")
