"""Proof-linking layout types (reference `relation/src/proof_linking/`).

Round-1 scope: the layout/group types and the wire-index constant consumed by
`prove_with_link_hint`.  The full link-group placement (`generate_layout` /
`apply_layout`, linkable_circuit.rs:26+) and the linking argument itself
(plonk proof_linking.rs) land with the proof-linking milestone.
"""

from __future__ import annotations

from dataclasses import dataclass

# The wire index into which proof-linking gates place linked witnesses
# (reference linkable_circuit.rs:23).
PROOF_LINK_WIRE_IDX = 0


@dataclass(frozen=True)
class GroupLayout:
    """Placement of a link group on a 2^alignment-th roots-of-unity subdomain
    (reference proof_linking/mod.rs:18-55)."""
    alignment: int    # the group is laid out on 2^alignment-th roots of unity
    offset: int       # offset (in the subdomain) of the first group element
    size: int         # number of witness elements in the group

    def range_in_domain(self, domain_log2: int):
        """Indices in the full domain: spacing 2^(domain_log2 - alignment)."""
        spacing = 1 << (domain_log2 - self.alignment)
        start = self.offset * spacing
        return [start + i * spacing for i in range(self.size)]


@dataclass
class CircuitLayout:
    """Full circuit layout (reference proof_linking/mod.rs:58-70)."""
    num_inputs: int
    num_gates: int
    group_layouts: dict  # id -> GroupLayout

    def circuit_size(self) -> int:
        n = max(self.num_gates, 2)
        return 1 << (n - 1).bit_length()
