"""Merkle tree variants: light-weight, arbitrary-hasher, and namespaced.

Mirrors the remaining reference `merkle_tree/` family members:
* `LightWeightMerkleTree` (light_weight.rs:32): append-only Rescue tree that
  forgets everything except the current frontier — O(height) state, same
  commitment as the full tree.
* `HasherMerkleTree` (hasher.rs:62-177): 3-ary tree over an arbitrary
  byte-oriented hash (SHA3-256 default); digest_leaf = H(pos || elem),
  digest = H(child0 || child1 || child2).
* `NMT` (namespaced_merkle_tree/): 3-ary SHA3 tree whose nodes carry
  (min_namespace, max_namespace) ranges; supports namespace
  presence/absence proofs with boundary checks (proof.rs:29-250).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from ..ops.field import FieldSpec
from .merkle import ARITY, MerkleCommitment
from .rescue import RescueCRHF


# ---------------------------------------------------------------------------
# Light-weight (frontier-only) Rescue tree
# ---------------------------------------------------------------------------

class LightWeightMerkleTree:
    """Append-only 3-ary Rescue tree retaining only the frontier
    (light_weight.rs:32-63): per level, the digests of completed sibling
    groups are folded as soon as the group fills, so state is O(height)."""

    def __init__(self, spec: FieldSpec, height: int):
        self.spec = spec
        self.height = height
        self.capacity = ARITY ** height
        self.crhf = RescueCRHF(spec)
        self.num_leaves = 0
        # per level: list of up to ARITY-1 pending child digests
        self._pending = [[] for _ in range(height)]
        self._root = None        # set when the tree fills completely
        self._last_leaf = None

    @classmethod
    def from_elems(cls, spec: FieldSpec, height: int, elems
                   ) -> "LightWeightMerkleTree":
        t = cls(spec, height)
        t.extend(elems)
        return t

    def _h3(self, vals):
        return self.crhf.sponge_no_padding(list(vals), 1)[0]

    def push(self, elem: int):
        """light_weight.rs:40-44."""
        if self.num_leaves >= self.capacity:
            raise ValueError("exceed merkle tree capacity")
        digest = self._h3([0, self.num_leaves, elem % self.spec.p])
        self._last_leaf = (self.num_leaves, elem % self.spec.p)
        self.num_leaves += 1
        lvl = 0
        while lvl < self.height:
            self._pending[lvl].append(digest)
            if len(self._pending[lvl]) < ARITY:
                return
            digest = self._h3(self._pending[lvl])
            self._pending[lvl] = []
            lvl += 1
        self._root = digest      # tree completely full

    def extend(self, elems):
        for e in elems:
            self.push(e)

    def commitment(self) -> MerkleCommitment:
        """Fold the frontier up with zero padding (matches the full
        append-only tree's root)."""
        if self._root is not None:
            return MerkleCommitment(digest=self._root, height=self.height,
                                    num_leaves=self.num_leaves)
        digest = 0
        carry_empty = True
        for lvl in range(self.height):
            group = list(self._pending[lvl])
            if not carry_empty:
                group.append(digest)
            if group:
                group += [0] * (ARITY - len(group))
                digest = self._h3(group)
                carry_empty = False
        return MerkleCommitment(digest=digest if not carry_empty else 0,
                                height=self.height,
                                num_leaves=self.num_leaves)


# ---------------------------------------------------------------------------
# Arbitrary-hasher tree (SHA3-256 default)
# ---------------------------------------------------------------------------

@dataclass
class HasherMerkleProof:
    pos: int
    elem: bytes
    path: list       # [(branch, [sibling digests])], leaf -> root


def _to_bytes(elem) -> bytes:
    if isinstance(elem, bytes):
        return elem
    return int(elem).to_bytes(8, "little")     # u64 CanonicalSerialize


class HasherMerkleTree:
    """3-ary tree over a byte hash (hasher.rs:62-177)."""

    def __init__(self, height: int, hash_name: str = "sha3_256"):
        self.height = height
        self.hash_name = hash_name
        self.leaves: list = []
        self._levels = None

    @classmethod
    def from_elems(cls, height: int, elems, hash_name: str = "sha3_256"
                   ) -> "HasherMerkleTree":
        t = cls(height, hash_name)
        t.leaves = [_to_bytes(e) for e in elems]
        if len(t.leaves) > ARITY ** height:
            raise ValueError("exceed merkle tree capacity")
        t._build()
        return t

    def _h(self, data: bytes) -> bytes:
        return hashlib.new(self.hash_name, data).digest()

    def _digest_leaf(self, pos: int, elem: bytes) -> bytes:
        return self._h(pos.to_bytes(8, "little") + elem)

    def _build(self):
        zero = bytes(hashlib.new(self.hash_name).digest_size)
        level = [self._digest_leaf(i, e) for i, e in enumerate(self.leaves)]
        levels = [list(level)]
        for _ in range(self.height):
            level += [zero] * ((-len(level)) % ARITY)
            level = [self._h(b"".join(level[i:i + ARITY]))
                     for i in range(0, len(level), ARITY)] or [zero]
            levels.append(list(level))
        self._levels = levels

    def commitment(self) -> bytes:
        return self._levels[-1][0] if self._levels[-1] else b""

    def lookup(self, pos: int) -> HasherMerkleProof:
        zero = bytes(hashlib.new(self.hash_name).digest_size)
        path = []
        idx = pos
        for lvl in range(self.height):
            level = self._levels[lvl]
            base = (idx // ARITY) * ARITY
            sibs = [level[base + j] if base + j < len(level) else zero
                    for j in range(ARITY) if j != idx % ARITY]
            path.append((idx % ARITY, sibs))
            idx //= ARITY
        return HasherMerkleProof(pos=pos, elem=self.leaves[pos], path=path)

    def verify(self, root: bytes, pos: int, proof: HasherMerkleProof) -> bool:
        if proof.pos != pos:
            return False
        cur = self._digest_leaf(pos, proof.elem)
        for (branch, sibs) in proof.path:
            trip = list(sibs[:branch]) + [cur] + list(sibs[branch:])
            cur = self._h(b"".join(trip))
        return cur == root


# ---------------------------------------------------------------------------
# Namespaced Merkle tree (NMT)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class NamespacedHash:
    """hash.rs:34-57: (min_namespace, max_namespace, hash)."""
    min_ns: int
    max_ns: int
    hash: bytes

    def to_bytes(self) -> bytes:
        return (self.min_ns.to_bytes(8, "little")
                + self.max_ns.to_bytes(8, "little") + self.hash)


@dataclass
class NamespaceProof:
    """proof.rs:29-50 (naive proof: all leaves of the namespace plus
    boundary proofs)."""
    is_presence: bool
    leaves: list                 # [(pos, elem, ns, HasherMerkleProof-path)]
    first_index: int
    left_boundary: tuple | None   # (pos, elem, ns, path)
    right_boundary: tuple | None


_SHA3_ZERO = bytes(32)
_EMPTY_NS_HASH = NamespacedHash(0, 0, _SHA3_ZERO)


class NMT:
    """3-ary namespaced Merkle tree over SHA3-256
    (namespaced_merkle_tree/mod.rs:133-357).  Leaves are (namespace, elem)
    pairs appended in namespace-sorted order."""

    def __init__(self, height: int):
        self.height = height
        self.leaves: list = []      # [(ns, elem_bytes)]
        self._levels = None

    @classmethod
    def from_elems(cls, height: int, elems) -> "NMT":
        t = cls(height)
        last_ns = None
        for ns, e in elems:
            if last_ns is not None and ns < last_ns:
                raise ValueError("NMT leaves must be namespace-sorted")
            last_ns = ns
            t.leaves.append((ns, _to_bytes(e)))
        if len(t.leaves) > ARITY ** height:
            raise ValueError("exceed merkle tree capacity")
        t._build()
        return t

    @staticmethod
    def _h(data: bytes) -> bytes:
        return hashlib.sha3_256(data).digest()

    def _digest_leaf(self, pos: int, ns: int, elem: bytes) -> NamespacedHash:
        h = self._h(pos.to_bytes(8, "little") + ns.to_bytes(8, "little")
                    + elem)
        return NamespacedHash(ns, ns, h)

    def _digest_children(self, children) -> NamespacedHash:
        """hash.rs:76-103: skip empty children, require sorted ranges, bind
        each child as H(min||max||hash)."""
        live = [c for c in children if c != _EMPTY_NS_HASH]
        if not live:
            return _EMPTY_NS_HASH
        min_ns = live[0].min_ns
        max_ns = live[0].max_ns
        bound = [self._h(live[0].to_bytes())]
        for c in live[1:]:
            if c.min_ns < max_ns:
                raise ValueError("NMT leaves out of order")
            max_ns = c.max_ns
            bound.append(self._h(c.to_bytes()))
        return NamespacedHash(min_ns, max_ns, self._h(b"".join(bound)))

    def _build(self):
        level = [self._digest_leaf(i, ns, e)
                 for i, (ns, e) in enumerate(self.leaves)]
        levels = [list(level)]
        for _ in range(self.height):
            level = level + [_EMPTY_NS_HASH] * ((-len(level)) % ARITY)
            level = [self._digest_children(level[i:i + ARITY])
                     for i in range(0, len(level), ARITY)] or [_EMPTY_NS_HASH]
            levels.append(list(level))
        self._levels = levels

    def commitment(self) -> NamespacedHash:
        return self._levels[-1][0]

    def _leaf_proof(self, pos: int):
        path = []
        idx = pos
        for lvl in range(self.height):
            level = self._levels[lvl]
            base = (idx // ARITY) * ARITY
            sibs = [level[base + j] if base + j < len(level)
                    else _EMPTY_NS_HASH
                    for j in range(ARITY) if j != idx % ARITY]
            path.append((idx % ARITY, sibs))
            idx //= ARITY
        ns, elem = self.leaves[pos]
        return (pos, elem, ns, path)

    def verify_leaf(self, root: NamespacedHash, pos: int, elem: bytes,
                    ns: int, path) -> bool:
        cur = self._digest_leaf(pos, ns, elem)
        for (branch, sibs) in path:
            trip = list(sibs[:branch]) + [cur] + list(sibs[branch:])
            try:
                cur = self._digest_children(trip)
            except ValueError:
                return False
        return cur == root

    def get_namespace_proof(self, namespace: int) -> NamespaceProof:
        """mod.rs:300-350."""
        idxs = [i for i, (ns, _) in enumerate(self.leaves) if ns == namespace]
        if idxs:
            first = idxs[0]
            return NamespaceProof(
                is_presence=True,
                leaves=[self._leaf_proof(i) for i in idxs],
                first_index=first,
                left_boundary=self._leaf_proof(first - 1) if first else None,
                right_boundary=(self._leaf_proof(idxs[-1] + 1)
                                if idxs[-1] + 1 < len(self.leaves) else None),
            )
        # absence proof: boundary leaves around where the namespace would be
        left = right = None
        for i, (ns, _) in enumerate(self.leaves):
            if ns < namespace:
                left = i
            elif ns > namespace and right is None:
                right = i
        return NamespaceProof(
            is_presence=False, leaves=[],
            first_index=right if right is not None else len(self.leaves),
            left_boundary=self._leaf_proof(left) if left is not None else None,
            right_boundary=(self._leaf_proof(right)
                            if right is not None else None),
        )

    def verify_namespace_proof(self, proof: NamespaceProof, namespace: int
                               ) -> bool:
        """proof.rs:70-250: verify every leaf, then the boundary conditions
        (completeness)."""
        root = self.commitment()
        for (pos, elem, ns, path) in proof.leaves:
            if ns != namespace:
                return False
            if not self.verify_leaf(root, pos, elem, ns, path):
                return False
        if proof.is_presence:
            poss = [p for (p, _, _, _) in proof.leaves]
            if poss != list(range(proof.first_index,
                                  proof.first_index + len(poss))):
                return False
        # left boundary: namespace of leaf first_index-1 must be < namespace
        lb = proof.left_boundary
        if lb is not None:
            pos, elem, ns, path = lb
            if ns >= namespace or not self.verify_leaf(root, pos, elem, ns,
                                                       path):
                return False
            if proof.is_presence and pos != proof.first_index - 1:
                return False
        elif root.min_ns != namespace and proof.is_presence:
            return False
        elif not proof.is_presence and root.min_ns < namespace \
                and root != _EMPTY_NS_HASH:
            return False
        # right boundary
        rb = proof.right_boundary
        last = proof.first_index + len(proof.leaves) - 1
        if rb is not None:
            pos, elem, ns, path = rb
            if ns <= namespace or not self.verify_leaf(root, pos, elem, ns,
                                                       path):
                return False
            if proof.is_presence and pos != last + 1:
                return False
        elif root.max_ns != namespace and proof.is_presence:
            return False
        elif not proof.is_presence and root.max_ns > namespace \
                and root != _EMPTY_NS_HASH:
            return False
        return True
