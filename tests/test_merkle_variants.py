"""Light-weight / hasher / namespaced Merkle trees.

Mirrors the reference's `light_weight.rs` tests (frontier tree commitment ==
full tree commitment), `merkle_tree_hasher.rs` integration test, and the
`namespaced_merkle_tree` presence/absence proof tests."""

import random

from mpc_jellyfish_tpu.curves import BN254
from mpc_jellyfish_tpu.primitives.merkle import RescueMerkleTree
from mpc_jellyfish_tpu.primitives.merkle_variants import (HasherMerkleTree,
                                                          LightWeightMerkleTree,
                                                          NMT)

FR = BN254.fr
rng = random.Random(12)


def test_light_weight_matches_full_tree():
    for n in (1, 2, 3, 7, 9, 20, 27):
        elems = [rng.randrange(FR.p) for _ in range(n)]
        full = RescueMerkleTree.from_elems(FR, 3, elems)
        light = LightWeightMerkleTree.from_elems(FR, 3, elems)
        assert light.commitment() == full.commitment(), n
    # capacity check
    t = LightWeightMerkleTree(FR, 1)
    t.extend([1, 2, 3])
    try:
        t.push(4)
        assert False, "over-capacity push accepted"
    except ValueError:
        pass


def test_hasher_tree_roundtrip():
    data = list(range(1, 10))
    t = HasherMerkleTree.from_elems(2, data)
    root = t.commitment()
    for pos in (0, 4, 8):
        proof = t.lookup(pos)
        assert t.verify(root, pos, proof)
        assert not t.verify(root, pos + 1 if pos < 8 else 0, proof)
    bad = t.lookup(2)
    bad.elem = (99).to_bytes(8, "little")
    assert not t.verify(root, 2, bad)


def test_nmt_presence_and_absence():
    elems = [(1, 10), (1, 11), (3, 30), (3, 31), (3, 32), (7, 70)]
    t = NMT.from_elems(3, elems)
    root = t.commitment()
    assert root.min_ns == 1 and root.max_ns == 7

    for ns, count in ((1, 2), (3, 3), (7, 1)):
        proof = t.get_namespace_proof(ns)
        assert proof.is_presence and len(proof.leaves) == count
        assert t.verify_namespace_proof(proof, ns)
        # a presence proof for one namespace must not verify for another
        assert not t.verify_namespace_proof(proof, ns + 1)

    for missing in (0, 2, 5, 9):
        proof = t.get_namespace_proof(missing)
        assert not proof.is_presence and not proof.leaves
        assert t.verify_namespace_proof(proof, missing), missing

    # incomplete presence proof rejected
    proof = t.get_namespace_proof(3)
    proof.leaves = proof.leaves[:-1]
    assert not t.verify_namespace_proof(proof, 3)

    # unsorted construction rejected
    try:
        NMT.from_elems(2, [(3, 1), (1, 2)])
        assert False, "unsorted NMT accepted"
    except ValueError:
        pass
