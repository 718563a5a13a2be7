"""In-circuit 3-ary Rescue Merkle membership / non-membership gadgets.

Mirror of `primitives/src/circuit/merkle_tree/mod.rs:69-520` and
`universal_merkle_tree.rs`: the path is a list of (sibling1, sibling2,
is_left, is_right) node variables; each level reorders the running label into
its slot with two muxes + one lc (constrain_sibling_order, mod.rs:206-220),
then hashes the ordered triple with the Rescue sponge gadget.  Leaf label =
H(0, pos, elem) (RescueDigestGadget::digest_leaf, mod.rs:278-286).
"""

from __future__ import annotations

from ...relation.circuit import PlonkCircuit, BoolVar, CircuitError
from ..merkle import ARITY, MerkleProof
from .rescue import rescue_sponge_no_padding


class Merkle3AryNodeVar:
    """mod.rs:224-234."""

    __slots__ = ("sibling1", "sibling2", "is_left_child", "is_right_child")

    def __init__(self, sibling1, sibling2, is_left_child, is_right_child):
        self.sibling1 = sibling1
        self.sibling2 = sibling2
        self.is_left_child = is_left_child
        self.is_right_child = is_right_child


class Merkle3AryMembershipProofVar:
    """mod.rs:250-254."""

    __slots__ = ("node_vars", "elem_var")

    def __init__(self, node_vars, elem_var):
        self.node_vars = node_vars
        self.elem_var = elem_var


class Merkle3AryNonMembershipProofVar:
    """mod.rs:240-244."""

    __slots__ = ("node_vars", "pos_var")

    def __init__(self, node_vars, pos_var):
        self.node_vars = node_vars
        self.pos_var = pos_var


def _digest(cs: PlonkCircuit, data):
    return rescue_sponge_no_padding(cs, data, 1)[0]


def _digest_leaf(cs: PlonkCircuit, pos_var, elem_var):
    return _digest(cs, [cs.zero(), pos_var, elem_var])


def constrain_sibling_order(cs: PlonkCircuit, node, sib1, sib2,
                            node_is_left: BoolVar, node_is_right: BoolVar):
    """Order (node, sib1, sib2) into tree order (mod.rs:206-220)."""
    left = cs.mux(node_is_left, node, sib1)
    right = cs.mux(node_is_right, node, sib2)
    lpr = cs.add(left, right)
    mid = cs.lc([node, sib1, sib2, lpr], [1, 1, 1, -1])
    return [left, mid, right]


def _path_node_vars(cs: PlonkCircuit, proof: MerkleProof):
    """Create (and boolean-constrain) the per-level node variables
    (mod.rs:337-384)."""
    nodes = []
    for (branch, sibs) in proof.path:
        if len(sibs) != ARITY - 1:
            raise CircuitError("malformed Merkle path")
        node = Merkle3AryNodeVar(
            sibling1=cs.create_variable(sibs[0]),
            sibling2=cs.create_variable(sibs[1]),
            is_left_child=cs.create_boolean_variable(branch == 0),
            is_right_child=cs.create_boolean_variable(branch == 2),
        )
        nodes.append(node)
    for node in nodes:
        lpr = cs.add(int(node.is_left_child), int(node.is_right_child))
        cs.enforce_bool(lpr)
    return nodes


def create_membership_proof_variable(cs: PlonkCircuit, proof: MerkleProof
                                     ) -> Merkle3AryMembershipProofVar:
    if proof.elem is None:
        raise CircuitError("proof has no leaf element")
    elem_var = cs.create_variable(proof.elem)
    return Merkle3AryMembershipProofVar(_path_node_vars(cs, proof), elem_var)


def create_root_variable(cs: PlonkCircuit, root: int) -> int:
    return cs.create_variable(root)


def _compute_root(cs: PlonkCircuit, elem_idx_var, proof_var):
    cur = _digest_leaf(cs, elem_idx_var, proof_var.elem_var)
    for node in proof_var.node_vars:
        ordered = constrain_sibling_order(cs, cur, node.sibling1,
                                          node.sibling2, node.is_left_child,
                                          node.is_right_child)
        # the left child's label must be non-zero (mod.rs:419)
        cs.non_zero_gate(ordered[0])
        cur = _digest(cs, ordered)
    return cur


def is_member(cs: PlonkCircuit, elem_idx_var: int,
              proof_var: Merkle3AryMembershipProofVar,
              root_var: int) -> BoolVar:
    """mod.rs:396-426."""
    computed = _compute_root(cs, elem_idx_var, proof_var)
    return cs.is_equal(root_var, computed)


def enforce_membership_proof(cs: PlonkCircuit, elem_idx_var: int,
                             proof_var: Merkle3AryMembershipProofVar,
                             expected_root_var: int):
    """mod.rs:428-437."""
    b = is_member(cs, elem_idx_var, proof_var, expected_root_var)
    cs.enforce_true(b)


# -- universal (non-membership) gadget (universal_merkle_tree.rs) -------------

def create_non_membership_proof_variable(cs: PlonkCircuit, pos: int,
                                         proof: MerkleProof
                                         ) -> Merkle3AryNonMembershipProofVar:
    """Like the reference (universal_merkle_tree.rs:74-99, which keeps only
    Branch nodes), the all-empty prefix of the path is dropped: the native
    verifier collapses all-zero triples to the 0 sentinel, so those levels
    hash nothing."""
    pos_var = cs.create_variable(pos)
    skip = 0
    for (_branch, sibs) in proof.path:
        if any(s != 0 for s in sibs):
            break
        skip += 1
    trimmed = MerkleProof(pos=proof.pos, elem=proof.elem,
                          path=proof.path[skip:])
    return Merkle3AryNonMembershipProofVar(_path_node_vars(cs, trimmed),
                                           pos_var)


def _compute_root_non_member(cs: PlonkCircuit, proof_var):
    """Empty-leaf root recomputation: the missing slot's label is 0
    (universal_merkle_tree.rs:44-60)."""
    cur = cs.zero()
    for node in proof_var.node_vars:
        ordered = constrain_sibling_order(cs, cur, node.sibling1,
                                          node.sibling2, node.is_left_child,
                                          node.is_right_child)
        # the left child's label must be non-zero (:56)
        cs.non_zero_gate(ordered[0])
        cur = _digest(cs, ordered)
    return cur


def is_non_member(cs: PlonkCircuit, non_elem_idx_var: int,
                  proof_var: Merkle3AryNonMembershipProofVar,
                  root_var: int) -> BoolVar:
    """universal_merkle_tree.rs:35-62."""
    cs.enforce_equal(proof_var.pos_var, non_elem_idx_var)
    computed = _compute_root_non_member(cs, proof_var)
    return cs.is_equal(root_var, computed)


def enforce_non_membership_proof(cs: PlonkCircuit, non_elem_idx_var: int,
                                 proof_var: Merkle3AryNonMembershipProofVar,
                                 expected_root_var: int):
    b = is_non_member(cs, non_elem_idx_var, proof_var, expected_root_var)
    cs.enforce_true(b)


for _f in (constrain_sibling_order, create_membership_proof_variable,
           create_root_variable, is_member, enforce_membership_proof,
           create_non_membership_proof_variable, is_non_member,
           enforce_non_membership_proof):
    setattr(PlonkCircuit, _f.__name__, _f)
