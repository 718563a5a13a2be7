"""VRF and VDF primitives.

Mirror of `primitives/src/vrf/` (BLS-based VRF, blsvrf.rs:30) and
`primitives/src/vdf/minroot.rs:37-121` (MinRoot delay function).

ECVRF parity note: the reference's `vrf/ecvrf.rs` is a one-line
"Place holder for ECVRF" with no implementation; this module mirrors that
state of the API surface (BLS VRF is the implemented variant in both).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..curves import BN254
from ..utils.keccak import keccak256
from ..utils.serialize import g1_to_bytes
from .signatures import BLSOverBN254


class BLSVRF:
    """VRF from unique BLS signatures: proof = sig, output = H(sig)
    (reference vrf/blsvrf.rs)."""

    def __init__(self):
        self.bls = BLSOverBN254()

    def key_gen(self, rng):
        return self.bls.key_gen(rng)

    def prove(self, sk: int, msg: bytes):
        sig = self.bls.sign(sk, msg)
        return sig

    def proof_to_hash(self, proof) -> bytes:
        return keccak256(g1_to_bytes(BN254, proof))

    def evaluate(self, sk: int, msg: bytes):
        proof = self.prove(sk, msg)
        return proof, self.proof_to_hash(proof)

    def verify(self, vk, msg: bytes, proof, output: bytes) -> bool:
        if not self.bls.verify(vk, msg, proof):
            return False
        return self.proof_to_hash(proof) == output


@dataclass(frozen=True)
class MinRootElement:
    x: int
    y: int


class MinRoot:
    """MinRoot VDF over a field where gcd(5, p-1) = 1
    (minroot.rs: x' = (x + y)^(1/5), y' = x + round)."""

    def __init__(self, p: int | None = None):
        self.p = BN254.fr.p if p is None else p
        assert (self.p - 1) % 5 != 0, "x^5 must be a bijection"
        self.exp = pow(5, -1, self.p - 1)

    def setup(self, difficulty: int):
        return difficulty

    def eval(self, difficulty: int, inp: MinRootElement):
        x, y = inp.x % self.p, inp.y % self.p
        for i in range(difficulty):
            x, y = pow((x + y) % self.p, self.exp, self.p), (x + i) % self.p
        out = MinRootElement(x, y)
        return out, out

    def verify(self, difficulty: int, inp: MinRootElement,
               output: MinRootElement, proof: MinRootElement) -> bool:
        return proof == output
