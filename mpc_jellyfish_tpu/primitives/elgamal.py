"""ElGamal hybrid encryption over a TE curve with a Rescue symmetric layer.

Mirror of `primitives/src/elgamal.rs:43-118`: KEM = TE-curve Diffie-Hellman,
DEM = Rescue sponge in counter mode + Rescue-based key derivation.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..curves import BN254
from ..utils.te_curve import BABY_JUBJUB, TECurve
from .rescue import RescueParams


@dataclass
class ElGamalCiphertext:
    ephemeral: tuple      # r*G
    data: list            # field elements


class ElGamalEncryption:
    def __init__(self, curve: TECurve = BABY_JUBJUB):
        self.curve = curve
        self.params = RescueParams(BN254.fr)
        self.p = BN254.fr.p

    def key_gen(self, rng):
        sk = rng.randrange(1, self.curve.order)
        pk = self.curve.mul(self.curve.gen, sk)
        return sk, pk

    def _stream(self, shared, n: int, nonce: int = 0) -> list:
        """Rescue counter-mode keystream from the shared point.

        key = Permutation([shared.x, shared.y, 0, 0]); stream block i is the
        full PRP output on state [nonce+i, 0, 0, 0]
        (elgamal.rs:225-233 `compute_cipher_text_from_ephemeral_key_pair`,
        :300-334 `apply_counter_mode_stream`)."""
        key = self.params.permute(
            [shared[0] % self.p, shared[1] % self.p, 0, 0])
        round_keys = self.params.key_schedule(key)
        out = []
        ctr = 0
        while len(out) < n:
            out.extend(self.params.prp_with_keys(
                round_keys, [(nonce + ctr) % self.p, 0, 0, 0]))
            ctr += 1
        return out[:n]

    def deterministic_encrypt(self, r: int, pk, msg: list) -> ElGamalCiphertext:
        """Encryption with pre-sampled randomness (elgamal.rs:241-244)."""
        eph = self.curve.mul(self.curve.gen, r)
        shared = self.curve.mul(pk, r)
        stream = self._stream(shared, len(msg))
        data = [(m + s) % self.p for m, s in zip(msg, stream)]
        return ElGamalCiphertext(ephemeral=eph, data=data)

    def encrypt(self, rng, pk, msg: list) -> ElGamalCiphertext:
        r = rng.randrange(1, self.curve.order)
        return self.deterministic_encrypt(r, pk, msg)

    def decrypt(self, sk, ct: ElGamalCiphertext) -> list:
        shared = self.curve.mul(ct.ephemeral, sk)
        stream = self._stream(shared, len(ct.data))
        return [(c - s) % self.p for c, s in zip(ct.data, stream)]


def hash_to_group(curve: TECurve, data: bytes) -> tuple:
    """TE-curve hash-to-group (reference hash_to_group/twisted_edwards.rs):
    try-and-increment on y with cofactor clearing."""
    from ..utils.conversion import hash_to_field
    q = curve.q
    ctr = 0
    while True:
        y = hash_to_field(q, data + ctr.to_bytes(8, "little"), b"te-h2g")
        # a x^2 + y^2 = 1 + d x^2 y^2  =>  x^2 = (1 - y^2) / (a - d y^2)
        num = (1 - y * y) % q
        den = (curve.a - curve.d * y * y) % q
        if den != 0:
            x2 = num * pow(den, -1, q) % q
            if pow(x2, (q - 1) // 2, q) in (0, 1):
                from ..utils.serialize import _sqrt_mod
                x = _sqrt_mod(x2, q)
                pt = curve.mul((x, y), curve.cofactor)   # clear cofactor
                if not curve.is_identity(pt):
                    return pt
        ctr += 1
