"""AEAD: ChaCha20-Poly1305 (RFC 8439) with X25519-style key exchange keys.

Mirror of `primitives/src/aead.rs:30-242` (chacha20poly1305 + crypto_kx).
Pure-host implementation; AEAD is an auxiliary primitive, not a prover path.
The KEM here is a hash-based static-static DH over Baby Jubjub standing in
for crypto_kx (self-consistent; documented deviation).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from ..utils.keccak import keccak256
from ..utils.te_curve import BABY_JUBJUB


def _rotl32(v, c):
    return ((v << c) | (v >> (32 - c))) & 0xFFFFFFFF


def _quarter(s, a, b, c, d):
    s[a] = (s[a] + s[b]) & 0xFFFFFFFF; s[d] = _rotl32(s[d] ^ s[a], 16)
    s[c] = (s[c] + s[d]) & 0xFFFFFFFF; s[b] = _rotl32(s[b] ^ s[c], 12)
    s[a] = (s[a] + s[b]) & 0xFFFFFFFF; s[d] = _rotl32(s[d] ^ s[a], 8)
    s[c] = (s[c] + s[d]) & 0xFFFFFFFF; s[b] = _rotl32(s[b] ^ s[c], 7)


def chacha20_block(key: bytes, counter: int, nonce: bytes) -> bytes:
    const = b"expand 32-byte k"
    state = list(struct.unpack("<4I", const)) \
        + list(struct.unpack("<8I", key)) \
        + [counter] + list(struct.unpack("<3I", nonce))
    work = list(state)
    for _ in range(10):
        _quarter(work, 0, 4, 8, 12)
        _quarter(work, 1, 5, 9, 13)
        _quarter(work, 2, 6, 10, 14)
        _quarter(work, 3, 7, 11, 15)
        _quarter(work, 0, 5, 10, 15)
        _quarter(work, 1, 6, 11, 12)
        _quarter(work, 2, 7, 8, 13)
        _quarter(work, 3, 4, 9, 14)
    out = [(w + s) & 0xFFFFFFFF for w, s in zip(work, state)]
    return struct.pack("<16I", *out)


def chacha20_encrypt(key: bytes, counter: int, nonce: bytes, data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 64):
        ks = chacha20_block(key, counter + i // 64, nonce)
        block = data[i:i + 64]
        out += bytes(a ^ b for a, b in zip(block, ks))
    return bytes(out)


def poly1305_mac(key: bytes, msg: bytes) -> bytes:
    r = int.from_bytes(key[:16], "little") & 0x0FFFFFFC0FFFFFFC0FFFFFFC0FFFFFFF
    s = int.from_bytes(key[16:32], "little")
    p = (1 << 130) - 5
    acc = 0
    for i in range(0, len(msg), 16):
        block = msg[i:i + 16]
        n = int.from_bytes(block + b"\x01", "little")
        acc = (acc + n) * r % p
    return ((acc + s) & ((1 << 128) - 1)).to_bytes(16, "little")


def _pad16(b: bytes) -> bytes:
    return b + b"\x00" * ((-len(b)) % 16)


def chacha20poly1305_seal(key: bytes, nonce: bytes, aad: bytes,
                          plaintext: bytes) -> bytes:
    otk = chacha20_block(key, 0, nonce)[:32]
    ct = chacha20_encrypt(key, 1, nonce, plaintext)
    mac_data = (_pad16(aad) + _pad16(ct)
                + struct.pack("<QQ", len(aad), len(ct)))
    tag = poly1305_mac(otk, mac_data)
    return ct + tag


def chacha20poly1305_open(key: bytes, nonce: bytes, aad: bytes,
                          sealed: bytes) -> bytes:
    ct, tag = sealed[:-16], sealed[-16:]
    otk = chacha20_block(key, 0, nonce)[:32]
    mac_data = (_pad16(aad) + _pad16(ct)
                + struct.pack("<QQ", len(aad), len(ct)))
    if poly1305_mac(otk, mac_data) != tag:
        raise ValueError("AEAD tag verification failed")
    return chacha20_encrypt(key, 1, nonce, ct)


# ---------------------------------------------------------------------------
# keyed AEAD envelope (mirror of aead.rs EncKey/DecKey/Ciphertext)
# ---------------------------------------------------------------------------

@dataclass
class AeadCiphertext:
    ephemeral_pk: tuple
    nonce: bytes
    ct: bytes


class KeyAead:
    """Static-receiver AEAD: DH(ephemeral, receiver) -> chacha key."""

    def __init__(self):
        self.curve = BABY_JUBJUB

    def key_gen(self, rng):
        sk = rng.randrange(1, self.curve.order)
        pk = self.curve.mul(self.curve.gen, sk)
        return sk, pk

    def _derive(self, shared) -> bytes:
        return keccak256(b"aead-kdf" + shared[0].to_bytes(32, "little")
                         + shared[1].to_bytes(32, "little"))

    def seal(self, rng, receiver_pk, msg: bytes, aad: bytes = b"") -> AeadCiphertext:
        esk = rng.randrange(1, self.curve.order)
        epk = self.curve.mul(self.curve.gen, esk)
        key = self._derive(self.curve.mul(receiver_pk, esk))
        nonce = keccak256(bytes(epk[0].to_bytes(32, "little")))[:12]
        return AeadCiphertext(ephemeral_pk=epk, nonce=nonce,
                              ct=chacha20poly1305_seal(key, nonce, aad, msg))

    def open(self, sk: int, ctx: AeadCiphertext, aad: bytes = b"") -> bytes:
        key = self._derive(self.curve.mul(ctx.ephemeral_pk, sk))
        return chacha20poly1305_open(key, ctx.nonce, aad, ctx.ct)
