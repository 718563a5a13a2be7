"""ChaCha20 RNG mirroring `rand_chacha::ChaCha20Rng` word-for-word.

The reference derives its coset representatives k_i from
`ChaChaRng::from_seed([0u8; 32])` + arkworks `Fp::rand`
(`relation/src/constants.rs:30-81`); matching those field constants
bit-for-bit requires reproducing the exact keystream and consumption
order:

  * 20-round ChaCha with the RFC 7539 constants, 256-bit key = seed,
    64-bit block counter in state words 12-13 and 64-bit stream id in
    14-15 (rand_chacha layout; all zero for `from_seed`),
  * output consumed as little-endian u32 words of each 64-byte block in
    order; `next_u64()` = lo_word | hi_word << 32 of two consecutive u32s.

Verified against the all-zero-key ChaCha20 test vector (RFC 7539 §2.3.2
structure; block 0 keystream 76 b8 e0 ad ...).
"""

from __future__ import annotations

import struct

_MASK = 0xFFFFFFFF


def _rotl(x: int, n: int) -> int:
    return ((x << n) | (x >> (32 - n))) & _MASK


def _quarter(st, a, b, c, d):
    st[a] = (st[a] + st[b]) & _MASK
    st[d] = _rotl(st[d] ^ st[a], 16)
    st[c] = (st[c] + st[d]) & _MASK
    st[b] = _rotl(st[b] ^ st[c], 12)
    st[a] = (st[a] + st[b]) & _MASK
    st[d] = _rotl(st[d] ^ st[a], 8)
    st[c] = (st[c] + st[d]) & _MASK
    st[b] = _rotl(st[b] ^ st[c], 7)


def _block(key_words, counter: int, stream_words) -> list:
    st = [0x61707865, 0x3320646E, 0x79622D32, 0x6B206574,
          *key_words,
          counter & _MASK, (counter >> 32) & _MASK,
          stream_words[0], stream_words[1]]
    w = list(st)
    for _ in range(10):
        _quarter(w, 0, 4, 8, 12)
        _quarter(w, 1, 5, 9, 13)
        _quarter(w, 2, 6, 10, 14)
        _quarter(w, 3, 7, 11, 15)
        _quarter(w, 0, 5, 10, 15)
        _quarter(w, 1, 6, 11, 12)
        _quarter(w, 2, 7, 8, 13)
        _quarter(w, 3, 4, 9, 14)
    return [(w[i] + st[i]) & _MASK for i in range(16)]


class ChaCha20Rng:
    """Word-stream mirror of rand_chacha 0.3's ChaCha20Rng."""

    def __init__(self, seed: bytes = b"\x00" * 32, stream: int = 0):
        assert len(seed) == 32
        self._key = list(struct.unpack("<8I", seed))
        self._stream = (stream & _MASK, (stream >> 32) & _MASK)
        self._counter = 0
        self._buf: list = []

    def _refill(self):
        self._buf = _block(self._key, self._counter, self._stream)
        self._counter += 1

    def next_u32(self) -> int:
        if not self._buf:
            self._refill()
        return self._buf.pop(0)

    def next_u64(self) -> int:
        lo = self.next_u32()
        hi = self.next_u32()
        return lo | (hi << 32)


def ark_fp_rand(rng: ChaCha20Rng, p: int) -> int:
    """arkworks-0.4 `Fp::rand`: sample N 64-bit limbs (LSB limb first),
    shave the bits above MODULUS_BITS off the top limb, reject if >= p;
    the accepted bigint IS the Montgomery representation, so the field
    value is repr * R^-1 mod p with R = 2^(64*N)."""
    n64 = (p.bit_length() + 63) // 64
    shave = 64 * n64 - p.bit_length()
    mask = (1 << (64 - shave)) - 1 if shave < 64 else 0
    r_inv = pow(1 << (64 * n64), -1, p)
    while True:
        limbs = [rng.next_u64() for _ in range(n64)]
        limbs[-1] &= mask
        repr_ = 0
        for i, w in enumerate(limbs):
            repr_ |= w << (64 * i)
        if repr_ < p:
            return repr_ * r_inv % p
