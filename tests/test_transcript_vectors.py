"""Pinned byte-parity vectors for the Solidity (keccak256) transcript.

SURVEY.md §7.7's bar is cross-implementation challenge parity; with no Rust
toolchain in this environment, vectors are pinned the way the Rescue
constants were (static extraction from the reference):

1. keccak256 is pinned to the vector the reference commits in its OWN test
   (`plonk/src/transcript/solidity.rs:86-97`: keccak256("the quick brown
   fox jumps over the lazy dog") = 865bf0...) plus the universal
   empty-input vector.
2. An INDEPENDENT keccak-f[1600] + sponge written here from the Keccak
   spec (no code shared with utils/keccak.py) replays the challenge state
   machine of `solidity.rs:53-77` — state = H(state|transcript|0) ||
   H(state|transcript|1), challenge = state[..48] LE mod r, transcript
   NEVER reset — and the library transcript must match byte-for-byte over
   a multi-challenge sequence.
3. The resulting challenge values are ALSO hard-pinned below so both
   implementations drifting together is caught.

The Merlin transcript is pinned against the merlin crate's own vector in
test_transcripts.py; together these cover the two byte-exact FS chains.
"""

import pytest

from mpc_jellyfish_tpu.curves import BN254
from mpc_jellyfish_tpu.plonk.transcript import SolidityTranscript

# --- independent keccak-256 (Ethereum padding 0x01, rate 136) --------------

_RC = [1, 0x8082, 0x800000000000808A, 0x8000000080008000, 0x808B,
       0x80000001, 0x8000000080008081, 0x8000000000008009, 0x8A, 0x88,
       0x80008009, 0x8000000A, 0x8000808B, 0x800000000000008B,
       0x8000000000008089, 0x8000000000008003, 0x8000000000008002,
       0x8000000000000080, 0x800A, 0x800000008000000A, 0x8000000080008081,
       0x8000000000008080, 0x80000001, 0x8000000080008008]
# rho offsets and pi destination for lane index i = x + 5*y (flat)
_ROT = [0, 1, 62, 28, 27, 36, 44, 6, 55, 20, 3, 10, 43, 25, 39, 41, 45,
        15, 21, 8, 18, 2, 61, 56, 14]


def _keccak_f_flat(a):
    """keccak-f[1600] on a flat 25-lane list, a[x + 5y]."""
    M = (1 << 64) - 1
    for rc in _RC:
        # theta
        c = [a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20]
             for x in range(5)]
        d = [c[(x - 1) % 5] ^ (((c[(x + 1) % 5] << 1)
                                | (c[(x + 1) % 5] >> 63)) & M)
             for x in range(5)]
        a = [a[i] ^ d[i % 5] for i in range(25)]
        # rho + pi: b[y + 5*((2x+3y) mod 5)] = rot(a[x+5y])
        b = [0] * 25
        for x in range(5):
            for y in range(5):
                i = x + 5 * y
                r = _ROT[i]
                b[y + 5 * ((2 * x + 3 * y) % 5)] = \
                    ((a[i] << r) | (a[i] >> (64 - r))) & M
        # chi
        a = [b[i] ^ ((~b[(i % 5 + 1) % 5 + 5 * (i // 5)] & M)
                     & b[(i % 5 + 2) % 5 + 5 * (i // 5)])
             for i in range(25)]
        # iota
        a[0] ^= rc
    return a


def _indep_keccak256(msg: bytes) -> bytes:
    rate = 136
    padded = bytearray(msg)
    padded.append(0x01)
    while len(padded) % rate:
        padded.append(0)
    padded[-1] |= 0x80
    st = [0] * 25
    for off in range(0, len(padded), rate):
        blk = padded[off:off + rate]
        for i in range(rate // 8):
            st[i] ^= int.from_bytes(blk[8 * i:8 * i + 8], "little")
        st = _keccak_f_flat(st)
    out = b"".join(st[i].to_bytes(8, "little") for i in range(4))
    return out[:32]


def test_keccak_reference_vectors():
    # pinned in the reference's own test, solidity.rs:94-96 ("yanked from
    # smart contract execution")
    assert _indep_keccak256(
        b"the quick brown fox jumps over the lazy dog").hex() == \
        "865bf05cca7ba26fb8051e8366c6d19e21cadeebe3ee6bfa462b5c72275414ec"
    # universal keccak-256 empty-input vector
    assert _indep_keccak256(b"").hex() == \
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    # the library keccak must agree on both
    from mpc_jellyfish_tpu.utils.keccak import keccak256
    for m in (b"", b"the quick brown fox jumps over the lazy dog",
              bytes(range(256)) * 3):
        assert keccak256(m) == _indep_keccak256(m)


class _IndepSolidityChain:
    """solidity.rs:31-77 replayed with the independent keccak."""

    def __init__(self, r: int):
        self.r = r
        self.state = bytes(64)
        self.transcript = bytearray()

    def append(self, msg: bytes):
        self.transcript += msg

    def challenge(self) -> int:
        base = self.state + bytes(self.transcript)
        self.state = (_indep_keccak256(base + b"\x00")
                      + _indep_keccak256(base + b"\x01"))
        return int.from_bytes(self.state[:48], "little") % self.r


# challenges for the message sequence below, computed by the independent
# chain and PINNED (guards against both keccaks drifting together)
_PINNED = [
    0x157d3bdaacfb6edeca48dc69d295c3f5ae206973900669c63aa0040abd962ea7,
    0x092b551d81efddda95864a2b046778fe619dcfb5f16cd3d9f9541a66abcb31b2,
    0x1ed27e45fecacb1402cc5e03e507567baaf0aad1450e68ce9e7059689e7412bb,
]


def test_solidity_transcript_pinned_chain():
    r = BN254.fr.p
    lib = SolidityTranscript(BN254)
    ind = _IndepSolidityChain(r)
    msgs = [b"", b"\x00" * 32, bytes(range(48)),
            (0x1234567890abcdef).to_bytes(32, "little")]
    got = []
    for i, m in enumerate(msgs):
        lib.append_message(b"msg", m)
        ind.append(m)
        if i % 2 == 1:
            a = lib.get_and_append_challenge(b"c")
            b = ind.challenge()
            assert a == b
            got.append(a)
    # one more squeeze with no new messages (state-only evolution)
    a = lib.get_and_append_challenge(b"c")
    assert a == ind.challenge()
    got.append(a)
    assert got == _PINNED, [hex(x) for x in got]


def test_solidity_field_and_point_absorption():
    """append_field / append_commitment byte layout: LE field bytes and the
    reference's affine (x, y, is_inf) G1 encoding feed the same chain."""
    from mpc_jellyfish_tpu.utils.serialize import field_to_bytes, g1_to_bytes
    from mpc_jellyfish_tpu.utils.ec_host import AffinePoint, ec_mul

    g = AffinePoint(*BN254.g1_gen)
    pts = [g, ec_mul(BN254.fq.p, g, 7)]
    lib = SolidityTranscript(BN254)
    ind = _IndepSolidityChain(BN254.fr.p)
    lib.append_field(b"f", 12345)
    ind.append(field_to_bytes(BN254.fr, 12345))
    lib.append_commitments(b"pts", pts)
    for pt in pts:
        ind.append(g1_to_bytes(BN254, pt))
    assert lib.get_and_append_challenge(b"c") == ind.challenge()


def test_proof_bytes_deterministic_pinned():
    """Full-proof byte determinism fixture: fixed SRS seed + witness + mask
    rng must reproduce the same proof bytes forever.  Guards the whole
    protocol pipeline (transcript order, masking, serialization) against
    silent drift; the pinned hash was produced by this implementation (no
    Rust toolchain exists here to produce reference proof bytes — challenge
    parity is covered by the pinned keccak chain above)."""
    import hashlib
    import random
    from mpc_jellyfish_tpu.relation.circuit import PlonkCircuit
    from mpc_jellyfish_tpu.plonk.snark import PlonkKzgSnark
    from mpc_jellyfish_tpu.pcs import kzg
    from mpc_jellyfish_tpu.utils.serialize import proof_to_bytes

    spec = BN254.fr
    rng = random.Random(42)
    cs = PlonkCircuit(spec)
    a = [cs.create_variable(rng.randrange(spec.p)) for _ in range(4)]
    out = cs.create_public_variable(0)
    acc = a[0]
    for v in a[1:]:
        acc = cs.mul(acc, v)
    acc = cs.add(acc, cs.sum(a))
    cs.witness[out] = cs.witness_of(acc)
    cs.enforce_equal(acc, out)
    cs.finalize_for_arithmetization()
    srs = kzg.universal_setup_for_testing(BN254, cs.srs_size(), seed=9)
    s = PlonkKzgSnark(BN254)
    pk, vk = s.preprocess(srs, cs)
    proof = s.prove(cs, pk, rng=random.Random(0), mask=True)
    assert s.verify(vk, cs.public_input(), proof)
    b = proof_to_bytes(BN254, proof)
    assert len(b) == 769
    assert hashlib.sha256(b).hexdigest() == \
        "f6213494ec0c594d020511b5b16149c6da2d925671b7d23cf223b2f7b420d1d7"
