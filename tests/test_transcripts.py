"""Transcript tests: Merlin STROBE-128 byte-parity + e2e with each transcript.

The Merlin vector is the `equivalence_simple` test from the merlin crate
itself, pinning our STROBE-128 implementation byte-for-byte to the Rust
`merlin::Transcript` the reference's StandardTranscript wraps
(plonk/src/transcript/standard.rs:16)."""

import random

from mpc_jellyfish_tpu.curves import BN254
from mpc_jellyfish_tpu.plonk.transcript import (RescueTranscript,
                                                SolidityTranscript,
                                                StandardTranscript,
                                                _Strobe128)


def test_merlin_reference_vector():
    s = _Strobe128(b"Merlin v1.0")

    def append(label, msg):
        s.meta_ad(label, False)
        s.meta_ad(len(msg).to_bytes(4, "little"), True)
        s.ad(msg, False)

    append(b"dom-sep", b"test protocol")
    append(b"some label", b"some data")
    s.meta_ad(b"challenge", False)
    s.meta_ad((32).to_bytes(4, "little"), True)
    assert s.prf(32, False).hex() == \
        "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"


def test_transcripts_deterministic_and_distinct():
    chals = {}
    for cls in (SolidityTranscript, StandardTranscript, RescueTranscript):
        t1, t2 = cls(BN254), cls(BN254)
        for t in (t1, t2):
            t.append_message(b"m", b"payload")
            t.append_field(b"f", 12345)
        c1 = t1.get_and_append_challenge(b"c")
        assert c1 == t2.get_and_append_challenge(b"c")
        # challenge chaining: second challenge differs
        assert t1.get_and_append_challenge(b"c") != c1
        chals[cls.__name__] = c1
    assert len(set(chals.values())) == 3


def test_e2e_standard_transcript():
    """TurboPlonk round-trip under the Merlin transcript (the reference
    API default, snark.rs tests use StandardTranscript)."""
    from mpc_jellyfish_tpu.relation.circuit import PlonkCircuit
    from mpc_jellyfish_tpu.plonk.snark import PlonkKzgSnark, WrongProof
    from mpc_jellyfish_tpu.pcs import kzg

    p = BN254.fr.p
    cs = PlonkCircuit(BN254.fr)
    x = cs.create_variable(7)
    y = cs.create_public_variable(pow(7, 5, p))
    cs.enforce_equal(cs.pow5(x), y)
    cs.finalize_for_arithmetization()

    snark = PlonkKzgSnark(BN254, transcript_cls=StandardTranscript)
    srs = kzg.universal_setup_for_testing(BN254, cs.srs_size(), seed=4)
    pk, vk = snark.preprocess(srs, cs)
    proof = snark.prove(cs, pk, rng=random.Random(0), mask=True)
    assert snark.verify(vk, cs.public_input(), proof)
    # the proof must NOT verify under a different transcript
    other = PlonkKzgSnark(BN254, transcript_cls=SolidityTranscript)
    try:
        other.verify(vk, cs.public_input(), proof)
        assert False, "cross-transcript proof accepted"
    except WrongProof:
        pass
