"""AEAD (RFC 8439 vectors), VID (ADVZ), Rescue transcript e2e."""

import random

import pytest

from mpc_jellyfish_tpu.curves import BN254
from mpc_jellyfish_tpu.primitives.aead import (
    chacha20_block, chacha20poly1305_seal, chacha20poly1305_open, KeyAead)
from mpc_jellyfish_tpu.primitives.vid import Advz
from mpc_jellyfish_tpu.pcs import kzg

rng = random.Random(71)


def test_chacha20_rfc_vector():
    # RFC 8439 §2.3.2 block test vector
    key = bytes(range(32))
    nonce = bytes.fromhex("000000090000004a00000000")
    block = chacha20_block(key, 1, nonce)
    assert block[:16].hex() == "10f1e7e4d13b5915500fdd1fa32071c4"


def test_chacha20poly1305_rfc_vector():
    # RFC 8439 §2.8.2 AEAD test vector
    key = bytes.fromhex(
        "808182838485868788898a8b8c8d8e8f909192939495969798999a9b9c9d9e9f")
    nonce = bytes.fromhex("070000004041424344454647")
    aad = bytes.fromhex("50515253c0c1c2c3c4c5c6c7")
    plaintext = (b"Ladies and Gentlemen of the class of '99: If I could "
                 b"offer you only one tip for the future, sunscreen would be it.")
    sealed = chacha20poly1305_seal(key, nonce, aad, plaintext)
    assert sealed[-16:].hex() == "1ae10b594f09e26a7e902ecbd0600691"
    assert chacha20poly1305_open(key, nonce, aad, sealed) == plaintext
    with pytest.raises(ValueError):
        chacha20poly1305_open(key, nonce, b"bad-aad", sealed)


def test_key_aead_roundtrip():
    ka = KeyAead()
    sk, pk = ka.key_gen(rng)
    ct = ka.seal(rng, pk, b"secret payload", aad=b"hdr")
    assert ka.open(sk, ct, aad=b"hdr") == b"secret payload"
    with pytest.raises(ValueError):
        ka.open(sk, ct, aad=b"other")


@pytest.fixture(scope="module")
def vid():
    srs = kzg.universal_setup_for_testing(BN254, max_degree=16, seed=55)
    return Advz(BN254, srs, num_storage_nodes=6, payload_chunk_size=3)


def test_vid_disperse_verify_recover(vid):
    payload = bytes(rng.randrange(256) for _ in range(200))
    shares, common = vid.disperse(payload)
    assert len(shares) == 6
    for s in shares:
        assert vid.verify_share(s, common)
    # tampered share rejected
    bad = shares[0]
    bad.evals[0] = (bad.evals[0] + 1) % BN254.fr.p
    assert not vid.verify_share(bad, common)
    # recover from any k shares
    rec = vid.recover_payload(shares[2:5], common)
    assert rec == payload
    # commit_only is deterministic
    assert vid.commit_only(payload) == vid.commit_only(payload)


def test_rescue_transcript_e2e():
    from mpc_jellyfish_tpu.relation.circuit import PlonkCircuit
    from mpc_jellyfish_tpu.plonk.snark import PlonkKzgSnark, WrongProof
    from mpc_jellyfish_tpu.plonk.transcript import RescueTranscript
    spec = BN254.fr
    cs = PlonkCircuit(spec)
    a = cs.create_variable(6)
    b = cs.create_variable(7)
    c = cs.mul(a, b)
    out = cs.create_public_variable(42)
    cs.enforce_equal(c, out)
    cs.finalize_for_arithmetization()
    snark = PlonkKzgSnark(BN254, transcript_cls=RescueTranscript)
    srs = kzg.universal_setup_for_testing(BN254, cs.srs_size(), seed=77)
    pk, vk = snark.preprocess(srs, cs)
    proof = snark.prove(cs, pk, rng=random.Random(5))
    snark.verify(vk, [42], proof)
    with pytest.raises(WrongProof):
        snark.verify(vk, [43], proof)
    # a Solidity-transcript verifier must NOT accept a Rescue-transcript proof
    solidity_snark = PlonkKzgSnark(BN254)
    with pytest.raises(WrongProof):
        solidity_snark.verify(vk, [42], proof)
