"""Signatures, VRF/VDF, ElGamal, Reed-Solomon/Toeplitz, conversions."""

import random

import pytest

from mpc_jellyfish_tpu.curves import BN254
from mpc_jellyfish_tpu.primitives.signatures import (SchnorrSignatureScheme,
                                                     BLSOverBN254)
from mpc_jellyfish_tpu.primitives.vrf_vdf import BLSVRF, MinRoot, MinRootElement
from mpc_jellyfish_tpu.primitives.elgamal import (ElGamalEncryption,
                                                  hash_to_group)
from mpc_jellyfish_tpu.primitives.reed_solomon import (rs_encode, rs_decode,
                                                       CirculantMatrix,
                                                       ToeplitzMatrix)
from mpc_jellyfish_tpu.utils.te_curve import BABY_JUBJUB
from mpc_jellyfish_tpu.utils import conversion as C

rng = random.Random(61)
p = BN254.fr.p


def test_te_curve_basics():
    cur = BABY_JUBJUB
    assert cur.is_on_curve(cur.gen)
    g2 = cur.add(cur.gen, cur.gen)
    assert cur.is_on_curve(g2)
    assert cur.is_identity(cur.mul(cur.gen, cur.order))   # subgroup order
    assert cur.is_identity(cur.add(cur.gen, cur.neg(cur.gen)))


def test_schnorr_sign_verify():
    s = SchnorrSignatureScheme()
    sk, vk = s.key_gen(rng)
    msg = [rng.randrange(p) for _ in range(3)]
    sig = s.sign(sk, msg)
    assert s.verify(vk, msg, sig)
    assert not s.verify(vk, msg + [1], sig)
    bad = s.sign((sk + 1) % s.curve.order, msg)
    assert not s.verify(vk, msg, bad)


def test_bls_sign_verify_aggregate():
    bls = BLSOverBN254()
    sk1, vk1 = bls.key_gen(rng)
    sk2, vk2 = bls.key_gen(rng)
    m1, m2 = b"hello", b"world"
    s1, s2 = bls.sign(sk1, m1), bls.sign(sk2, m2)
    assert bls.verify(vk1, m1, s1)
    assert not bls.verify(vk1, m2, s1)
    agg = bls.aggregate([s1, s2])
    assert bls.aggregate_verify([vk1, vk2], [m1, m2], agg)
    assert not bls.aggregate_verify([vk1, vk2], [m1, m1], agg)
    # multisig on the same message
    s1b, s2b = bls.sign(sk1, m1), bls.sign(sk2, m1)
    assert bls.multi_sig_verify([vk1, vk2], m1, bls.aggregate([s1b, s2b]))


def test_blsvrf():
    vrf = BLSVRF()
    sk, vk = vrf.key_gen(rng)
    proof, out = vrf.evaluate(sk, b"beacon-1")
    assert vrf.verify(vk, b"beacon-1", proof, out)
    assert not vrf.verify(vk, b"beacon-2", proof, out)


def test_minroot():
    vdf = MinRoot()
    pp = vdf.setup(10)
    inp = MinRootElement(3, 4)
    out, proof = vdf.eval(pp, inp)
    assert vdf.verify(pp, inp, out, proof)
    # verify iteration semantics: x' = (x+y)^(1/5)
    assert pow(out.x, 5, vdf.p) != 0


def test_elgamal_roundtrip():
    eg = ElGamalEncryption()
    sk, pk = eg.key_gen(rng)
    msg = [rng.randrange(p) for _ in range(7)]
    ct = eg.encrypt(rng, pk, msg)
    assert eg.decrypt(sk, ct) == msg
    sk2, _ = eg.key_gen(rng)
    assert eg.decrypt(sk2, ct) != msg


def test_hash_to_group():
    pt = hash_to_group(BABY_JUBJUB, b"some data")
    assert BABY_JUBJUB.is_on_curve(pt)
    assert pt != hash_to_group(BABY_JUBJUB, b"other data")


def test_reed_solomon():
    data = [rng.randrange(p) for _ in range(4)]
    shares = rs_encode(p, data, 7)
    pts = list(enumerate(shares, start=1))
    rng.shuffle(pts)
    rec = rs_decode(p, pts[:4], 4)
    assert rec == data


def test_toeplitz_circulant():
    spec = BN254.fr
    n = 8
    col = [rng.randrange(p) for _ in range(n)]
    vec = [rng.randrange(p) for _ in range(n)]
    cm = CirculantMatrix(spec, col)
    got = cm.fast_vec_mul(vec)
    want = [sum(col[(i - j) % n] * vec[j] for j in range(n)) % p
            for i in range(n)]
    assert got == want

    row = [col[0]] + [rng.randrange(p) for _ in range(n - 1)]
    tm = ToeplitzMatrix(spec, col, row)
    got = tm.fast_vec_mul(vec)
    def t_entry(i, j):
        return col[i - j] if i >= j else row[j - i]
    want = [sum(t_entry(i, j) * vec[j] for j in range(n)) % p
            for i in range(n)]
    assert got == want


def test_conversions():
    data = b"hello field encoding world"
    elems = C.bytes_to_field_elements(p, data)
    assert C.bytes_from_field_elements(p, elems) == data
    assert C.fq_to_fr_with_mask(p, 2**260) < p
    h = C.hash_to_field(p, b"x")
    assert 0 <= h < p and h != C.hash_to_field(p, b"y")
    stream = C.bytes_to_field(p, data)
    assert C.field_to_bytes(p, stream)[:len(data)] == data


def test_bls_over_bls12_381():
    """Mirror of bls_over_bls12381.rs tests (sign/verify/aggregate)."""
    from mpc_jellyfish_tpu.primitives.signatures import BLSOverBLS12381
    s = BLSOverBLS12381()
    sk, vk = s.key_gen(rng)
    sk2, vk2 = s.key_gen(rng)
    sig = s.sign(sk, b"the message")
    assert s.verify(vk, b"the message", sig)
    assert not s.verify(vk, b"another message", sig)
    assert not s.verify(vk2, b"the message", sig)
    agg = s.aggregate([sig, s.sign(sk2, b"m2")])
    assert s.aggregate_verify([vk, vk2], [b"the message", b"m2"], agg)
    assert not s.aggregate_verify([vk2, vk], [b"the message", b"m2"], agg)
