"""Host pairing: bilinearity, non-degeneracy, KZG-style checks."""

import random

import pytest

from mpc_jellyfish_tpu.curves import BN254, BLS12_381
from mpc_jellyfish_tpu import pairing as PR
from mpc_jellyfish_tpu.utils import ec_host as H
from mpc_jellyfish_tpu.utils import fq_tower as T

rng = random.Random(77)


@pytest.mark.parametrize("curve", [BN254, BLS12_381], ids=lambda c: c.name)
def test_generators_on_curve(curve):
    G1 = H.AffinePoint(*curve.g1_gen)
    assert H.on_curve(curve.fq.p, curve.b, G1)
    G2 = PR.g2_generator(curve)
    assert PR.g2_on_curve(curve, G2)
    # subgroup orders
    assert H.ec_mul(curve.fq.p, G1, curve.fr.p).inf
    assert PR.g2_mul(curve, G2, curve.fr.p).inf


@pytest.mark.parametrize("curve", [BN254, BLS12_381], ids=lambda c: c.name)
def test_bilinearity(curve):
    G1 = H.AffinePoint(*curve.g1_gen)
    G2 = PR.g2_generator(curve)
    a = rng.randrange(1, 2**64)
    b = rng.randrange(1, 2**64)
    e = PR.pairing(curve, G1, G2)
    assert e != T.F12_ONE  # non-degenerate
    # e(aP, bQ) == e(P, Q)^(ab)
    lhs = PR.pairing(curve, H.ec_mul(curve.fq.p, G1, a), PR.g2_mul(curve, G2, b))
    rhs = T.f12_pow(curve.fq.p, PR._xi(curve), e, a * b % curve.fr.p)
    assert lhs == rhs


@pytest.mark.parametrize("curve", [BN254, BLS12_381], ids=lambda c: c.name)
def test_kzg_style_check(curve):
    # e(sP, Q) * e(-P, sQ) == 1  (the shape of the KZG verify equation)
    G1 = H.AffinePoint(*curve.g1_gen)
    G2 = PR.g2_generator(curve)
    s = rng.randrange(1, curve.fr.p)
    sP = H.ec_mul(curve.fq.p, G1, s)
    sQ = PR.g2_mul(curve, G2, s)
    negP = H.ec_neg(curve.fq.p, G1)
    assert PR.pairing_check(curve, [sP, negP], [G2, sQ])
    # and a wrong statement fails
    assert not PR.pairing_check(curve, [sP, G1], [G2, sQ])


@pytest.mark.parametrize("curve", [BN254, BLS12_381], ids=lambda c: c.name)
def test_native_multi_pairing_matches_python_oracle(curve):
    """Exact-value parity of the native C multi_pairing (Karatsuba Fq2,
    cyclotomic squarings, BN x-chain final exp) against the pure-Python
    tower: catches any final-exponentiation/Granger-Scott formula slip
    that a product==1 check could miss."""
    from mpc_jellyfish_tpu.utils import native as NV
    G1 = H.AffinePoint(*curve.g1_gen)
    G2 = PR.g2_generator(curve)
    pts1, pts2 = [], []
    for _ in range(2):
        a = rng.randrange(1, curve.fr.p)
        b = rng.randrange(1, curve.fr.p)
        pts1.append(H.ec_mul(curve.fq.p, G1, a))
        pts2.append(PR.g2_mul(curve, G2, b))
    got = NV.multi_pairing(curve, pts1, pts2)
    if got is None:
        pytest.skip("native runtime unavailable")
    p, xi = curve.fq.p, PR._xi(curve)
    f = T.F12_ONE
    for P, Q in zip(pts1, pts2):
        f = T.f12_mul(p, xi, f, PR._ate_miller_full(curve, P, Q))
    want = PR.final_exponentiation(curve, f)
    assert got == want
