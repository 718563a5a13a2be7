"""NTT / polynomial layer vs exact Python bignum reference."""

import random

import jax.numpy as jnp
import pytest

from mpc_jellyfish_tpu.curves import BN254_FR, BLS12_381_FR
from mpc_jellyfish_tpu.ops import field as F
from mpc_jellyfish_tpu.ops import ntt as N
from mpc_jellyfish_tpu.ops import poly as P

rng = random.Random(99)


def naive_eval(coeffs, z, p):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * z + c) % p
    return acc


@pytest.mark.parametrize("spec", [BN254_FR, BLS12_381_FR], ids=lambda s: s.name)
@pytest.mark.parametrize("n", [8, 64])
def test_ntt_matches_naive_eval(spec, n):
    dom = N.Domain(spec, n)
    coeffs = [rng.randrange(spec.p) for _ in range(n)]
    d = spec.to_device(coeffs)
    evals = spec.from_device(N.ntt(dom, d))
    for j in [0, 1, n // 2, n - 1]:
        assert evals[j] == naive_eval(coeffs, dom.elements_host[j], spec.p)


@pytest.mark.parametrize("n", [4, 32, 256])
def test_ntt_roundtrip(n):
    spec = BN254_FR
    dom = N.Domain(spec, n)
    coeffs = [rng.randrange(spec.p) for _ in range(n)]
    d = spec.to_device(coeffs)
    back = spec.from_device(N.intt(dom, N.ntt(dom, d)))
    assert back == coeffs


def test_coset_ntt():
    spec = BN254_FR
    n = 32
    dom = N.Domain(spec, n)
    tbl = N.CosetTable(dom)
    coeffs = [rng.randrange(spec.p) for _ in range(n)]
    d = spec.to_device(coeffs)
    evals = spec.from_device(N.coset_ntt(dom, d, tbl))
    g = spec.generator
    for j in [0, 3, n - 1]:
        pt = g * dom.elements_host[j] % spec.p
        assert evals[j] == naive_eval(coeffs, pt, spec.p)
    # round trip
    back = spec.from_device(N.coset_intt(dom, spec.to_device(evals, mont=True), tbl))
    assert back == coeffs


def test_eval_at():
    spec = BN254_FR
    n = 50
    coeffs = [rng.randrange(spec.p) for _ in range(n)]
    z = rng.randrange(spec.p)
    got = spec.from_device(P.eval_at(spec, spec.to_device(coeffs), spec.to_device([z])[:, 0]))
    assert got == [naive_eval(coeffs, z, spec.p)]


def test_divide_by_linear():
    spec = BN254_FR
    n = 33
    coeffs = [rng.randrange(spec.p) for _ in range(n)]
    z = rng.randrange(spec.p)
    q, r = P.divide_by_linear(spec, spec.to_device(coeffs), spec.to_device([z])[:, 0])
    q_host = spec.from_device(q)
    r_host = spec.from_device(r)[0]
    assert r_host == naive_eval(coeffs, z, spec.p)
    # check a(X) == q(X)*(X-z) + r at a random point
    t = rng.randrange(spec.p)
    lhs = naive_eval(coeffs, t, spec.p)
    qt = naive_eval(q_host, t, spec.p)
    assert lhs == (qt * (t - z) + r_host) % spec.p
    # top coefficient of q must be zero
    assert q_host[-1] == 0


def test_mul_by_vanishing_and_add():
    spec = BN254_FR
    m = [rng.randrange(spec.p) for _ in range(5)]
    out = spec.from_device(P.mul_by_vanishing(spec, spec.to_device(m), 8))
    # (X^8 - 1) * m(X)
    want = [0] * 13
    for i, c in enumerate(m):
        want[i] = (want[i] - c) % spec.p
        want[i + 8] = (want[i + 8] + c) % spec.p
    assert out == want

    a = [1, 2, 3]
    b = [5, 6, 7, 8, 9]
    s = spec.from_device(P.add_padded(spec, spec.to_device(a), spec.to_device(b)))
    assert s == [6, 8, 10, 8, 9]
