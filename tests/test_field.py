"""Field kernel correctness vs exact Python bignum arithmetic.

Mirrors the reference's strategy of testing field-dependent layers against
native arkworks ops (SURVEY.md §4 gadget-vs-native cross-checks).
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_jellyfish_tpu.curves import BN254_FR, BN254_FQ, BLS12_381_FR, BLS12_381_FQ
from mpc_jellyfish_tpu.ops import field as F

SPECS = [BN254_FR, BN254_FQ, BLS12_381_FR, BLS12_381_FQ]
rng = random.Random(1234)


def sample(spec, n):
    return [rng.randrange(spec.p) for _ in range(n)]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_roundtrip(spec):
    xs = sample(spec, 7) + [0, 1, spec.p - 1]
    dev = spec.to_device(xs)
    assert spec.from_device(dev) == [x % spec.p for x in xs]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_add_sub_neg(spec):
    n = 64
    xs, ys = sample(spec, n), sample(spec, n)
    a, b = spec.to_device(xs), spec.to_device(ys)
    assert spec.from_device(F.add(spec, a, b)) == [(x + y) % spec.p for x, y in zip(xs, ys)]
    assert spec.from_device(F.sub(spec, a, b)) == [(x - y) % spec.p for x, y in zip(xs, ys)]
    assert spec.from_device(F.neg(spec, a)) == [(-x) % spec.p for x in xs]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mul(spec):
    n = 64
    xs, ys = sample(spec, n), sample(spec, n)
    # include edge cases
    xs[:3] = [0, 1, spec.p - 1]
    ys[:3] = [spec.p - 1, spec.p - 1, spec.p - 1]
    a, b = spec.to_device(xs), spec.to_device(ys)
    got = spec.from_device(F.mul(spec, a, b))
    assert got == [(x * y) % spec.p for x, y in zip(xs, ys)]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_inv_pow(spec):
    n = 16
    xs = sample(spec, n)
    a = spec.to_device(xs)
    got = spec.from_device(F.inv(spec, a))
    assert got == [pow(x, -1, spec.p) for x in xs]
    got5 = spec.from_device(F.pow_static(spec, a, 5))
    assert got5 == [pow(x, 5, spec.p) for x in xs]


def test_mul_broadcast():
    spec = BN254_FR
    xs = sample(spec, 8)
    c = rng.randrange(spec.p)
    a = spec.to_device(xs)
    cd = spec.to_device([c])
    got = spec.from_device(F.mul(spec, a, cd))
    assert got == [(x * c) % spec.p for x in xs]


def test_reductions_and_powers():
    spec = BN254_FR
    n = 33
    xs = sample(spec, n)
    a = spec.to_device(xs)
    s = spec.from_device(F.sum_reduce(spec, a, axis=1))
    assert s == [sum(xs) % spec.p]

    cp = spec.from_device(F.cumprod(spec, a, axis=1))
    want, acc = [], 1
    for x in xs:
        acc = acc * x % spec.p
        want.append(acc)
    assert cp == want

    base = rng.randrange(spec.p)
    pw = spec.from_device(F.powers(spec, spec.to_device([base]), 20))
    assert pw == [pow(base, i, spec.p) for i in range(20)]


def test_two_adic_roots():
    for spec in [BN254_FR, BLS12_381_FR]:
        w = spec.nth_root(1 << 10)
        assert pow(w, 1 << 10, spec.p) == 1
        assert pow(w, 1 << 9, spec.p) != 1


def test_select_iszero():
    spec = BN254_FR
    xs = [0, 5, 0, 7]
    a = spec.to_device(xs)
    z = np.asarray(F.is_zero(spec, a))
    assert list(z) == [True, False, True, False]


def test_batch_inv():
    import random
    from mpc_jellyfish_tpu.curves import BN254
    from mpc_jellyfish_tpu.ops import field as F
    spec = BN254.fr
    rng = random.Random(9)
    vals = [rng.randrange(1, spec.p) for _ in range(37)]
    x = spec.to_device(vals)
    assert spec.from_device(F.batch_inv(spec, x)) == \
        [pow(v, -1, spec.p) for v in vals]
