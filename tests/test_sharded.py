"""Distributed (8-virtual-device mesh) kernels vs single-chip reference."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mpc_jellyfish_tpu.curves import BN254
from mpc_jellyfish_tpu.ops import field as F, ntt as N, ec as E, msm as M
from mpc_jellyfish_tpu.parallel import sharded as S
from mpc_jellyfish_tpu.utils import ec_host as H
from mpc_jellyfish_tpu.utils.bigint import ints_to_limbs

rng = random.Random(21)
spec = BN254.fr


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:8])
    assert devs.size == 8, "tests need 8 virtual devices (see conftest)"
    return Mesh(devs, ("shard",))


def test_distributed_ntt_roundtrip_and_match(mesh):
    n = 1 << 10
    dn = S.DistributedNTT(spec, n, mesh, "shard")
    coeffs = [rng.randrange(spec.p) for _ in range(n)]
    x = spec.to_device(coeffs).reshape(spec.num_limbs, dn.n1, dn.n2)
    x = jax.device_put(x, NamedSharding(mesh, P(None, None, "shard")))

    y = dn.forward(x)
    # compare against single-chip NTT: out[:, k1, k2] == X[k2*n1 + k1]
    ref = N.ntt(N.Domain(spec, n), spec.to_device(coeffs))
    ref_host = spec.from_device(ref)
    got = spec.from_device(y)          # flat order: k1-major [n1, n2]
    got_arr = np.array(got).reshape(dn.n1, dn.n2)
    for t in range(20):
        k = rng.randrange(n)
        k1, k2 = k % dn.n1, k // dn.n1
        assert got_arr[k1][k2] == ref_host[k]

    back = dn.inverse(y)
    assert spec.from_device(back) == coeffs


def test_distributed_cumprod(mesh):
    n = 64
    xs = [rng.randrange(1, spec.p) for _ in range(n)]
    x = jax.device_put(spec.to_device(xs), NamedSharding(mesh, P(None, "shard")))
    got = spec.from_device(S.distributed_cumprod(spec, x, mesh, "shard"))
    want, acc = [], 1
    for v in xs:
        acc = acc * v % spec.p
        want.append(acc)
    assert got == want


def test_distributed_msm(mesh):
    n = 32
    G = H.AffinePoint(*BN254.g1_gen)
    pts = [H.ec_mul(BN254.fq.p, G, rng.randrange(1, spec.p)) for _ in range(n)]
    ss = [rng.randrange(spec.p) for _ in range(n)]
    pd = E.affine_to_device(BN254.fq, pts)
    pd = tuple(jax.device_put(t, NamedSharding(mesh, P(None, "shard")) if t.ndim == 2
                              else NamedSharding(mesh, P("shard"))) for t in pd)
    sd = jax.device_put(jnp.asarray(ints_to_limbs(ss, spec.num_limbs)),
                        NamedSharding(mesh, P(None, "shard")))
    res = S.distributed_msm(BN254.fq, pd, sd, mesh, "shard", c=8)
    got = E.affine_from_device(
        BN254.fq, E.jac_to_affine(BN254.fq, tuple(t[:, None] for t in res)))[0]
    want = H.ec_msm(BN254.fq.p, pts, ss)
    assert got == want
