"""Device EC / MSM kernels vs the exact host oracle."""

import random

import jax
import jax.numpy as jnp
import pytest

from mpc_jellyfish_tpu.curves import BN254
from mpc_jellyfish_tpu.ops import ec as E
from mpc_jellyfish_tpu.ops import msm as M
from mpc_jellyfish_tpu.utils import ec_host as H
from mpc_jellyfish_tpu.utils.bigint import ints_to_limbs

rng = random.Random(5)
curve = BN254
fq = curve.fq
fr = curve.fr
G = H.AffinePoint(*curve.g1_gen)


def rand_points(k):
    return [H.ec_mul(fq.p, G, rng.randrange(1, fr.p)) for _ in range(k)]


def test_jac_add_double_vs_host():
    pts = rand_points(6)
    qts = rand_points(6)
    # include special cases: equal points, inverse points, infinity
    pts[0] = qts[0]                        # doubling path
    qts[1] = H.ec_neg(fq.p, pts[1])        # cancel -> infinity
    qts[2] = H.AffinePoint.infinity()      # Q at infinity
    pts[3] = H.AffinePoint.infinity()      # P at infinity

    pd = E.affine_to_device(fq, pts)
    qd = E.affine_to_device(fq, qts)
    one_mask = jnp.zeros(6, dtype=jnp.bool_)
    pj = (pd[0], pd[1], jnp.where(pd[2][None, :], 0, F_ones()))
    qj = (qd[0], qd[1], jnp.where(qd[2][None, :], 0, F_ones()))

    out = E.jac_to_affine(fq, E.jac_add(fq, pj, qj))
    got = E.affine_from_device(fq, out)
    want = [H.ec_add(fq.p, a, b) for a, b in zip(pts, qts)]
    assert got == want

    out2 = E.jac_to_affine(fq, E.jac_double(fq, pj))
    got2 = E.affine_from_device(fq, out2)
    want2 = [H.ec_add(fq.p, a, a) for a in pts]
    assert got2 == want2

    # mixed addition
    out3 = E.jac_to_affine(fq, E.jac_madd(fq, pj, qd))
    got3 = E.affine_from_device(fq, out3)
    assert got3 == want


def F_ones():
    from mpc_jellyfish_tpu.ops import field as F
    return F.ones(fq, (6,))


def scalars_to_device(ss):
    return jnp.asarray(ints_to_limbs(ss, fr.num_limbs))


# All MSM oracle cases share n=256 (the kernel's minimum padded shape) so the
# XLA graph per (c, k) compiles ONCE; distinct c/k values are what actually
# exercise different code paths (window carries, batching).
N = 256


@pytest.fixture(scope="module")
def bases():
    pts = rand_points(N)
    pts[1] = H.AffinePoint.infinity()      # infinity input
    pts[2] = pts[3]                        # duplicate base
    return pts, E.affine_to_device(fq, pts)


def test_msm_batch_vs_host(bases):
    """Batched k=3 MSM: zero scalars, max scalar, equal-scalar blocks."""
    pts, pd = bases
    ss0 = [rng.randrange(fr.p) for _ in range(N)]
    ss0[0] = 0                             # zero scalar
    ss0[4] = fr.p - 1                      # max scalar
    ss1 = [rng.randrange(fr.p) for _ in range(N)]
    for i in range(N // 2):
        ss1[i] = ss1[0]                    # long equal-scalar segments
    ss2 = [0] * N
    ss2[7] = 1                             # single active point
    sss = [ss0, ss1, ss2]
    res = M.msm_batch(fq, pd, [scalars_to_device(s) for s in sss], c=8,
                      force_device=True)
    got = E.affine_from_device(fq, E.jac_to_affine(fq, res))
    for i, ss in enumerate(sss):
        assert got[i] == H.ec_msm(fq.p, pts, ss)


def test_msm_small_window_vs_host(bases):
    """c=4: many windows, carry chains across every limb."""
    pts, pd = bases
    ss = [rng.randrange(fr.p) for _ in range(N)]
    res = M.msm(fq, pd, scalars_to_device(ss), c=4, force_device=True)
    got = E.affine_from_device(
        fq, E.jac_to_affine(fq, tuple(t[:, None] for t in res)))[0]
    assert got == H.ec_msm(fq.p, pts, ss)


def test_msm_cross_limb_windows(bases):
    """c=11: window boundaries straddle 16-bit limb boundaries."""
    pts, pd = bases
    ss = [rng.randrange(fr.p) for _ in range(N)]
    res = M.msm(fq, pd, scalars_to_device(ss), c=11, force_device=True)
    got = E.affine_from_device(
        fq, E.jac_to_affine(fq, tuple(t[:, None] for t in res)))[0]
    assert got == H.ec_msm(fq.p, pts, ss)
