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


@pytest.mark.parametrize("n", [1, 7, 50])
def test_msm_vs_host(n):
    pts = rand_points(n)
    ss = [rng.randrange(fr.p) for _ in range(n)]
    if n >= 7:
        ss[0] = 0                          # zero scalar
        pts[1] = H.AffinePoint.infinity()  # infinity input
        pts[2] = pts[3]                    # duplicate base
        ss[4] = fr.p - 1                   # max scalar
    pd = E.affine_to_device(fq, pts)
    sd = scalars_to_device(ss)
    res = M.msm(fq, pd, sd, c=8, force_device=True)
    got = E.affine_from_device(fq, E.jac_to_affine(fq, tuple(t[:, None] for t in res)))[0]
    want = H.ec_msm(fq.p, pts, ss)
    assert got == want


@pytest.mark.parametrize("n,c,lanes", [(64, 4, 8), (100, 8, 16), (256, 8, 4)])
def test_msm_chunked_vs_host(n, c, lanes):
    """Chunked O(n) accumulation vs host oracle, incl. boundary-heavy cases."""
    pts = rand_points(n)
    ss = [rng.randrange(fr.p) for _ in range(n)]
    # force long segments spanning many lanes: big blocks of equal scalars
    for i in range(n // 2):
        ss[i] = ss[0]
    pd = E.affine_to_device(fq, pts)
    sd = scalars_to_device(ss)
    res = M.msm(fq, pd, sd, c=c, lanes=lanes, force_device=True)
    got = E.affine_from_device(fq, E.jac_to_affine(fq, tuple(t[:, None] for t in res)))[0]
    want = H.ec_msm(fq.p, pts, ss)
    assert got == want


def test_msm_batch_vs_host():
    n = 40
    pts = rand_points(n)
    pd = E.affine_to_device(fq, pts)
    sss = [[rng.randrange(fr.p) for _ in range(n)] for _ in range(3)]
    sds = [scalars_to_device(ss) for ss in sss]
    res = M.msm_batch(fq, pd, sds, c=8, lanes=8, force_device=True)
    got = E.affine_from_device(fq, E.jac_to_affine(fq, res))
    for i, ss in enumerate(sss):
        assert got[i] == H.ec_msm(fq.p, pts, ss)


def test_msm_cross_limb_windows():
    n = 24
    pts = rand_points(n)
    ss = [rng.randrange(fr.p) for _ in range(n)]
    pd = E.affine_to_device(fq, pts)
    sd = scalars_to_device(ss)
    res = M.msm(fq, pd, sd, c=11, lanes=8, force_device=True)
    got = E.affine_from_device(fq, E.jac_to_affine(fq, tuple(t[:, None] for t in res)))[0]
    assert got == H.ec_msm(fq.p, pts, ss)
