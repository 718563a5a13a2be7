#!/usr/bin/env python
"""Micro-bench isolated MSM sub-stages on the real chip.

Answers three questions for the round-4 MSM push:
1. did rolling _exclusive_lane_prefix (fori_loop + dynamic roll) regress
   TPU runtime vs the unrolled static version?
2. what inside the ~90ms tail is slow (lane prefix / searchsorted /
   bucket gather / jac_add+tree)?
3. how much does a combined-xy single gather save vs two separate
   x / y_all gathers?
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, args, reps=5, label=""):
    import jax
    f = jax.jit(fn)
    out = f(*args)
    for leaf in jax.tree_util.tree_leaves(out):
        jax.device_get(leaf.reshape(-1)[:1])
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = f(*args)
        for leaf in jax.tree_util.tree_leaves(out):
            jax.device_get(leaf.reshape(-1)[:1])
        best = min(best, time.time() - t0)
    print(f"{label:40s} {best * 1e3:8.2f} ms", flush=True)
    return best


def main():
    import random
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mpc_jellyfish_tpu.curves import BN254
    from mpc_jellyfish_tpu.ops import ec as E, field as F, msm as M

    spec = BN254.fq
    fr = BN254.fr
    rng = random.Random(0)
    L = spec.num_limbs
    J, C, B, n_pad = 168, 128, 512, 65792
    R = n_pad // C
    print(f"L={L} J={J} C={C} B={B} n_pad={n_pad}", flush=True)

    def rnd(shape):
        return jnp.asarray(
            np.random.default_rng(0).integers(0, 1 << 16, size=shape,
                                              dtype=np.uint32))

    # null RTT reference
    bench(lambda a: a + 1, (jnp.ones((8, 128), jnp.uint32),), label="null")

    # -- 1. lane prefix rolled (current) vs unrolled ---------------------
    totals = tuple(rnd((L, J, C)) for _ in range(3))
    bench(lambda t: M._exclusive_lane_prefix(spec, t), (totals,),
          label="lane prefix (current rolled)")

    def prefix_unrolled(totals):
        I32 = jnp.int32
        lane = jnp.arange(C, dtype=I32)
        shifted = tuple(jnp.roll(t, 1, axis=-1) for t in totals)
        inf = E.jac_infinity(spec, totals[0].shape[1:])
        pref = M._sel_tuple(lane >= 1, shifted, inf)
        sh = 1
        while sh < C:
            rolled = tuple(jnp.roll(t, sh, axis=-1) for t in pref)
            added = E.jac_add(spec, pref, rolled)
            pref = M._sel_tuple(lane >= sh + 1, added, pref)
            sh *= 2
        return pref

    bench(prefix_unrolled, (totals,), label="lane prefix (unrolled static)")

    # -- 2. tail parts ---------------------------------------------------
    kneg = -jnp.sort(
        jnp.asarray(np.random.default_rng(1).integers(
            0, B + 1, size=(J, n_pad), dtype=np.int32)), axis=1)[:, ::-1]

    def part_searchsorted(kneg):
        bb = -jnp.arange(1, B + 1, dtype=jnp.int32)
        return jax.vmap(lambda a: jnp.searchsorted(a, bb, side="right"))(kneg)

    bench(part_searchsorted, (kneg,), label="tail: searchsorted")

    stream = tuple(rnd((L // 2, R, J, C)) for _ in range(3))
    cnt = jax.jit(part_searchsorted)(kneg)

    def part_stream_gather(stream, cnt):
        i_b = jnp.maximum(cnt - 1, 0)
        l_b = i_b // R
        r_b = i_b % R
        job = jnp.arange(J, dtype=jnp.int32)[:, None]
        flat_stream = r_b * (J * C) + job * C + l_b
        S_in = tuple(jnp.take(t.reshape(L // 2, R * J * C),
                              flat_stream.reshape(-1),
                              axis=1).reshape(L // 2, J, B) for t in stream)
        return tuple(M._unpack_rows(t) for t in S_in)

    bench(part_stream_gather, (stream, cnt), label="tail: stream gather+unpack")

    T = tuple(rnd((L, J, B)) for _ in range(3))
    bench(lambda t: M._tree_sum_ec_rolled(spec, t), (T,),
          label="tail: bucket tree (rolled)")
    bench(lambda t: M._tree_sum_ec(spec, t), (T,),
          label="tail: bucket tree (unrolled)")

    # -- 3. gather variants ---------------------------------------------
    H = L // 2
    xp = rnd((H, n_pad))
    yp = rnd((H, 2 * n_pad))
    xyp = rnd((2 * H, n_pad))          # x and y stacked: one gather
    idx = jnp.asarray(np.random.default_rng(2).integers(
        0, n_pad, size=(J, n_pad), dtype=np.int32))
    yidx = jnp.asarray(np.random.default_rng(3).integers(
        0, 2 * n_pad, size=(J, n_pad), dtype=np.int32))

    def g2(xp, yp, idx, yidx):
        return jnp.take(xp, idx, axis=1), jnp.take(yp, yidx, axis=1)

    def g1(xyp, idx):
        return jnp.take(xyp, idx, axis=1)

    bench(g2, (xp, yp, idx, yidx), label="gather: separate x + y_all")
    bench(g1, (xyp, idx), label="gather: combined xy (one take)")

    # transposed layout: limbs LAST, gather rows of 2H u32 (96B granule)
    xyT = rnd((n_pad, 2 * H))

    def g1T(xyT, idx):
        return jnp.take(xyT, idx, axis=0)

    bench(g1T, (xyT, idx), label="gather: combined xy, limbs-last")


if __name__ == "__main__":
    main()
