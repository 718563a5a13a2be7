#!/usr/bin/env python
"""Stage-level timing of the batched MSM pipeline on the real chip.

The commit MSMs are ~0.65s of the 1.0s prove at 2^16 (VERDICT r3 weak #4);
the scan-kernel flops alone are ~10ms, so the pipeline must be dominated by
glue (digit extraction, per-job sort, point gathers, bucket tree).  This
script times cumulative prefixes of the pipeline to attribute the gap.

Usage:  python scripts/profile_msm_stages.py [log_n] [k] [c]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, args, reps=5, label=""):
    import jax

    def touch(out):
        # block_until_ready is NOT sufficient on the axon remote backend —
        # execution is only forced by an actual D2H fetch
        for leaf in jax.tree_util.tree_leaves(out):
            jax.device_get(leaf.reshape(-1)[:1])

    f = jax.jit(fn)
    touch(f(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        touch(f(*args))
        best = min(best, time.time() - t0)
    print(f"{label:34s} {best * 1e3:8.2f} ms", flush=True)
    return best


def main():
    import random

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mpc_jellyfish_tpu.curves import BN254
    from mpc_jellyfish_tpu.ops import ec as E, field as F, msm as M
    from mpc_jellyfish_tpu.utils import ec_host as H
    from mpc_jellyfish_tpu.utils.bigint import ints_to_limbs

    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    n = (1 << log_n) + 3
    spec, fq = BN254.fr, BN254.fq
    rng = random.Random(0)

    c = int(sys.argv[3]) if len(sys.argv) > 3 else M._pick_c(n)
    C = M._pick_C(((n + 127) // 128) * 128)
    use_pallas = F._use_pallas() and n >= (1 << 11)
    print(f"n={n} k={k} c={c} C={C} pallas={use_pallas} "
          f"backend={jax.default_backend()}")

    # synthetic points (doubling chain, repeated) + random scalars
    G = H.AffinePoint(*BN254.g1_gen)
    base, cur = [], G
    for _ in range(4096):
        base.append(cur)
        cur = H.ec_add(fq.p, cur, cur)
    pts = (base * ((n + 4095) // 4096))[:n]
    points = E.affine_to_device(fq, pts)
    sc = jnp.asarray(ints_to_limbs(
        [rng.randrange(spec.p) for _ in range(k * n)], spec.num_limbs)
    ).reshape(spec.num_limbs, k, n).transpose(1, 0, 2)

    L = spec.num_limbs
    Lr = sc.shape[1]
    W = M.num_windows(Lr, c)
    RB = 2
    R0 = n // C if n % C == 0 else n // C + 1
    R0 = (max(R0, 1) + RB - 1) // RB * RB
    n_pad = C * R0
    J = k * W
    print(f"W={W} J={J} n_pad={n_pad} R={n_pad // C}")

    def prep(points, sc):
        x, y, inf_mask = points
        pad = n_pad - n
        if pad:
            x = jnp.concatenate([x, F.ones(spec, (pad,))], axis=1)
            y = jnp.concatenate([y, F.ones(spec, (pad,))], axis=1)
            inf_mask = jnp.concatenate(
                [inf_mask, jnp.ones((pad,), dtype=jnp.bool_)])
            sc_ = jnp.concatenate(
                [sc, jnp.zeros((k, Lr, pad), dtype=sc.dtype)], axis=2)
        else:
            sc_ = sc
        return x, y, inf_mask, sc_

    def st_digits(points, sc):
        x, y, im, s = prep(points, sc)
        bucket, sign = M.signed_window_digits(s, c)
        return bucket, sign

    def st_sort(points, sc):
        x, y, im, s = prep(points, sc)
        bucket, sign = M.signed_window_digits(s, c)
        bucket = bucket.reshape(J, n_pad)
        sign = sign.reshape(J, n_pad)
        key = jnp.where(im[None, :], 0, bucket)
        iota = jnp.arange(n_pad, dtype=jnp.int32)[None, :] * 2
        packed = jnp.broadcast_to(iota, (J, n_pad)) + sign.astype(jnp.int32)
        kneg, val = jax.lax.sort_key_val(-key, packed, dimension=1)
        return kneg, val

    def st_gather(points, sc):
        x, y, im, s = prep(points, sc)
        bucket, sign = M.signed_window_digits(s, c)
        bucket = bucket.reshape(J, n_pad)
        sign = sign.reshape(J, n_pad)
        key = jnp.where(im[None, :], 0, bucket)
        iota = jnp.arange(n_pad, dtype=jnp.int32)[None, :] * 2
        packed = jnp.broadcast_to(iota, (J, n_pad)) + sign.astype(jnp.int32)
        kneg, val = jax.lax.sort_key_val(-key, packed, dimension=1)
        idx = val >> 1
        y_all = jnp.concatenate([y, F.neg(spec, y)], axis=1)
        if use_pallas:
            x = M._pack_rows(x)
            y_all = M._pack_rows(y_all)
        y_idx = idx + (val & 1) * n_pad
        xs = jnp.take(x, idx, axis=1)
        ys = jnp.take(y_all, y_idx, axis=1)
        return xs, ys, kneg

    def st_full(points, sc):
        return M._msm_batch_jit(spec, points, sc, c, C, use_pallas)

    bench(st_digits, (points, sc), label="digits")
    bench(st_sort, (points, sc), label="digits+sort")
    bench(st_gather, (points, sc), label="digits+sort+gather")
    bench(st_full, (points, sc), label="full msm_batch")


if (__name__ == "__main__" and not os.environ.get("BENCH_MSM_SWEEP")
        and not os.environ.get("MSM_PROF_FINE")):
    main()


def sweep_main():
    """BENCH_MSM_SWEEP=1: c / C parameter sweep of the full msm_batch."""
    import random
    import jax
    import jax.numpy as jnp
    from mpc_jellyfish_tpu.curves import BN254
    from mpc_jellyfish_tpu.ops import ec as E, field as F, msm as M
    from mpc_jellyfish_tpu.utils import ec_host as H
    from mpc_jellyfish_tpu.utils.bigint import ints_to_limbs

    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    n = (1 << log_n) + 3
    spec, fq = BN254.fr, BN254.fq
    rng = random.Random(0)
    G = H.AffinePoint(*BN254.g1_gen)
    base, cur = [], G
    for _ in range(4096):
        base.append(cur)
        cur = H.ec_add(fq.p, cur, cur)
    pts = (base * ((n + 4095) // 4096))[:n]
    points = E.affine_to_device(fq, pts)
    sc = jnp.asarray(ints_to_limbs(
        [rng.randrange(spec.p) for _ in range(k * n)], spec.num_limbs)
    ).reshape(spec.num_limbs, k, n).transpose(1, 0, 2)
    use_pallas = F._use_pallas() and n >= (1 << 11)
    for c in (10, 11, 12):
        for C in (128, 256):
            try:
                bench(lambda p_, s_: M._msm_batch_jit(
                    spec, p_, s_, c, C, use_pallas), (points, sc),
                    reps=3, label=f"msm c={c} C={C}")
            except Exception as e:
                print(f"msm c={c} C={C}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__" and os.environ.get("BENCH_MSM_SWEEP"):
    sweep_main()
    sys.exit(0)


def main2():
    """Finer attribution: digits sub-stages + scan/tail split."""
    import random

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mpc_jellyfish_tpu.curves import BN254
    from mpc_jellyfish_tpu.ops import ec as E, field as F, msm as M
    from mpc_jellyfish_tpu.utils import ec_host as H
    from mpc_jellyfish_tpu.utils.bigint import ints_to_limbs

    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    n = (1 << log_n) + 3
    spec, fq = BN254.fr, BN254.fq
    rng = random.Random(0)

    c = int(sys.argv[3]) if len(sys.argv) > 3 else M._pick_c(n)
    C = M._pick_C(((n + 127) // 128) * 128)
    use_pallas = F._use_pallas() and n >= (1 << 11)
    L = spec.num_limbs
    Lr = 16
    W = M.num_windows(Lr, c)
    RB = 2
    R0 = n // C if n % C == 0 else n // C + 1
    R0 = (max(R0, 1) + RB - 1) // RB * RB
    n_pad = C * R0
    J = k * W
    B = 1 << (c - 1)
    print(f"[fine] n_pad={n_pad} J={J} B={B} R={n_pad // C}")

    G = H.AffinePoint(*BN254.g1_gen)
    base, cur = [], G
    for _ in range(4096):
        base.append(cur)
        cur = H.ec_add(fq.p, cur, cur)
    pts = (base * ((n_pad + 4095) // 4096))[:n_pad]
    points = E.affine_to_device(fq, pts)
    x, y, im = points
    sc = jnp.asarray(ints_to_limbs(
        [rng.randrange(spec.p) for _ in range(k * n_pad)], spec.num_limbs)
    ).reshape(spec.num_limbs, k, n_pad).transpose(1, 0, 2)

    def st_ripple(sc):
        # the carry ripple alone (u_pad construction)
        half = 1 << (c - 1)
        H_ = sum(half << (c * w) for w in range(W))
        Lp = (c * W + 15) // 16 + 1
        h_limbs = [(H_ >> (16 * j)) & 0xFFFF for j in range(Lp)]
        s = sc.astype(jnp.uint32)
        u_limbs = []
        carry = jnp.zeros((k, n_pad), dtype=jnp.uint32)
        for j in range(Lp):
            t = ((s[:, j] if j < Lr else carry * 0)
                 + np.uint32(h_limbs[j]) + carry)
            carry = t >> 16
            u_limbs.append((t & 0xFFFF).astype(jnp.int32))
        return jnp.stack(u_limbs + [u_limbs[0] * 0], axis=1)

    def st_digits_full(sc):
        return M.signed_window_digits(sc, c)

    # scan input prep (sorted gathered tensors) computed ONCE, then the
    # scan / tail stages benched on those fixed inputs
    bucket, sign = M.signed_window_digits(sc, c)
    bucket = bucket.reshape(J, n_pad)
    sign = sign.reshape(J, n_pad)
    key = jnp.where(im[None, :], 0, bucket)
    iota = jnp.arange(n_pad, dtype=jnp.int32)[None, :] * 2
    packed = jnp.broadcast_to(iota, (J, n_pad)) + sign.astype(jnp.int32)
    J_pad = (J + 7) // 8 * 8
    if J_pad != J:
        key = jnp.concatenate(
            [key, jnp.zeros((J_pad - J, n_pad), dtype=key.dtype)], axis=0)
        packed = jnp.concatenate(
            [packed, jnp.zeros((J_pad - J, n_pad), dtype=packed.dtype)],
            axis=0)
        J = J_pad
    kneg, val = jax.lax.sort_key_val(-key, packed, dimension=1)
    idx = val >> 1
    y_all = jnp.concatenate([y, F.neg(spec, y)], axis=1)
    xp = M._pack_rows(x) if use_pallas else x
    yp = M._pack_rows(y_all) if use_pallas else y_all
    y_idx = idx + (val & 1) * n_pad
    xs = jnp.take(xp, idx, axis=1)
    ys = jnp.take(yp, y_idx, axis=1)
    b_desc = -kneg
    valid = b_desc > 0
    Lx = xs.shape[0]
    xs4 = jnp.moveaxis(xs.reshape(Lx, J, C, n_pad // C), 3, 1)
    ys4 = jnp.moveaxis(ys.reshape(Lx, J, C, n_pad // C), 3, 1)
    vv = jnp.moveaxis(valid.reshape(J, C, n_pad // C), 2, 0)
    xs4, ys4, vv = jax.device_put((xs4, ys4, vv))

    def st_scan(xs4, ys4, vv):
        if use_pallas:
            return M._scan_stream_pallas(spec, xs4, ys4, vv)
        return M._scan_stream_xla(spec, xs4, ys4, vv)

    stream = jax.jit(st_scan)(xs4, ys4, vv)
    stream = jax.device_put(stream)
    kneg_d = jax.device_put(kneg)

    def st_tail(stream, kneg):
        R = n_pad // C
        totals = tuple(t[:, R - 1] for t in stream)
        if use_pallas:
            totals = tuple(M._unpack_rows(t) for t in totals)
        blockpref = M._exclusive_lane_prefix(spec, totals)
        bb = -jnp.arange(1, B + 1, dtype=jnp.int32)
        cnt = jax.vmap(lambda a: jnp.searchsorted(a, bb, side="right"))(kneg)
        have = cnt > 0
        i_b = jnp.maximum(cnt - 1, 0)
        l_b = i_b // R
        r_b = i_b % R
        job = jnp.arange(J, dtype=jnp.int32)[:, None]
        flat_stream = r_b * (J * C) + job * C + l_b
        flat_pref = job * C + l_b
        S_in = tuple(jnp.take(t.reshape(Lx, R * J * C),
                              flat_stream.reshape(-1),
                              axis=1).reshape(Lx, J, B) for t in stream)
        if use_pallas:
            S_in = tuple(M._unpack_rows(t) for t in S_in)
        S_bp = tuple(jnp.take(t.reshape(L, J * C), flat_pref.reshape(-1),
                              axis=1).reshape(L, J, B) for t in blockpref)
        T = E.jac_add(spec, S_in, S_bp)
        inf2 = E.jac_infinity(spec, (J, B))
        T = M._sel_tuple(have, T, inf2)
        return M._tree_sum_ec_rolled(spec, T)

    wsums = jax.jit(st_tail)(stream, kneg_d)
    wsums = jax.device_put(wsums)

    def st_combine(wsums):
        full = tuple(t[:, :k * W].reshape(L, k, W) for t in wsums)
        return M._combine_windows(spec, full, c)

    bench(st_ripple, (sc,), label="digits: ripple only")
    bench(st_digits_full, (sc,), label="digits: full")
    bench(st_scan, (xs4, ys4, vv), label="scan kernel only")
    bench(st_tail, (stream, kneg_d), label="tail (pref+searchsort+tree)")
    bench(st_combine, (wsums,), label="window combine (horner)")


if __name__ == "__main__" and os.environ.get("MSM_PROF_FINE", "") == "1":
    main2()
