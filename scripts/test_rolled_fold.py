#!/usr/bin/env python
"""A/B the bucket-tail kernel fold: unrolled halving levels (current, 9
jacadd inlines, ~246s Mosaic compile) vs a ROLLED fori_loop fold with
dynamic lane slices (3 inlines).  Checks Mosaic accepts unaligned dynamic
lane offsets, result parity vs the XLA tree, compile time, runtime.

OUTCOME (round 4, v5e): the rolled variant is NOT lowerable —
`dynamic_slice` on kernel arrays is unimplemented in Mosaic TC — so the
unrolled kernel stays.  NOTE the parity leg of this script is only
meaningful for REAL curve points: it feeds random (x, y, z) triples, and
complete-add formulas are only order-independent on the curve group, so
a "MISMATCH" here is an artifact of the input, not a kernel bug (the
authoritative check is scripts/check_msm_tpu.py's host-Pippenger oracle,
which passes on-chip).
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mpc_jellyfish_tpu.curves import BN254
    from mpc_jellyfish_tpu.ops import ec as E, field as F, msm as M

    spec = BN254.fq
    L = spec.num_limbs
    H = L // 2
    U32 = jnp.uint32
    P_LIMBS = tuple(np.uint32(v) for v in spec.p_limbs)
    N0INV = np.uint32(spec.n0inv)
    ONE_MONT = tuple(np.uint32(v) for v in spec.mont_one_np)
    MASK = np.uint32(0xFFFF)

    J, JB, B, BB = 24, 8, 512, 128
    nb = B // BB

    def make_rolled_kernel():
        def unpack_arr(ref):
            out = []
            for i in range(H):
                v = ref[i]
                out.append(v & MASK)
                out.append(v >> 16)
            return out

        def kernel(sx_ref, sy_ref, sz_ref, bx_ref, by_ref, bz_ref, have_ref,
                   ox_ref, oy_ref, oz_ref, ax, ay, az):
            b_blk = pl.program_id(1)
            Sin = (unpack_arr(sx_ref), unpack_arr(sy_ref), unpack_arr(sz_ref))
            Sbp = (unpack_arr(bx_ref), unpack_arr(by_ref), unpack_arr(bz_ref))
            X, Y, Z = M._jacadd_kernel_math(P_LIMBS, N0INV, ONE_MONT, L,
                                            Sin, Sbp)
            have = have_ref[...] > 0
            one = [jnp.full_like(X[0], np.uint32(v)) for v in ONE_MONT]
            X = [jnp.where(have, x, o) for x, o in zip(X, one)]
            Y = [jnp.where(have, y, o) for y, o in zip(Y, one)]
            Z = [jnp.where(have, z, jnp.zeros_like(z)) for z in Z]

            @pl.when(b_blk == 0)
            def _init():
                for i in range(L):
                    ax[i] = X[i]
                    ay[i] = Y[i]
                    az[i] = Z[i]

            @pl.when(b_blk > 0)
            def _acc():
                acc = ([ax[i] for i in range(L)], [ay[i] for i in range(L)],
                       [az[i] for i in range(L)])
                nX, nY, nZ = M._jacadd_kernel_math(P_LIMBS, N0INV, ONE_MONT,
                                                   L, acc, (X, Y, Z))
                for i in range(L):
                    ax[i] = nX[i]
                    ay[i] = nY[i]
                    az[i] = nZ[i]

            @pl.when(b_blk == nb - 1)
            def _fold():
                half = BB // 2
                Xf = [ax[i] for i in range(L)]
                Yf = [ay[i] for i in range(L)]
                Zf = [az[i] for i in range(L)]

                def body(i, XYZ):
                    Xc, Yc, Zc = XYZ
                    off = jnp.int32(BB) >> (i + 1)

                    def lo(t):
                        return t[:, :half]

                    def hi(t):
                        return jax.lax.dynamic_slice(
                            t, (jnp.int32(0), off), (JB, half))

                    s = M._jacadd_kernel_math(
                        P_LIMBS, N0INV, ONE_MONT, L,
                        ([lo(t) for t in Xc], [lo(t) for t in Yc],
                         [lo(t) for t in Zc]),
                        ([hi(t) for t in Xc], [hi(t) for t in Yc],
                         [hi(t) for t in Zc]))

                    def put(full, s_):
                        return [jnp.concatenate([a, b[:, half:]], axis=1)
                                for a, b in zip(s_, full)]

                    return (put(Xc, s[0]), put(Yc, s[1]), put(Zc, s[2]))

                Xf, Yf, Zf = jax.lax.fori_loop(
                    0, BB.bit_length() - 1, body, (Xf, Yf, Zf))
                for i in range(H):
                    ox_ref[i] = Xf[2 * i][:, :1] | (Xf[2 * i + 1][:, :1] << 16)
                    oy_ref[i] = Yf[2 * i][:, :1] | (Yf[2 * i + 1][:, :1] << 16)
                    oz_ref[i] = Zf[2 * i][:, :1] | (Zf[2 * i + 1][:, :1] << 16)

        return kernel

    def rolled_tail(S_in, S_bp, have):
        kernel = make_rolled_kernel()
        grid = (J // JB, nb)
        blk = lambda j, b: (0, j, b)
        return pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((H, J, 1), U32)] * 3,
            grid=grid,
            in_specs=[pl.BlockSpec((H, JB, BB), blk,
                                   memory_space=pltpu.VMEM)] * 6
            + [pl.BlockSpec((JB, BB), lambda j, b: (j, b),
                            memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((H, JB, 1), lambda j, b: (0, j, 0),
                                    memory_space=pltpu.VMEM)] * 3,
            scratch_shapes=[pltpu.VMEM((L, JB, BB), U32)] * 3,
        )(*S_in, *S_bp, have.astype(U32))

    # random-but-valid inputs: arbitrary field elements as jac coords is
    # fine for ADD-formula parity (complete-add selects only branch on
    # exact equalities, vanishingly unlikely here)
    rng = np.random.default_rng(0)

    def rnd(shape):
        return jnp.asarray(rng.integers(0, 1 << 16, size=shape,
                                        dtype=np.uint32))

    S_in = tuple(rnd((H, J, B)) for _ in range(3))
    S_bp = tuple(rnd((H, J, B)) for _ in range(3))
    have = jnp.asarray(rng.integers(0, 2, size=(J, B), dtype=np.int32)) > 0

    # XLA reference
    Su = tuple(M._unpack_rows(t) for t in S_in)
    Bu = tuple(M._unpack_rows(t) for t in S_bp)
    T = E.jac_add(spec, Su, Bu)
    inf = E.jac_infinity(spec, (J, B))
    T = M._sel_tuple(have, T, inf)
    ref = jax.jit(lambda t: M._tree_sum_ec_rolled(spec, t))(T)
    ref_aff = E.affine_from_device(spec, E.jac_to_affine(spec, ref))

    # current unrolled kernel
    t0 = time.time()
    cur = jax.jit(lambda a, b, h: M._bucket_tail_pallas(spec, a, b, h))(
        S_in, S_bp, have)
    cur0 = tuple(M._unpack_rows(t[..., 0]) for t in cur)
    jax.device_get(cur0[0][:1, :1])
    print(f"unrolled kernel compile+run: {time.time()-t0:.1f}s", flush=True)
    cur_aff = E.affine_from_device(spec, E.jac_to_affine(spec, cur0))
    print("unrolled parity:",
          "OK" if cur_aff == ref_aff else "MISMATCH", flush=True)

    t0 = time.time()
    try:
        out = jax.jit(rolled_tail)(S_in, S_bp, have)
        o0 = tuple(M._unpack_rows(t[..., 0]) for t in out)
        jax.device_get(o0[0][:1, :1])
        print(f"rolled kernel compile+run: {time.time()-t0:.1f}s", flush=True)
        aff = E.affine_from_device(spec, E.jac_to_affine(spec, o0))
        print("rolled parity:",
              "OK" if aff == ref_aff else "MISMATCH", flush=True)
        for lbl, fn in (("unrolled", lambda: jax.jit(
            lambda a, b, h: M._bucket_tail_pallas(spec, a, b, h))(
                S_in, S_bp, have)),
                ("rolled", lambda: jax.jit(rolled_tail)(S_in, S_bp, have))):
            best = 1e9
            for _ in range(5):
                t0 = time.time()
                r = fn()
                jax.device_get(r[0].reshape(-1)[:1])
                best = min(best, time.time() - t0)
            print(f"{lbl} runtime: {best*1e3:.2f} ms", flush=True)
    except Exception as e:
        print(f"rolled kernel FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
