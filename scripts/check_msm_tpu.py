#!/usr/bin/env python
"""On-chip MSM correctness (vs exact host Pippenger) + timing.

Usage: python scripts/check_msm_tpu.py [log_n] [k]
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from mpc_jellyfish_tpu.curves import BN254
    from mpc_jellyfish_tpu.ops import ec as E, field as F, msm as M
    from mpc_jellyfish_tpu.utils import ec_host as H
    from mpc_jellyfish_tpu.utils.bigint import ints_to_limbs

    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    n = (1 << log_n) + 3
    spec, fq = BN254.fr, BN254.fq
    rng = random.Random(0)
    print(f"n={n} k={k} backend={jax.default_backend()}", flush=True)

    G = H.AffinePoint(*BN254.g1_gen)
    base, cur = [], G
    for _ in range(4096):
        base.append(cur)
        cur = H.ec_add(fq.p, cur, cur)
    pts = (base * ((n + 4095) // 4096))[:n]
    points = E.affine_to_device(fq, pts)
    scal = [rng.randrange(spec.p) for _ in range(k * n)]
    sc = jnp.asarray(ints_to_limbs(scal, spec.num_limbs)).reshape(
        spec.num_limbs, k, n).transpose(1, 0, 2)

    t0 = time.time()
    res = M.msm_batch(fq, points, sc, force_device=True)
    got = E.affine_from_device(fq, E.jac_to_affine(fq, res))
    print(f"first call (incl compile): {time.time()-t0:.1f}s", flush=True)

    ok = True
    for i in range(k):
        want = H.ec_msm_fast(fq.p, pts, scal[i * n:(i + 1) * n])
        if (got[i].x, got[i].y, got[i].inf) != (want.x, want.y, want.inf):
            ok = False
            print(f"MISMATCH poly {i}", flush=True)
    print("correctness:", "OK" if ok else "FAILED", flush=True)

    best = 1e9
    for _ in range(5):
        t0 = time.time()
        res = M.msm_batch(fq, points, sc, force_device=True)
        jax.device_get(res[0].reshape(-1)[:1])
        best = min(best, time.time() - t0)
    print(f"msm_batch k={k} n={n}: {best*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
