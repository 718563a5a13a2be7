#!/usr/bin/env python
"""Prover profiling harness: real-sync per-op timings + roofline estimates.

SURVEY §5 tracing: the reference uses ark-std `start_timer!` spans; here
each hot kernel is timed against its speed-of-light bound on the attached
device (HBM bytes / bandwidth vs VPU madd count / throughput).

NOTE: through the remote-TPU (axon) tunnel `block_until_ready` does NOT
block; every timing below syncs with a real device_get of an output slice.

Optionally wraps the run in a jax.profiler trace (--trace-dir) for xprof.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e-ish speed-of-light constants (override per device)
HBM_GBPS = float(os.environ.get("SOL_HBM_GBPS", "800"))
VPU_GOPS = float(os.environ.get("SOL_VPU_GOPS", "790"))


def sync(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    jax.device_get(leaf[(0,) * (leaf.ndim - 1) + (slice(0, 1),)])


def timeit(fn, *args, reps=3):
    sync(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        sync(fn(*args))
        best = min(best, time.time() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=16)
    ap.add_argument("--trace-dir", default="")
    args = ap.parse_args()

    import random

    import jax
    import jax.numpy as jnp

    from mpc_jellyfish_tpu.curves import BN254
    from mpc_jellyfish_tpu.ops import field as F, ntt as N

    spec = BN254.fr
    L = spec.num_limbs
    n = 1 << args.log_n
    m = 8 * n
    rng = random.Random(0)
    print(f"device: {jax.devices()[0]}, n = 2^{args.log_n}, quot m = 8n")

    if args.trace_dir:
        jax.profiler.start_trace(args.trace_dir)

    dom = N.Domain(spec, n)
    qd = N.Domain(spec, m)
    coset = N.CosetTable(qd)
    x = spec.to_device([rng.randrange(spec.p) for _ in range(m)])
    xb = jnp.broadcast_to(x[:, None], (L, 8, m)).copy()

    def report(name, secs, hbm_bytes, madds):
        sol = max(hbm_bytes / (HBM_GBPS * 1e9), madds / (VPU_GOPS * 1e9))
        bound = "hbm" if hbm_bytes / (HBM_GBPS * 1e9) > \
            madds / (VPU_GOPS * 1e9) else "vpu"
        print(f"{name:34s} {secs*1e3:9.1f} ms   SoL {sol*1e3:7.1f} ms "
              f"({bound})   eff {sol/secs*100:5.1f}%")

    # pointwise field mul
    mulj = jax.jit(lambda a, b: F.mul(spec, a, b))
    t = timeit(mulj, x, x)
    report(f"mul [L,2^{args.log_n+3}]", t, 3 * 4 * L * m, 2 * L * L * m)

    # Fermat inverse
    invj = jax.jit(lambda a: F.inv(spec, a))
    t = timeit(invj, x)
    report(f"inv [L,2^{args.log_n+3}]", t, 380 * 3 * 4 * L * m,
           380 * 2 * L * L * m)

    # NTT (single and batched)
    lg = m.bit_length() - 1
    t = timeit(lambda: N.ntt(qd, x))
    report(f"ntt [L,2^{lg}]", t, lg * 5 * 4 * L * m, lg * L * L * m)
    t = timeit(lambda: N.ntt(qd, xb))
    report(f"ntt [L,8,2^{lg}]", t, 8 * lg * 5 * 4 * L * m,
           8 * lg * L * L * m)

    # coset iNTT (round 3b shape)
    t = timeit(lambda: N.coset_intt(qd, x, coset))
    report(f"coset_intt [L,2^{lg}]", t, (lg + 2) * 5 * 4 * L * m,
           (lg + 2) * L * L * m)

    if args.trace_dir:
        jax.profiler.stop_trace()
        print(f"xprof trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()
