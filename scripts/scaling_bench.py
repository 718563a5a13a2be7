#!/usr/bin/env python
"""Distributed NTT / MSM scaling-efficiency harness (BASELINE north star:
>= 70% efficiency at 2^24 across a pod slice).

Runs the sharded kernels (parallel/sharded.py) over meshes of 1, 2, 4, ...
devices at a fixed global size and reports per-mesh wall times and scaling
efficiency  eff(k) = t(1) / (k * t(k)).

On real multi-chip hardware this measures ICI scaling; on the virtual CPU
mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu)
it validates correctness and sharding at large shapes (times are not
meaningful there -- the host is one socket).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/scaling_bench.py --log-n 20 --op ntt
Env/args: --log-n (global size), --op {ntt,msm,both}, --reps.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=20)
    ap.add_argument("--op", choices=["ntt", "msm", "both"], default="both")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import random

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mpc_jellyfish_tpu.curves import BN254
    from mpc_jellyfish_tpu.ops import ec as E
    from mpc_jellyfish_tpu.parallel import sharded as S
    from mpc_jellyfish_tpu.utils import ec_host as H
    from mpc_jellyfish_tpu.utils.bigint import ints_to_limbs

    spec, fq = BN254.fr, BN254.fq
    n = 1 << args.log_n
    rng = random.Random(0)
    ndev = len(jax.devices())
    mesh_sizes = [k for k in (1, 2, 4, 8, 16, 32) if k <= ndev]
    print(f"devices: {ndev} x {jax.devices()[0].platform}, n = 2^{args.log_n}")

    results = {}

    if args.op in ("ntt", "both"):
        base_vals = np.random.default_rng(1).integers(
            0, 1 << 60, size=n, dtype=np.uint64).tolist()
        times = {}
        for k in mesh_sizes:
            mesh = Mesh(np.array(jax.devices()[:k]), ("shard",))
            dn = S.DistributedNTT(spec, n, mesh, "shard")
            x = spec.to_device(base_vals).reshape(spec.num_limbs, dn.n1, dn.n2)
            x = jax.device_put(x, NamedSharding(mesh, P(None, None, "shard")))
            y = dn.forward(x)          # compile
            jax.block_until_ready(y)
            best = min(_timeit(lambda: dn.forward(x), args.reps))
            times[k] = best
            eff = times[1] / (k * best) if 1 in times else float("nan")
            print(f"ntt 2^{args.log_n}  mesh={k}: {best*1e3:8.1f} ms   "
                  f"eff={eff:5.2f}")
        results["ntt"] = times

    if args.op in ("msm", "both"):
        npts = min(n, 1 << max(10, args.log_n - 4))
        G = H.AffinePoint(*BN254.g1_gen)
        # affine points from a cheap doubling chain (exact host gen at 2^24
        # would dominate the run)
        pts, cur = [], G
        for _ in range(min(npts, 4096)):
            pts.append(cur)
            cur = H.ec_add(fq.p, cur, cur)
        reps_needed = (npts + len(pts) - 1) // len(pts)
        pts = (pts * reps_needed)[:npts]
        ss = [rng.randrange(spec.p) for _ in range(npts)]
        times = {}
        for k in mesh_sizes:
            mesh = Mesh(np.array(jax.devices()[:k]), ("shard",))
            pd = E.affine_to_device(fq, pts)
            pd = tuple(jax.device_put(
                t, NamedSharding(mesh, P(None, "shard") if t.ndim == 2
                                 else P("shard"))) for t in pd)
            sd = jax.device_put(jnp.asarray(ints_to_limbs(ss, spec.num_limbs)),
                                NamedSharding(mesh, P(None, "shard")))
            r = S.distributed_msm(fq, pd, sd, mesh, "shard", c=12)
            jax.block_until_ready(r)
            best = min(_timeit(
                lambda: S.distributed_msm(fq, pd, sd, mesh, "shard", c=12),
                args.reps))
            times[k] = best
            eff = times[1] / (k * best) if 1 in times else float("nan")
            print(f"msm 2^{npts.bit_length()-1}  mesh={k}: {best*1e3:8.1f} ms   "
                  f"eff={eff:5.2f}")
        results["msm"] = times

    import json
    print(json.dumps({op: {str(k): round(v, 4) for k, v in t.items()}
                      for op, t in results.items()}))


def _timeit(fn, reps):
    import jax
    out = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn())
        out.append(time.time() - t0)
    return out


if __name__ == "__main__":
    main()
