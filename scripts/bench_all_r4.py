#!/usr/bin/env python
"""Round-4 bench sweep in ONE process (one axon client, no handoffs).

The remote-TPU tunnel wedges for ~10 min whenever a client is killed or
replaced, so per-mode bench invocations compound stalls.  This driver runs
every mode sequentially inside a single process and writes the per-mode
JSON artifacts bench.py would have produced.

Also regenerates the committed .tpu_cache: run after `rm -rf .tpu_cache`
so the driver's cold start hits exactly these artifacts.
"""

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# NO trace: the per-stage trace marks insert block_until_ready syncs into
# the commit path and break round pipelining (measured ~flat but keep the
# timed numbers honest)

import bench as B

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def write(name, obj):
    with open(os.path.join(ROOT, name), "w") as f:
        f.write(json.dumps(obj) + "\n")
    print(f"WROTE {name}: {obj}", file=sys.stderr, flush=True)


def main():
    from mpc_jellyfish_tpu import curves
    import jax
    curve = curves.CURVES["bn254"]
    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          file=sys.stderr, flush=True)
    t_start = time.time()

    def mark(label):
        print(f"== [{time.time()-t_start:7.1f}s] {label}", file=sys.stderr,
              flush=True)

    srs = None

    # 1. TurboPlonk 2^16 — the driver's default metric
    mark("turbo 2^16")
    n, tp, tv, srs = B.bench_size(curve, 16, 3, srs)
    ns = tp * 1e9 / n
    write("bench_r4_16.json", {
        "metric": f"turboplonk_prove_ns_per_constraint_bn254_n{n}",
        "value": round(ns, 1), "unit": "ns/constraint",
        "vs_baseline": round(B.BASELINES[("turbo", "bn254")] / ns, 4)})

    # 2. TurboPlonk 2^14 — small-n latency floor (VERDICT item 5)
    mark("turbo 2^14")
    n, tp, tv, _ = B.bench_size(curve, 14, 3, srs)
    ns = tp * 1e9 / n
    write("bench_r4_14.json", {
        "metric": f"turboplonk_prove_ns_per_constraint_bn254_n{n}",
        "value": round(ns, 1), "unit": "ns/constraint",
        "vs_baseline": round(B.BASELINES[("turbo", "bn254")] / ns, 4)})

    # 3. TurboPlonk 2^10 — the round-3 Pallas-crash shape (regression)
    mark("turbo 2^10 (r3 crash-shape regression)")
    n, tp, tv, _ = B.bench_size(curve, 10, 1, srs)
    print(f"2^10 prove {tp:.3f}s verify {tv*1e3:.1f}ms (no crash)",
          file=sys.stderr, flush=True)

    # 4. 1k batch verify at 2^15 (reference bench.md:16 headline)
    mark("batch verify 1000 @ 2^15")
    t_single, t_batch = B.bench_batch_verify(curve, 15, 1000)
    base_single, base_batch = B.VERIFY_BASELINES["bn254"]
    write("bench_r4_batchverify.json", {
        "metric": "batch_verify_1000_bn254_ms",
        "value": round(t_batch * 1e3, 2), "unit": "ms",
        "vs_baseline": round(base_batch / (t_batch * 1e3), 4),
        "single_ms": round(t_single * 1e3, 3),
        "single_vs_baseline": round(base_single / (t_single * 1e3), 4)})

    # 5. UltraPlonk 2^17 (VERDICT item 6: >= 1.3)
    mark("ultra 2^17")
    os.environ["BENCH_PLONK"] = "ultra"
    n, tp, tv, _ = B.bench_size(curve, 17, 3, None)
    ns = tp * 1e9 / n
    write("bench_r4_ultra17.json", {
        "metric": f"ultraplonk_prove_ns_per_constraint_bn254_n{n}",
        "value": round(ns, 1), "unit": "ns/constraint",
        "vs_baseline": round(B.BASELINES[("ultra", "bn254")] / ns, 4)})
    os.environ["BENCH_PLONK"] = "turbo"

    # 6. TurboPlonk 2^20
    mark("turbo 2^20")
    n, tp, tv, _ = B.bench_size(curve, 20, 2, None)
    ns = tp * 1e9 / n
    write("bench_r4_20.json", {
        "metric": f"turboplonk_prove_ns_per_constraint_bn254_n{n}",
        "value": round(ns, 1), "unit": "ns/constraint",
        "vs_baseline": round(B.BASELINES[("turbo", "bn254")] / ns, 4)})

    # 7. Collaborative vs single: runs SEPARATELY on the CPU backend at
    # the round-3 comparison size (BENCH_COLLAB=1 BENCH_LOG_N=10
    # env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python bench.py) —
    # the Python mock fabric is host-bound and does not need the chip.

    # 8. Rescue Merkle path verify, height 20
    mark("merkle h20")
    t = B.bench_merkle_path(20, 10)
    write("bench_r4_merkle.json", {
        "metric": "rescue_merkle_path_verify_h20",
        "value": round(t * 1e3, 3), "unit": "ms", "vs_baseline": 1.0})

    mark("ALL DONE")


if __name__ == "__main__":
    main()
