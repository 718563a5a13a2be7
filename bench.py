#!/usr/bin/env python
"""Benchmark: TurboPlonk proving time per constraint on the real chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ns/constraint", "vs_baseline": N}

Baseline: reference TurboPlonk BN254 proving at 23,069 ns/constraint on a
24-thread AMD 5900X (BASELINE.md; reference bench.md:14-17).
vs_baseline > 1.0 means faster than the reference CPU implementation.

Env knobs: BENCH_LOG_N (default 12), BENCH_REPS (default 3).
Progress goes to stderr; stdout carries only the JSON line.
"""

import json
import os
import random
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_circuit(spec, log_n):
    """~2^log_n-gate arithmetic circuit (mul/add/lc mix)."""
    from mpc_jellyfish_tpu.relation.circuit import PlonkCircuit
    rng = random.Random(7)
    cs = PlonkCircuit(spec)
    target = (1 << log_n) - 8
    vals = [cs.create_variable(rng.randrange(spec.p)) for _ in range(16)]
    out = cs.create_public_variable(0)
    i = 0
    while cs.num_gates() < target - 2:
        a = vals[i % 16]
        b = vals[(i + 7) % 16]
        if i % 3 == 0:
            vals[i % 16] = cs.mul(a, b)
        elif i % 3 == 1:
            vals[i % 16] = cs.add(a, b)
        else:
            vals[i % 16] = cs.lc([a, b, vals[(i + 3) % 16], vals[(i + 5) % 16]],
                                 [2, 3, 4, 5])
        i += 1
    cs.witness[out] = cs.witness_of(vals[0])
    cs.enforce_equal(vals[0], out)
    return cs


def main():
    log_n = int(os.environ.get("BENCH_LOG_N", "14"))
    reps = int(os.environ.get("BENCH_REPS", "2"))

    t0 = time.time()
    import jax
    from mpc_jellyfish_tpu.curves import BN254
    from mpc_jellyfish_tpu.plonk.snark import PlonkKzgSnark
    from mpc_jellyfish_tpu.pcs import kzg
    log(f"jax backend: {jax.default_backend()}, devices: {jax.devices()} "
        f"({time.time()-t0:.1f}s import)")

    t0 = time.time()
    cs = build_circuit(BN254.fr, log_n)
    cs.finalize_for_arithmetization()
    n = cs.eval_domain_size()
    log(f"circuit: {cs.num_gates()} gates, domain n=2^{n.bit_length()-1} "
        f"({time.time()-t0:.1f}s build)")

    snark = PlonkKzgSnark(BN254)
    t0 = time.time()
    srs = kzg.universal_setup_for_testing(BN254, cs.srs_size(), seed=3)
    log(f"srs: {time.time()-t0:.1f}s")
    t0 = time.time()
    pk, vk = snark.preprocess(srs, cs)
    log(f"preprocess: {time.time()-t0:.1f}s")

    # warmup (compile)
    t0 = time.time()
    proof = snark.prove(cs, pk, rng=random.Random(0), mask=True)
    log(f"warmup prove (incl. compile): {time.time()-t0:.1f}s")

    times = []
    for r in range(reps):
        t0 = time.time()
        proof = snark.prove(cs, pk, rng=random.Random(r + 1), mask=True)
        times.append(time.time() - t0)
        log(f"prove[{r}]: {times[-1]:.2f}s")

    t0 = time.time()
    snark.verify(vk, cs.public_input(), proof)
    log(f"verify: {time.time()-t0:.1f}s (proof accepted)")

    best = min(times)
    ns_per_constraint = best * 1e9 / n
    baseline = 23069.0
    print(json.dumps({
        "metric": f"turboplonk_prove_ns_per_constraint_bn254_n{n}",
        "value": round(ns_per_constraint, 1),
        "unit": "ns/constraint",
        "vs_baseline": round(baseline / ns_per_constraint, 4),
    }))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
