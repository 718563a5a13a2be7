#!/usr/bin/env python
"""Benchmark: TurboPlonk proving time per constraint on the real chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ns/constraint", "vs_baseline": N}

Baseline: reference TurboPlonk BN254 proving at 23,069 ns/constraint on a
24-thread AMD 5900X (BASELINE.md; reference bench.md:14-17).
vs_baseline > 1.0 means faster than the reference CPU implementation.

Env knobs: BENCH_LOG_N (default 16), BENCH_REPS (default 3).
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
    """~2^log_n-gate arithmetic circuit (mul/add/lc mix).

    BENCH_PLONK=ultra builds an UltraPlonk circuit instead: the same
    arithmetic mix plus lookup-backed range gates, exercising the Plookup
    rounds 1.5/2.5/4.5 (reference bench.rs UltraPlonk arm)."""
    from mpc_jellyfish_tpu.relation.circuit import PlonkCircuit
    rng = random.Random(7)
    ultra = os.environ.get("BENCH_PLONK", "turbo") == "ultra"
    if ultra:
        cs = PlonkCircuit(spec, ultra_plonk=True, range_bit_len=16)
        target = (1 << log_n) - 8
        vals = [cs.create_variable(rng.randrange(spec.p)) for _ in range(16)]
        out = cs.create_public_variable(0)
        i = 0
        while cs.num_gates() < target * 3 // 4:
            a = vals[i % 16]
            b = vals[(i + 7) % 16]
            if i % 4 == 0:
                r = cs.create_variable(rng.randrange(1 << 32))
                cs.enforce_in_range(r, 32)
            elif i % 4 == 1:
                vals[i % 16] = cs.mul(a, b)
            elif i % 4 == 2:
                vals[i % 16] = cs.add(a, b)
            else:
                vals[i % 16] = cs.lc(
                    [a, b, vals[(i + 3) % 16], vals[(i + 5) % 16]],
                    [2, 3, 4, 5])
            i += 1
        cs.witness[out] = cs.witness_of(vals[0])
        cs.enforce_equal(vals[0], out)
        return cs
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


# reference bench.md:14-25 (24-thread 5900X), ns/constraint
BASELINES = {
    ("turbo", "bn254"): 23069.0,
    ("turbo", "bls12_381"): 29591.0,
    ("turbo", "bw6_761"): 120446.0,
    ("ultra", "bn254"): 33701.0,
    ("ultra", "bls12_381"): 41747.0,
    ("ultra", "bw6_761"): 162476.0,
}
# reference bench.md:15-16 single / 1000-proof batch verify (ms)
VERIFY_BASELINES = {"bn254": (1.459, 6.540), "bls12_381": (2.083, 7.445),
                    "bw6_761": (10.885, 19.615)}


def bench_size(curve, log_n: int, reps: int, srs=None):
    """Prove at one size; returns (n, best_prove_s, verify_s, srs)."""
    import random as _r
    from mpc_jellyfish_tpu.plonk.snark import PlonkKzgSnark
    from mpc_jellyfish_tpu.pcs import kzg

    t0 = time.time()
    cs = build_circuit(curve.fr, log_n)
    cs.finalize_for_arithmetization()
    n = cs.eval_domain_size()
    log(f"circuit: {cs.num_gates()} gates, domain n=2^{n.bit_length()-1} "
        f"({time.time()-t0:.1f}s build)")

    snark = PlonkKzgSnark(curve)
    if srs is None or srs.max_degree < cs.srs_size():
        t0 = time.time()
        # repo-local: survives environment resets (a wiped $HOME cost the
        # round-3 driver run a 250s SRS regeneration at 2^16)
        cache_dir = os.environ.get(
            "MPC_JELLYFISH_TPU_SRS_CACHE",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".srs_cache"))
        os.makedirs(cache_dir, exist_ok=True)
        path = os.path.join(cache_dir,
                            f"{curve.name}-{cs.srs_size()}-s3.npz")
        if os.path.exists(path):
            srs = kzg.UniversalSrs.load(path, curve)
            log(f"srs: {time.time()-t0:.1f}s (disk cache)")
        else:
            srs = kzg.universal_setup_for_testing(curve, cs.srs_size(), seed=3)
            srs.save(path)
            log(f"srs: {time.time()-t0:.1f}s (generated + cached)")
    t0 = time.time()
    pk, vk = snark.preprocess(srs, cs)
    log(f"preprocess: {time.time()-t0:.1f}s")

    # warmup (compile)
    t0 = time.time()
    proof = snark.prove(cs, pk, rng=_r.Random(0), mask=True)
    log(f"warmup prove (incl. compile): {time.time()-t0:.1f}s")

    times = []
    for r in range(reps):
        t0 = time.time()
        proof = snark.prove(cs, pk, rng=_r.Random(r + 1), mask=True)
        times.append(time.time() - t0)
        log(f"prove[{r}]: {times[-1]:.2f}s")

    # steady-state verify (reference bench.md:15 is a criterion hot loop)
    tv = 1e9
    for _ in range(10):
        t0 = time.time()
        snark.verify(vk, cs.public_input(), proof)
        tv = min(tv, time.time() - t0)
    log(f"verify: {tv*1e3:.2f} ms hot (proof accepted)")
    return n, min(times), tv, srs


def bench_collaborative(curve, log_n: int, reps: int):
    """Single vs collaborative (2-party mock-MPC) prover latency
    (reference plonk/benches/collaborative_proof.rs)."""
    import random as _r
    from mpc_jellyfish_tpu.multiprover.fabric import MockFabric
    from mpc_jellyfish_tpu.multiprover.circuit import MpcPlonkCircuit
    from mpc_jellyfish_tpu.multiprover.snark import MultiproverPlonkKzgSnark
    from mpc_jellyfish_tpu.plonk.snark import PlonkKzgSnark
    from mpc_jellyfish_tpu.pcs import kzg

    spec = curve.fr
    rng = _r.Random(7)

    def build(cs, mk):
        vals = [mk(rng.randrange(spec.p)) for _ in range(8)]
        acc = vals[0]
        while cs.num_gates() < (1 << log_n) - 8:
            acc = cs.mul(acc, vals[cs.num_gates() % 8])
        return acc

    plain = __import__("mpc_jellyfish_tpu.relation.circuit",
                       fromlist=["PlonkCircuit"]).PlonkCircuit(spec)
    acc = build(plain, plain.create_variable)
    out = plain.create_public_variable(plain.witness_of(acc))
    plain.enforce_equal(acc, out)
    plain.finalize_for_arithmetization()

    snark = PlonkKzgSnark(curve)
    srs = kzg.universal_setup_for_testing(curve, plain.srs_size(), seed=21)
    pk, vk = snark.preprocess(srs, plain)

    # time the single prove BEFORE the MPC side exists: the fabric's
    # preloaded triple pool is millions of live Python objects at larger
    # n, and the memory pressure skewed a post-MPC single-prove timing by
    # ~60x in the round-4 sweep
    proof = snark.prove(plain, pk, rng=_r.Random(9), mask=True)   # warm
    t0 = time.time()
    proof = snark.prove(plain, pk, rng=_r.Random(0), mask=True)
    single = time.time() - t0
    snark.verify(vk, plain.public_input(), proof)

    fab = MockFabric(spec, seed=5)
    mpc = MpcPlonkCircuit(fab)
    rng = _r.Random(7)
    acc_m = build(mpc, lambda v: mpc.create_variable(fab.share_scalars([v])))
    out_m = mpc.create_public_variable(
        fab.share_scalars([plain.witness_of(out)]))
    mpc.enforce_equal(acc_m, out_m)
    mpc.finalize_for_arithmetization()

    # warmup (compile); the warmup collaborative prove also RECORDS the
    # Beaver-triple consumption plan so the timed run draws from a
    # preloaded pool — the reference's criterion bench likewise excludes
    # the offline phase (its mock Beaver source is a constant, ark-mpc
    # test_helpers)
    mpc_snark = MultiproverPlonkKzgSnark(curve)
    fab.triple_log.clear()           # drop circuit-build draws from the plan
    cproof = mpc_snark.prove(fab, mpc, pk)
    plan = list(fab.triple_log)
    fab.preload_triples(plan)

    t0 = time.time()
    cproof = mpc_snark.prove(fab, mpc, pk)
    collab = time.time() - t0
    snark.verify(vk, plain.public_input(), cproof)
    log(f"single prove: {single:.2f}s, collaborative (2-party mock): "
        f"{collab:.2f}s (x{collab / single:.1f}); both verified "
        f"({fab.n_triples} triples, {fab.n_openings} opening rounds)")
    return plain.eval_domain_size(), single, collab


def bench_batch_verify(curve, log_n: int, k: int):
    """Single vs k-proof batch verification (reference bench.md:15-16:
    1.459 ms single / 6.540 ms for 1000 proofs on BN254)."""
    import random as _r
    from mpc_jellyfish_tpu.plonk.snark import PlonkKzgSnark
    from mpc_jellyfish_tpu.pcs import kzg

    cs = build_circuit(curve.fr, log_n)
    cs.finalize_for_arithmetization()
    snark = PlonkKzgSnark(curve)
    srs = kzg.universal_setup_for_testing(curve, cs.srs_size(), seed=3)
    pk, vk = snark.preprocess(srs, cs)
    proof = snark.prove(cs, pk, rng=_r.Random(0), mask=True)
    snark.verify(vk, cs.public_input(), proof)   # warm

    t_single = 1e9
    for _ in range(10):
        t0 = time.time()
        snark.verify(vk, cs.public_input(), proof)
        t_single = min(t_single, time.time() - t0)
    # k DISTINCT proof objects (deep copies), so every instance pays the
    # full transcript + scalar work — a matched workload vs the reference
    # bench (bench.rs:129-167 clones its proof k times; its verifier does
    # full per-instance work, verifier.rs:195-252).  The round-4 committed
    # 5.33 ms figure used [proof]*k through an id()-keyed dedup and is
    # retracted — see README.md changelog.
    import copy as _copy
    vks = [vk] * k
    pis = [list(cs.public_input()) for _ in range(k)]
    proofs = [_copy.deepcopy(proof) for _ in range(k)]
    # min of 3 hot runs — the reference number is a criterion hot-loop
    # statistic (bench.rs:129-167), not a first-call time
    t_batch = 1e9
    for _ in range(3):
        t0 = time.time()
        assert snark.batch_verify(vks, pis, proofs)
        t_batch = min(t_batch, time.time() - t0)
    log(f"verify single: {t_single*1e3:.2f} ms, batch x{k}: "
        f"{t_batch*1e3:.1f} ms ({t_batch/k*1e3:.3f} ms/proof)")
    return t_single, t_batch


def bench_merkle_path(height: int, reps: int):
    """Rescue Merkle path lookup+verify (reference
    primitives/benches/merkle_path.rs:14-28, height 20; no committed
    upstream number — criterion target only)."""
    from mpc_jellyfish_tpu.curves import BN254
    from mpc_jellyfish_tpu.primitives.merkle import RescueMerkleTree

    spec = BN254.fr
    tree = RescueMerkleTree.from_elems(spec, height, list(range(2000)))
    commitment = tree.commitment()
    elem, proof = tree.lookup(5)
    # warm
    assert RescueMerkleTree.verify(spec, commitment, 5, proof)
    t0 = time.time()
    for _ in range(reps):
        assert RescueMerkleTree.verify(spec, commitment, 5, proof)
    t = (time.time() - t0) / reps
    log(f"rescue merkle path verify (height {height}): {t*1e3:.2f} ms")
    return t


def main():
    log_n = int(os.environ.get("BENCH_LOG_N", "16"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    curve_name = os.environ.get("BENCH_CURVE", "bn254")
    sweep = os.environ.get("BENCH_SWEEP", "")

    t0 = time.time()
    import jax
    from mpc_jellyfish_tpu import curves
    curve = curves.CURVES[curve_name]
    log(f"jax backend: {jax.default_backend()}, devices: {jax.devices()} "
        f"({time.time()-t0:.1f}s import)")

    if os.environ.get("BENCH_MERKLE", ""):
        height = int(os.environ.get("BENCH_MERKLE"))
        t = bench_merkle_path(height, max(reps, 10))
        print(json.dumps({
            "metric": f"rescue_merkle_path_verify_h{height}",
            "value": round(t * 1e3, 3),
            "unit": "ms",
            "vs_baseline": 1.0,   # no committed upstream number (BASELINE.md)
        }))
        return

    if os.environ.get("BENCH_BATCH_VERIFY", ""):
        k = int(os.environ.get("BENCH_BATCH_VERIFY"))
        t_single, t_batch = bench_batch_verify(curve, log_n, k)
        base_single, base_batch = VERIFY_BASELINES[curve_name]
        print(json.dumps({
            "metric": f"batch_verify_{k}_{curve_name}_ms",
            "value": round(t_batch * 1e3, 2),
            "unit": "ms",
            "vs_baseline": round(base_batch / (t_batch * 1e3), 4),
        }))
        return

    if os.environ.get("BENCH_COLLAB", "") == "1":
        n, single, collab = bench_collaborative(curve, log_n, reps)
        print(json.dumps({
            "metric": f"collaborative_prove_overhead_{curve_name}_n{n}",
            "value": round(collab / single, 3),
            "unit": "x_single_prover",
            "vs_baseline": round(single / collab, 4),
        }))
        return

    if sweep:
        # prove/verify sweep (reference plonk/benches/bench.rs:22-60 style);
        # per-size lines to stderr, driver JSON (largest size) to stdout
        srs = None
        results = []
        for ln in [int(s) for s in sweep.split(",")]:
            n, tp, tv, srs = bench_size(curve, ln, reps, srs)
            ns = tp * 1e9 / n
            log(f"SWEEP {curve_name} n=2^{ln}: prove {tp:.3f}s "
                f"({ns:.0f} ns/constraint), verify {tv*1000:.1f} ms")
            results.append((n, ns))
        n, ns_per_constraint = results[-1]
    else:
        n, tp, tv, _ = bench_size(curve, log_n, reps)
        ns_per_constraint = tp * 1e9 / n

    plonk_type = os.environ.get("BENCH_PLONK", "turbo")
    baseline = BASELINES[(plonk_type, curve_name)]
    print(json.dumps({
        "metric": f"{plonk_type}plonk_prove_ns_per_constraint_{curve_name}_n{n}",
        "value": round(ns_per_constraint, 1),
        "unit": "ns/constraint",
        "vs_baseline": round(baseline / ns_per_constraint, 4),
    }))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
