#!/usr/bin/env python
"""Proof of knowledge-of-exponent (mirror of plonk/examples/proof_of_exp.rs).

Statement: for a public twisted-Edwards generator G and public point X,
the prover knows a secret scalar x with X = x*G.  The circuit runs over the
embedding field (Baby Jubjub over BN254's scalar field here; the reference
uses ed-on-bls12-381 over BLS12-381).
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpc_jellyfish_tpu.curves import BN254
import mpc_jellyfish_tpu.relation.gadgets  # noqa: F401 (installs methods)
from mpc_jellyfish_tpu.pcs import kzg
from mpc_jellyfish_tpu.plonk.snark import PlonkKzgSnark, PlonkError
from mpc_jellyfish_tpu.plonk.transcript import StandardTranscript
from mpc_jellyfish_tpu.relation.circuit import PlonkCircuit
from mpc_jellyfish_tpu.utils.te_curve import BABY_JUBJUB as JUB


def proof_of_exponent_circuit(x: int, X) -> PlonkCircuit:
    """proof_of_exp.rs:97-140: fixed-base scalar mul + equality to a public
    point."""
    G = JUB.gen
    assert X == JUB.mul(G, x), "the inputs are incorrect: X != xG"
    cs = PlonkCircuit(BN254.fr)          # TurboPlonk (no lookups needed)
    x_var = cs.create_variable(x)        # fr -> fq lift is the identity here
    X_var = cs.create_public_point_variable(X)
    X_computed = cs.fixed_base_scalar_mul(JUB, x_var, G)
    cs.enforce_point_equal(X_computed, X_var)
    cs.finalize_for_arithmetization()
    return cs


def main():
    rng = random.Random(0)
    x = rng.randrange(JUB.order)
    X = JUB.mul(JUB.gen, x)

    circuit = proof_of_exponent_circuit(x, X)
    print(f"circuit: {circuit.num_gates()} gates, "
          f"domain 2^{circuit.eval_domain_size().bit_length() - 1}")

    srs = kzg.universal_setup_for_testing(BN254, circuit.srs_size(), seed=0)
    snark = PlonkKzgSnark(BN254, transcript_cls=StandardTranscript)
    pk, vk = snark.preprocess(srs, circuit)

    t0 = time.time()
    proof = snark.prove(circuit, pk, rng=random.Random(1), mask=True)
    print(f"prove: {time.time() - t0:.1f}s")

    t0 = time.time()
    snark.verify(vk, circuit.public_input(), proof)
    print(f"verify: {time.time() - t0:.3f}s -> proof ACCEPTED")

    try:
        bad = list(circuit.public_input())
        bad[0] = (bad[0] + 1) % BN254.fr.p
        snark.verify(vk, bad, proof)
        raise AssertionError("verifier accepted a wrong public input")
    except PlonkError:
        print("wrong public input REJECTED (as expected)")


if __name__ == "__main__":
    main()
