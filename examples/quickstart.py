"""Quickstart: build a TurboPlonk circuit, prove, verify.

Plays the role of the reference's example binary
(`plonk/examples/proof_of_exp.rs`) until the in-circuit ECC gadget lands;
proves knowledge of witnesses x, y with  x^5 + 3*x*y + y = out  for a public
`out`.

Run:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python examples/quickstart.py
"""

import random
import sys
import time

sys.path.insert(0, ".")

from mpc_jellyfish_tpu.curves import BN254
from mpc_jellyfish_tpu.relation.circuit import PlonkCircuit
from mpc_jellyfish_tpu.plonk.snark import PlonkKzgSnark, WrongProof
from mpc_jellyfish_tpu.pcs import kzg


def main():
    p = BN254.fr.p
    x_val, y_val = 12345, 67890
    out_val = (pow(x_val, 5, p) + 3 * x_val * y_val + y_val) % p

    cs = PlonkCircuit(BN254.fr)
    x = cs.create_variable(x_val)
    y = cs.create_variable(y_val)
    out = cs.create_public_variable(out_val)
    x5 = cs.pow5(x)
    xy3 = cs.mul_add([x, y, cs.one(), y], [3, 1])   # 3xy + y
    s = cs.add(x5, xy3)
    cs.enforce_equal(s, out)

    cs.check_circuit_satisfiability(cs.public_input())
    cs.finalize_for_arithmetization()
    print(f"circuit: {cs.num_gates()} gates, domain 2^{cs.eval_domain_size().bit_length()-1}")

    snark = PlonkKzgSnark(BN254)
    t0 = time.time()
    srs = kzg.universal_setup_for_testing(BN254, cs.srs_size(), seed=42)
    print(f"setup: {time.time()-t0:.1f}s")
    t0 = time.time()
    pk, vk = snark.preprocess(srs, cs)
    print(f"preprocess: {time.time()-t0:.1f}s")

    t0 = time.time()
    proof = snark.prove(cs, pk, rng=random.Random(0), mask=True)
    print(f"prove: {time.time()-t0:.1f}s")

    t0 = time.time()
    snark.verify(vk, cs.public_input(), proof)
    print(f"verify: {time.time()-t0:.1f}s -> proof ACCEPTED")

    try:
        snark.verify(vk, [(out_val + 1) % p], proof)
        print("ERROR: wrong public input accepted!")
        sys.exit(1)
    except WrongProof:
        print("wrong public input REJECTED (as expected)")


if __name__ == "__main__":
    main()
