#!/usr/bin/env python
"""Regenerate the pinned single-chip proof for dryrun_multichip.

The dryrun compares the mesh-sharded proof byte-for-byte against this
fixture instead of re-proving single-chip inside the driver's time budget
(the live single-chip prove cost ~42s of XLA:CPU compiles that exercise
nothing multi-chip).  The prove is deterministic: seeded witness rng,
seeded SRS, seeded masking rng, exact integer field math — so the bytes
are machine-independent.

Run on the CPU backend:
    JAX_PLATFORMS=cpu python scripts/gen_dryrun_fixture.py
"""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")


def main():
    import __graft_entry__ as g
    from mpc_jellyfish_tpu.curves import BN254
    from mpc_jellyfish_tpu.plonk.snark import PlonkKzgSnark
    from mpc_jellyfish_tpu.pcs import kzg
    from mpc_jellyfish_tpu.utils.serialize import proof_to_bytes

    cs = g._dryrun_prove_circuit()
    srs = kzg.universal_setup_for_testing(BN254, cs.srs_size(), seed=2)
    snark = PlonkKzgSnark(BN254)
    pk, vk = snark.preprocess(srs, cs)
    proof = snark.prove(cs, pk, rng=random.Random(0), mask=True)
    snark.verify(vk, cs.public_input(), proof)
    blob = proof_to_bytes(BN254, proof)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures",
        "dryrun_proof_n256.hex")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write(blob.hex() + "\n")
    print(f"wrote {out} ({len(blob)} proof bytes, n={cs.eval_domain_size()})")


if __name__ == "__main__":
    main()
