"""Where does a single verify spend its time? (host path: native MSM + pairing)

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/profile_verify_single.py
"""
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpc_jellyfish_tpu import curves
from mpc_jellyfish_tpu.plonk.snark import PlonkKzgSnark
from mpc_jellyfish_tpu.pcs import kzg
from mpc_jellyfish_tpu.relation.circuit import PlonkCircuit
from mpc_jellyfish_tpu import pairing as PR
from mpc_jellyfish_tpu.utils import native

curve = curves.CURVES["bn254"]
spec = curve.fr
rng = random.Random(7)
cs = PlonkCircuit(spec)
vals = [cs.create_variable(rng.randrange(spec.p)) for _ in range(8)]
acc = vals[0]
while cs.num_gates() < 1000:
    acc = cs.mul(acc, vals[cs.num_gates() % 8])
out = cs.create_public_variable(cs.witness_of(acc))
cs.enforce_equal(acc, out)
cs.finalize_for_arithmetization()

snark = PlonkKzgSnark(curve)
srs = kzg.universal_setup_for_testing(curve, cs.srs_size(), seed=3)
pk, vk = snark.preprocess(srs, cs)
proof = snark.prove(cs, pk, rng=random.Random(0), mask=True)
snark.verify(vk, cs.public_input(), proof)

REPS = 50
t0 = time.time()
for _ in range(REPS):
    snark.verify(vk, cs.public_input(), proof)
t_total = (time.time() - t0) / REPS

# isolate the pairing check
from mpc_jellyfish_tpu.plonk.verifier import Verifier
verifier = Verifier(curve, vk.domain_size)
info = verifier.prepare_pcs_info([vk], [cs.public_input()],
                                 __import__("mpc_jellyfish_tpu.plonk.verifier",
                                            fromlist=["BatchProof"]).BatchProof.from_proof(proof))
t0 = time.time()
for _ in range(REPS):
    verifier.prepare_pcs_info([vk], [cs.public_input()],
                              __import__("mpc_jellyfish_tpu.plonk.verifier",
                                         fromlist=["BatchProof"]).BatchProof.from_proof(proof))
t_prep = (time.time() - t0) / REPS

t0 = time.time()
for _ in range(REPS):
    Verifier.batch_verify_opening_proofs(curve, vk.open_key, [info])
t_open = (time.time() - t0) / REPS

# pairing alone
from mpc_jellyfish_tpu.utils.ec_host import ec_neg
a = info.opening_proof
t0 = time.time()
for _ in range(REPS):
    PR.pairing_check(curve, [a, ec_neg(curve.fq.p, a)],
                     [vk.open_key.beta_h, vk.open_key.h])
t_pair = (time.time() - t0) / REPS

print(f"verify total:        {t_total*1e3:.2f} ms", file=sys.stderr)
print(f"  prepare_pcs_info:  {t_prep*1e3:.2f} ms", file=sys.stderr)
print(f"  opening check:     {t_open*1e3:.2f} ms (incl pairing)", file=sys.stderr)
print(f"  pairing alone:     {t_pair*1e3:.2f} ms", file=sys.stderr)
