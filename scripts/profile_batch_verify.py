"""Profile batch_verify(k=1000) to find the host-side hot spots.

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/profile_batch_verify.py
"""
import cProfile
import os
import pstats
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpc_jellyfish_tpu import curves
from mpc_jellyfish_tpu.plonk.snark import PlonkKzgSnark
from mpc_jellyfish_tpu.pcs import kzg
from mpc_jellyfish_tpu.relation.circuit import PlonkCircuit

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

k = 1000
vks = [vk] * k
pis = [cs.public_input()] * k
proofs = [proof] * k

# warm
assert snark.batch_verify(vks, pis, proofs)
t0 = time.time()
assert snark.batch_verify(vks, pis, proofs)
wall = time.time() - t0
print(f"wall batch x{k}: {wall*1e3:.1f} ms", file=sys.stderr)

pr = cProfile.Profile()
pr.enable()
snark.batch_verify(vks, pis, proofs)
pr.disable()
st = pstats.Stats(pr, stream=sys.stderr)
st.sort_stats("cumulative").print_stats(30)
