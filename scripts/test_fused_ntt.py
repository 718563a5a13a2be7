"""Quick TPU check: fused NTT vs per-stage path, all variants."""
import os
import sys
import time

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import mpc_jellyfish_tpu.curves as curves  # noqa: E402
from mpc_jellyfish_tpu.ops import ntt as N  # noqa: E402
from mpc_jellyfish_tpu.ops import field as F  # noqa: E402

spec = curves.BN254_FR
rng = np.random.default_rng(0)


def rand_poly(n, B=None):
    shape = (n,) if B is None else (B, n)
    vals = rng.integers(0, spec.p, size=shape, dtype=np.object_) \
        if False else None
    ints = [int(x) for x in rng.integers(0, 2**63, size=int(np.prod(shape)))]
    # full-range field elements via two 63-bit draws
    ints = [(a * (2**63) + b) % spec.p
            for a, b in zip(ints, (int(x) for x in rng.integers(0, 2**63, size=int(np.prod(shape)))))]
    dev = spec.to_device(ints)  # [L, len]
    return dev.reshape(spec.num_limbs, *shape)


def check(name, a, b):
    a = np.asarray(a)
    b = np.asarray(b)
    ok = np.array_equal(a, b)
    print(f"{name}: {'OK' if ok else 'MISMATCH'}")
    if not ok:
        bad = np.argwhere(a != b)
        print("  first diffs:", bad[:5])
        sys.exit(1)


for log_n in (14, 16):
    n = 1 << log_n
    dom = N.Domain(spec, n)
    ct = N.CosetTable(dom)
    for B in (None, 3):
        x = rand_poly(n, B)
        os.environ.pop("MPC_JELLYFISH_NO_FUSED", None)
        for fname, fn, args in (
            ("ntt", N.ntt, (dom,)),
            ("intt", N.intt, (dom,)),
            ("coset_ntt", lambda d, v: N.coset_ntt(d, v, ct), (dom,)),
            ("coset_intt", lambda d, v: N.coset_intt(d, v, ct), (dom,)),
        ):
            fused = fn(*args, x)
            # reference: per-stage jit path (bypass plan dispatch)
            if fname == "ntt":
                ref = N._ntt_jit(dom, x, dom.twiddles_fwd, dom.bitrev)
            elif fname == "intt":
                ref = N._intt_jit(dom, x, dom.twiddles_inv, dom.bitrev)
            elif fname == "coset_ntt":
                ref = N._coset_ntt_jit(dom, x, ct.pows, dom.twiddles_fwd,
                                       dom.bitrev)
            else:
                ref = N._coset_intt_jit(dom, x, ct.pows_inv,
                                        dom.twiddles_inv, dom.bitrev)
            check(f"n=2^{log_n} B={B} {fname}", fused, ref)

print("all fused-NTT checks passed")
