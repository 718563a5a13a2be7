"""MXU (int8-matmul) field linear algebra vs exact bignum + butterfly NTT."""

import random

from mpc_jellyfish_tpu.curves import BN254
from mpc_jellyfish_tpu.ops import field as F, ntt as N
from mpc_jellyfish_tpu.ops import mxu_field as MX, mxu_ntt as MXN

spec = BN254.fr
P = spec.p


class TestMxuFieldMatmul:
    def test_exact_vs_bignum(self):
        rng = random.Random(3)
        for (r, k, C, near_p) in [(8, 8, 4, False), (128, 128, 8, True)]:
            gen = (lambda: P - 1 - rng.randrange(3)) if near_p \
                else (lambda: rng.randrange(P))
            A = [[gen() for _ in range(k)] for _ in range(r)]
            X = [[gen() for _ in range(C)] for _ in range(k)]
            ad = MX.const_matrix_digits(spec, A)
            xd = spec.to_device([v for row in X for v in row]).reshape(
                spec.num_limbs, k, C)
            got = spec.from_device(
                MX.field_matmul_const(spec, ad, xd).reshape(
                    spec.num_limbs, r * C))
            want = [sum(A[i][j] * X[j][c] for j in range(k)) % P
                    for i in range(r) for c in range(C)]
            assert got == want


class TestMxuNtt:
    def test_matches_butterfly(self):
        rng = random.Random(5)
        for n in (64, 256, 1024):
            dom = N.Domain(spec, n)
            vals = [rng.randrange(P) for _ in range(n)]
            x = spec.to_device(vals)
            assert (spec.from_device(MXN.ntt_mxu(dom, x))
                    == spec.from_device(N.ntt(dom, x)))
            assert (spec.from_device(MXN.ntt_mxu(dom, x, inverse=True))
                    == spec.from_device(N.intt(dom, x)))

    def test_roundtrip_batched(self):
        rng = random.Random(6)
        n = 512
        dom = N.Domain(spec, n)
        vals = [rng.randrange(P) for _ in range(2 * n)]
        x = spec.to_device(vals).reshape(spec.num_limbs, 2, n)
        y = MXN.ntt_mxu(dom, x)
        back = MXN.ntt_mxu(dom, y, inverse=True)
        assert spec.from_device(back.reshape(spec.num_limbs, 2 * n)) == vals
