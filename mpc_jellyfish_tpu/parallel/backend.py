"""Pluggable prover kernel backends: single-chip vs mesh-sharded.

The Plonk prover's round logic (plonk/prover.py) is backend-agnostic: all
domain-sized kernels (iNTT, coset NTT, grand-product cumprod, commitment
MSMs) go through a `Backend` object.  `DefaultBackend` is the single-chip
path; `ShardedBackend` shards the evaluation domain over a
`jax.sharding.Mesh` axis and routes through the distributed kernels of
`parallel/sharded.py` — field math is exact, so the two backends produce
BIT-IDENTICAL proofs (tested on the virtual CPU mesh).

This is the TPU analog of the reference's rayon data-parallelism
(SURVEY.md §2.6): `RAYON_NUM_THREADS` becomes the mesh axis size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import field as F
from ..ops import msm as M
from ..ops import ntt as N
from ..ops import poly as PY
from ..ops import ec as E
from ..ops.field import FieldSpec


class DefaultBackend:
    """Single-chip kernels (the existing hot path)."""

    def intt(self, domain, x):
        return N.intt(domain, x)

    def ntt(self, domain, x):
        return N.ntt(domain, x)

    def coset_ntt(self, domain, coeffs, table):
        return N.coset_ntt(domain, coeffs, table)

    def coset_intt(self, domain, evals, table):
        return N.coset_intt(domain, evals, table)

    def cumprod(self, spec, x):
        return F.cumprod(spec, x, axis=1)

    def commit_batch(self, ck, polys):
        from ..pcs import kzg
        return kzg.commit_batch(ck, polys)

    def divide_by_linear(self, spec, coeffs, z):
        return PY.divide_by_linear(spec, coeffs, z)


class ShardedBackend(DefaultBackend):
    """Evaluation domain sharded over one mesh axis.

    NTTs use the four-step `DistributedNTT` (one in-kernel all_to_all) with
    two layout conversions to keep the prover's standard coefficient order
    (3 transposes total — the known cost of ordered distributed FFTs).
    Small, non-power-of-two work (opening division, masked-poly tails)
    stays single-chip; the O(n log n) and O(n) kernels shard.
    """

    def __init__(self, mesh: Mesh, axis: str = "shard",
                 min_shard_n: int = 64):
        self.mesh = mesh
        self.axis = axis
        self.d = mesh.shape[axis]
        self.min_shard_n = max(min_shard_n, 4 * self.d * self.d)
        self._dntts: dict = {}

    def _dntt(self, domain):
        key = (domain.spec.name, domain.n)
        if key not in self._dntts:
            from .sharded import DistributedNTT
            self._dntts[key] = DistributedNTT(domain.spec, domain.n,
                                              self.mesh, self.axis)
        return self._dntts[key]

    def _shardable(self, domain) -> bool:
        return domain.n >= self.min_shard_n

    # -- layout conversions (standard order <-> four-step order) ---------
    @staticmethod
    def _restore(out, like):
        """Give `out` the same placement as the caller's input: internal
        sharding stays an implementation detail, so the surrounding glue
        (concats/elementwise with single-device arrays) is unaffected and
        bit-equality with the single-chip path holds trivially."""
        return jax.device_put(out, like.sharding)

    def _ntt_std(self, domain, x, inverse: bool):
        """[L, n] standard order in/out; x may also be [L, B, n]."""
        spec = domain.spec
        dn = self._dntt(domain)
        if x.ndim == 3:
            cols = [self._ntt_std(domain, x[:, i], inverse)
                    for i in range(x.shape[1])]
            return jnp.stack(cols, axis=1)
        L = x.shape[0]
        if inverse:
            # evals X[k]: view [L, k2, k1] -> class layout [L, k1, k2]
            v = jnp.swapaxes(x.reshape(L, dn.n2, dn.n1), 1, 2)
            v = jax.device_put(v, NamedSharding(self.mesh,
                                                P(None, self.axis, None)))
            c = dn.inverse(v)                     # [L, j1, j2] sharded j2
            out = c.reshape(L, domain.n)
        else:
            v = x.reshape(L, dn.n1, dn.n2)
            v = jax.device_put(v, NamedSharding(self.mesh,
                                                P(None, None, self.axis)))
            y = dn.forward(v)                     # [L, k1, k2] sharded k1
            out = jnp.swapaxes(y, 1, 2).reshape(L, domain.n)
        return self._restore(out, x)

    def intt(self, domain, x):
        if not self._shardable(domain):
            return N.intt(domain, x)
        return self._ntt_std(domain, x, inverse=True)

    def ntt(self, domain, x):
        if not self._shardable(domain):
            return N.ntt(domain, x)
        return self._ntt_std(domain, x, inverse=False)

    def coset_ntt(self, domain, coeffs, table):
        if not self._shardable(domain):
            return N.coset_ntt(domain, coeffs, table)
        pows = table.pows if coeffs.ndim == 2 else table.pows[:, None, :]
        return self.ntt(domain, F.mul(domain.spec, coeffs, pows))

    def coset_intt(self, domain, evals, table):
        if not self._shardable(domain):
            return N.coset_intt(domain, evals, table)
        y = self.intt(domain, evals)
        pows = table.pows_inv if y.ndim == 2 else table.pows_inv[:, None, :]
        return F.mul(domain.spec, y, pows)

    def cumprod(self, spec, x):
        n = x.shape[-1]
        if n < self.min_shard_n or n % self.d:
            return F.cumprod(spec, x, axis=1)
        from .sharded import distributed_cumprod
        xs = jax.device_put(x, NamedSharding(self.mesh, P(None, self.axis)))
        return self._restore(
            distributed_cumprod(spec, xs, self.mesh, self.axis), x)

    # All sharded commit calls pad the poly count k up to a multiple of
    # this, so the prover's four commit rounds (k = 5 wires, 1 grand
    # product, 5 quotient splits, 2 opening proofs) share ONE compiled
    # mesh program instead of three (each distinct k is a separate
    # ~45s XLA:CPU shard_map compile in the driver's cold dryrun).
    K_PAD = 6

    def commit_batch(self, ck, polys):
        """Batched KZG commit over mesh-sharded points/scalars: ALL k polys
        go through ONE distributed MSM program (per-call dispatch overhead
        on a CPU mesh is ~12s regardless of size; k calls cost k times
        that — round-4 sharded-prove trace)."""
        from .sharded import distributed_msm_batch
        fq, fr = ck.curve.fq, ck.curve.fr
        nmax = ck.powers_of_g[0].shape[1]
        if nmax < self.min_shard_n:
            return super().commit_batch(ck, polys)
        # pad SRS + scalars to a multiple of (d * 128) for even shards
        blk = self.d * 128
        n_pad = (nmax + blk - 1) // blk * blk
        pts = getattr(ck, "_sharded_points", None)
        if pts is None or pts[0].shape[-1] != n_pad:
            x, y, inf = ck.powers_of_g
            padn = n_pad - nmax
            x = jnp.concatenate([x, F.ones(fq, (padn,))], axis=1)
            y = jnp.concatenate([y, F.ones(fq, (padn,))], axis=1)
            inf = jnp.concatenate(
                [inf, jnp.ones((padn,), dtype=jnp.bool_)])
            sh2 = NamedSharding(self.mesh, P(None, self.axis))
            sh1 = NamedSharding(self.mesh, P(self.axis))
            pts = (jax.device_put(x, sh2), jax.device_put(y, sh2),
                   jax.device_put(inf, sh1))
            ck._sharded_points = pts
        sh3 = NamedSharding(self.mesh, P(None, None, self.axis))
        sc_list = []
        for c in polys:
            sc = F.from_mont(fr, c)
            pad = n_pad - sc.shape[-1]
            if pad:
                sc = jnp.concatenate(
                    [sc, jnp.zeros((fr.num_limbs, pad), dtype=sc.dtype)],
                    axis=1)
            sc_list.append(sc)
        k = len(sc_list)
        k_pad = (k + self.K_PAD - 1) // self.K_PAD * self.K_PAD
        zero = jnp.zeros((fr.num_limbs, n_pad), dtype=sc_list[0].dtype)
        sc_list.extend([zero] * (k_pad - k))
        scalars = jax.device_put(jnp.stack(sc_list), sh3)
        jac = distributed_msm_batch(fq, pts, scalars, self.mesh, self.axis)
        jac = tuple(t[:, :k] for t in jac)
        aff = E.jac_to_affine(fq, jac)
        return E.affine_from_device(fq, aff)
