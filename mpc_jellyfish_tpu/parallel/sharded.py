"""Multi-chip sharded kernels: distributed NTT, cumprod, MSM.

The scaling axis of a PLONK prover is the evaluation-domain size n
(SURVEY.md §5 "long-context" analog); these kernels shard the domain across a
``jax.sharding.Mesh`` axis and use XLA collectives over ICI:

* distributed NTT: Bailey four-step decomposition n = n1 * n2 - local
  n1-NTTs, twiddle scaling, `all_to_all` transpose, local n2-NTTs
  (SURVEY.md §7 step 2; plays the role the reference delegates to
  rayon-parallel arkworks FFTs).
* distributed cumprod: local scan + `all_gather` of per-shard totals
  (grand-product polynomials, constraint_system.rs:1197).
* distributed MSM: local Pippenger window sums + gathered jac-reduction
  (`VariableBaseMSM` parallelism).

Everything works on any mesh size that divides the factor sizes; validated on
a virtual CPU mesh (tests) and designed for ICI on real slices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import field as F
from ..ops import ntt as N
from ..ops import ec as E
from ..ops import msm as M
from ..ops.field import FieldSpec


class DistributedNTT:
    """Four-step NTT over a 1-D mesh axis.

    Input layout:  x viewed as [L, n1, n2], sharded over the LAST axis (n2).
    Output layout: X viewed as [L, n1, n2] with X[k2*n1 + k1] = out[:, k1, k2],
    sharded over the MIDDLE axis (k1)... both expressed as [L, rows, cols]
    arrays sharded on `cols` for uniformity: forward output is [L, n2t, n1]
    tr... concretely:

        fwd:  [L, n1, n2] sharded(cols) -> [L, n1, n2] "transposed eval
              order": out[:, k1, k2] = X[k2*n1 + k1], sharded on k2? No:
              see _fwd_body - output local block is [L, n1/d, n2], i.e. the
              k1 axis is sharded and k2 is local-full.
        inv:  exact inverse of fwd (returns the original layout).

    The pointwise middle of a prover works in the transposed order, so no
    extra global transpose is needed between fwd and inv.
    """

    def __init__(self, spec: FieldSpec, n: int, mesh: Mesh, axis: str,
                 n1: int | None = None):
        self.spec = spec
        self.n = n
        self.mesh = mesh
        self.axis = axis
        d = mesh.shape[axis]
        self.d = d
        if n1 is None:
            n1 = 1 << (n.bit_length() // 2)
            while n1 % d or (n // n1) % d:
                n1 *= 2
                if n1 > n:
                    raise ValueError("mesh axis too large for domain")
        self.n1, self.n2 = n1, n // n1
        assert self.n1 % d == 0 and self.n2 % d == 0
        self.dom1 = N.Domain(spec, self.n1)
        self.dom2 = N.Domain(spec, self.n2)
        self.dom = N.Domain(spec, n)
        # w_n^{j2} row scales, sharded over j2
        pw = F.powers(spec, spec.to_device([self.dom.w])[:, 0], self.n2)
        self.row_scale = jax.device_put(
            pw, NamedSharding(mesh, P(None, axis)))
        pwi = F.powers(spec, spec.to_device([self.dom.w_inv])[:, 0], self.n2)
        self.row_scale_inv = jax.device_put(
            pwi, NamedSharding(mesh, P(None, axis)))

    def _local_ntt(self, dom, xb):
        """Batched local NTT over the last axis of [L, B, n_loc]."""
        y = N._dif(self.spec, xb, dom.twiddles_fwd, dom.log_n)
        return jnp.take(y, dom.bitrev, axis=-1)

    def _local_intt(self, dom, xb):
        y = N._dif(self.spec, xb, dom.twiddles_inv, dom.log_n)
        y = jnp.take(y, dom.bitrev, axis=-1)
        return F.mul_const(self.spec, y, dom.n_inv)

    def forward(self, x):
        """x: [L, n1, n2] sharded on axis 2.  Returns [L, n1, n2] sharded on
        axis 1 with out[:, k1, k2] = X[k2*n1 + k1]."""
        spec, axis = self.spec, self.axis

        def body(xb, row_scale_b):
            # xb: [L, n1, n2/d]; NTT over n1 => transpose to put n1 last
            yb = jnp.swapaxes(xb, 1, 2)                    # [L, n2/d, n1]
            yb = self._local_ntt(self.dom1, yb)            # [L, n2/d, k1=n1]
            # twiddle: * w_n^{j2 * k1} = (w^{j2})^{k1}
            tw = F.powers_outer(spec, row_scale_b, self.n1)  # [L, n2/d, n1]
            yb = F.mul(spec, yb, tw)
            # transpose across devices: split k1, concat j2
            yb = jax.lax.all_to_all(yb, axis, split_axis=2, concat_axis=1,
                                    tiled=True)            # [L, n2, n1/d]
            yb = jnp.swapaxes(yb, 1, 2)                    # [L, n1/d, n2]
            yb = self._local_ntt(self.dom2, yb)            # [L, n1/d, k2=n2]
            return yb

        fn = shard_map(
            body, mesh=self.mesh,
            in_specs=(P(None, None, axis), P(None, axis)),
            out_specs=P(None, axis, None),
        )
        return jax.jit(fn)(x, self.row_scale)

    def inverse(self, y):
        """Inverse of `forward` (returns [L, n1, n2] sharded on axis 2)."""
        spec, axis = self.spec, self.axis

        def body(yb, row_scale_inv_b):
            # yb: [L, n1/d, n2]
            xb = self._local_intt(self.dom2, yb)           # [L, n1/d, j2=n2]
            xb = jnp.swapaxes(xb, 1, 2)                    # [L, n2, n1/d]
            xb = jax.lax.all_to_all(xb, axis, split_axis=1, concat_axis=2,
                                    tiled=True)            # [L, n2/d, n1]
            twi = F.powers_outer(spec, row_scale_inv_b, self.n1)
            xb = F.mul(spec, xb, twi)
            xb = self._local_intt(self.dom1, xb)           # [L, n2/d, n1]
            return jnp.swapaxes(xb, 1, 2)                  # [L, n1, n2/d]

        fn = shard_map(
            body, mesh=self.mesh,
            in_specs=(P(None, axis, None), P(None, axis)),
            out_specs=P(None, None, axis),
        )
        return jax.jit(fn)(y, self.row_scale_inv)


def distributed_cumprod(spec: FieldSpec, x, mesh: Mesh, axis: str):
    """Inclusive field cumprod of [L, n] sharded over the trailing axis."""

    def body(xb):
        local = F.cumprod(spec, xb, axis=1)
        total = local[:, -1:]
        totals = jax.lax.all_gather(total, axis, axis=1, tiled=True)  # [L, d]
        all_pref = F.cumprod(spec, totals, axis=1)
        idx = jax.lax.axis_index(axis)
        prev = jnp.where(idx == 0,
                         F.ones(spec, (1,)),
                         jax.lax.dynamic_slice_in_dim(
                             all_pref, jnp.maximum(idx - 1, 0), 1, axis=1))
        return F.mul(spec, local, prev)

    fn = shard_map(body, mesh=mesh, in_specs=(P(None, axis),),
                   out_specs=P(None, axis))
    return jax.jit(fn)(x)


def distributed_msm(spec: FieldSpec, points, scalars, mesh: Mesh, axis: str,
                    c: int | None = None):
    """MSM with points/scalars sharded over the trailing axis.

    Pipeline (the round-3 version ran a FULL local Pippenger per shard and
    all_gathered finished points, which replicated the O(B * W) bucket-tree
    tail on every shard — total work grew with d and mesh=8 was slower than
    mesh=4, scaling_r3_20.log):

      1. per shard: bucket accumulation over the LOCAL point partition for
         all W windows -> [L, W, B] partial bucket sums (O(n/d) scan work);
      2. `all_to_all` over the WINDOW axis: shard j receives the d partial
         bucket tensors for ITS W/d windows;
      3. per shard: jac-reduce the d partials + bucket tree on W/d windows
         (the former serial tail, now divided by d);
      4. all_gather the [L, W/d] window sums (tiny) + replicated Horner
         window combine (O(bits) doublings, inherent to Pippenger).

    `c` defaults from the LOCAL partition size (smaller shards want smaller
    windows — B = 2^(c-1) tail work is independent of n).
    """
    res = distributed_msm_batch(spec, points, scalars[None], mesh, axis, c)
    return tuple(t[:, 0] for t in res)


def distributed_msm_batch(spec: FieldSpec, points, scalars, mesh: Mesh,
                          axis: str, c: int | None = None):
    """k MSMs over SHARED sharded bases in ONE mesh program.

    scalars: [k, Lr, n] sharded on the trailing axis.  Returns a jacobian
    tuple of [L, k] (replicated).  A k-batch matters on the virtual CPU
    mesh: every distributed_msm execution costs ~12s of per-op dispatch
    overhead regardless of size (round-4 sharded-prove trace), so the
    prover commits a whole round's polynomials in one call.
    """
    d = mesh.shape[axis]
    k, Lr, n = scalars.shape
    n_loc = n // d
    if c is None:
        c = M._pick_c(n_loc)
    W = M.num_windows(Lr, c)
    W_pad = (W + d - 1) // d * d
    Wd = W_pad // d

    def body(xb, yb, infb, sb):
        C = M._pick_C(((n_loc + 127) // 128) * 128)
        T = M._msm_bucket_sums(spec, (xb, yb, infb), sb, c, C, False)
        B = T[0].shape[-1]
        L = T[0].shape[0]
        T = tuple(t.reshape(L, k, W, B) for t in T)
        if W_pad != W:
            inf_pad = E.jac_infinity(spec, (k, W_pad - W, B))
            T = tuple(jnp.concatenate([t, i], axis=2)
                      for t, i in zip(T, inf_pad))
        # window-axis shard transpose: [L, k, W_pad, B] -> [L, d, k, Wd, B]
        # where dim 1 indexes the SOURCE shard and dim 3 this shard's windows
        T = tuple(t.reshape(L, k, d, Wd, B).transpose(0, 2, 1, 3, 4)
                  for t in T)
        T = tuple(jax.lax.all_to_all(t, axis, split_axis=1, concat_axis=1)
                  for t in T)
        # reduce over source shards (log2(d) tree levels, not d-1 serial
        # adds: fewer unrolled jac_add graphs keeps the XLA:CPU shard_map
        # compile inside the driver's dryrun budget), then bucket tree
        m = d
        while m > 1:
            half = m // 2
            lo = tuple(t[:, :half] for t in T)
            hi = tuple(t[:, half:2 * half] for t in T)
            summed = E.jac_add(spec, lo, hi)
            if m % 2:
                T = tuple(jnp.concatenate([s, t[:, 2 * half:]], axis=1)
                          for s, t in zip(summed, T))
                m = half + 1
            else:
                T = summed
                m = half
        acc = tuple(t[:, 0] for t in T)
        wsum = M._tree_sum_ec_rolled(spec, acc)            # [L, k, Wd]
        # gather everyone's window sums and combine (replicated tail)
        gathered = tuple(jax.lax.all_gather(t, axis, axis=2, tiled=True)
                         for t in wsum)                    # [L, k, d*Wd]
        # device j computed windows [j*Wd, (j+1)*Wd); drop the pad
        full = tuple(t[:, :, :W] for t in gathered)        # [L, k, W]
        return M._combine_windows(spec, full, c)           # [L, k]

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(axis), P(None, None, axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,  # result is replicated by construction (all_gather+reduce)
    )
    x, y, inf = points
    return jax.jit(fn)(x, y, inf, scalars)
