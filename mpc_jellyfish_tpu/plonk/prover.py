"""Plonk IOP prover - device compute path.

Mirror of `plonk/src/proof_system/prover.rs` re-designed for TPU dataflow:
every round is (a chain of) jitted JAX programs over limb tensors; only
commitments, challenges and evaluations cross the host boundary (for the
Fiat-Shamir transcript).

Transfer discipline: device dispatches are asynchronous and effectively
free, but every *synchronous* host<->device crossing pays the full link
latency.  Each round therefore does exactly one host->device upload of its
scalars (challenges, mask coefficients, power tables) and one device->host
download (the round's commitments / evaluations, via `kzg.commit_batch`).

Hot path (SURVEY.md §3.1): round 1 = W iNTTs + one batched-W MSM; round 2 =
grand product (batched Fermat inverse + log-depth cumprod) + iNTT + MSM;
round 3 = ~25 coset NTTs on the 8n quotient domain + pointwise constraint
evaluation + coset iNTT + one batched-W MSM; round 5 = two linear-division
openings + one batched MSM.

Per-domain constants (1/(n(x-1)) etc. on the coset) are cached on the Prover
- they are proof-independent (computed once with a batched inverse).
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp

_TRACE = os.environ.get("MPC_JELLYFISH_TPU_TRACE", "") == "1"


def _trb(label, t0, *sync):
    """Blocking sub-trace point (only under MPC_JELLYFISH_TPU_TRACE=1)."""
    if _TRACE:
        if sync:
            jax.block_until_ready(sync)
        print(f"      [prover] {label}: {time.time() - t0:.2f}s",
              file=sys.stderr, flush=True)
    return time.time()

from ..ops import field as F
from ..ops import ntt as N
from ..ops import poly as P
from ..ops.field import FieldSpec
from ..pcs import kzg
from .structs import Challenges, Oracles, ProofEvaluations

GATE_WIDTH = 4


def _const(spec: FieldSpec, x: int):
    """Host int -> [L, 1] Montgomery device constant (one small upload)."""
    return spec.to_device([x])


def upload(spec: FieldSpec, ints: list):
    """Host ints -> [L, k] Montgomery device tensor (single upload)."""
    return spec.to_device(list(ints))


class Prover:
    """Domain-bound prover state (mirror of prover.rs `Prover`)."""

    def __init__(self, spec: FieldSpec, domain_size: int, num_wire_types: int,
                 backend=None):
        from ..parallel.backend import DefaultBackend
        self.be = backend if backend is not None else DefaultBackend()
        self.spec = spec
        self.n = domain_size
        self.num_wire_types = num_wire_types
        ratio = (num_wire_types * (domain_size + 1) + 2) // domain_size + 1
        m = ratio * domain_size
        m = 1 << (m - 1).bit_length()          # Radix2 rounds up (ark GeneralEvaluationDomain)
        self.m = m
        self.domain = N.Domain(spec, domain_size)
        self.quot_domain = N.Domain(spec, m)
        self.coset = N.CosetTable(self.quot_domain)    # shift by field generator
        self.size_ratio = m // domain_size

    # -- cached per-domain coset constants ------------------------------
    @functools.cached_property
    def coset_elements(self):
        """[L, m] evaluation points x = g * w_m^i (Montgomery)."""
        spec = self.spec
        wm = _const(spec, self.quot_domain.w)[:, 0]
        pw = F.powers(spec, wm, self.m)
        return F.mul_const(spec, pw, spec.generator)

    @functools.cached_property
    def zh_inv_coset(self):
        """[L, m] 1/Z_H(x) on the coset (periodic with period m/n)."""
        spec = self.spec
        r = self.size_ratio
        gn = pow(spec.generator, self.n, spec.p)
        wmn = pow(self.quot_domain.w, self.n, spec.p)  # m/n-th root of unity
        vals = [(gn * pow(wmn, i, spec.p) - 1) % spec.p for i in range(r)]
        inv = [pow(v, -1, spec.p) for v in vals]
        tile = spec.to_device(inv)                     # [L, r]
        return jnp.tile(tile, (1, self.n))             # [L, m] (period r)

    @functools.cached_property
    def inv_n_x_minus_1(self):
        """[L, m] 1/(n * (x - 1)) on the coset."""
        spec = self.spec
        n_inv = _const(spec, pow(self.n, -1, spec.p))
        diff = F.sub(spec, self.coset_elements, F.ones(spec, (1,)))
        return F.mul(spec, F.inv(spec, diff), n_inv)

    @functools.cached_property
    def inv_n_x_minus_gn(self):
        """[L, m] w^{n-1}/(n * (x - w^{n-1})) on the coset (lagrange_n)."""
        spec = self.spec
        g_inv = pow(self.domain.w, -1, spec.p)         # w^{n-1} = w^-1
        coeff = _const(spec, g_inv * pow(self.n, -1, spec.p) % spec.p)
        diff = F.sub(spec, self.coset_elements, _const(spec, g_inv))
        return F.mul(spec, F.inv(spec, diff), coeff)

    # -- helpers ---------------------------------------------------------
    def _mask_polys(self, coeffs_list, hiding_bound: int, rng, mask: bool,
                    out_len: int, mask_dev=None):
        """Mask k polynomials: poly_i + Z_H * rand_i(deg=hiding_bound), padded
        to out_len, with a single host->device upload for all mask coeffs
        (reference prover.rs:463-486).  `mask_dev` [L, k, hiding_bound+1] may
        be pre-uploaded (fused with the round's other constants)."""
        spec = self.spec
        padded = []
        for coeffs in coeffs_list:
            cur = coeffs.shape[1]
            if cur < out_len:
                coeffs = jnp.concatenate(
                    [coeffs, F.zeros(spec, (out_len - cur,))], axis=1)
            padded.append(coeffs)
        if not mask:
            return padded
        k = len(coeffs_list)
        b = hiding_bound + 1
        if mask_dev is None:
            flat = [rng.randrange(spec.p) for _ in range(k * b)]
            mask_dev = upload(spec, flat).reshape(spec.num_limbs, k, b)
        out = []
        for i, coeffs in enumerate(padded):
            masked = P.mul_by_vanishing(spec, mask_dev[:, i], self.n)
            out.append(P.add_padded(spec, coeffs, masked)[:, :out_len])
        return out

    def coset_fft(self, coeffs):
        """Pad to m and evaluate on the coset of the quotient domain."""
        spec = self.spec
        cur = coeffs.shape[1]
        if cur < self.m:
            coeffs = jnp.concatenate([coeffs, F.zeros(spec, (self.m - cur,))], axis=1)
        return self.be.coset_ntt(self.quot_domain, coeffs, self.coset)

    # -- fused-round plumbing ----------------------------------------------
    @functools.cached_property
    def _fusable(self) -> bool:
        """Round-level fusion only on the single-chip backend; the sharded
        backend keeps the eager per-kernel path (its device_put sharding
        transitions don't belong inside one executable)."""
        from ..parallel.backend import DefaultBackend
        return type(self.be) is DefaultBackend

    @staticmethod
    def _msm_scalars(spec, padded, nck: int):
        """[L, k, len] Montgomery polys -> [k, L, nck] normal-form MSM
        scalars (from_mont + zero-pad fused into the round's jit)."""
        sc = jnp.moveaxis(F.from_mont(spec, padded), 1, 0)
        cur = sc.shape[-1]
        if cur < nck:
            sc = jnp.concatenate(
                [sc, jnp.zeros(sc.shape[:2] + (nck - cur,), sc.dtype)],
                axis=-1)
        return sc

    @staticmethod
    def _zh_mask(spec, md, n: int, out_len: int):
        """Z_H(X) * rand(X) as an [L, k, out_len] tensor; md [L, k, b]."""
        b = md.shape[-1]
        k = md.shape[1]
        return jnp.concatenate([
            F.neg(spec, md),
            F.zeros(spec, (k, n - b)),
            md,
            F.zeros(spec, (k, out_len - n - b)),
        ], axis=2)

    # -- round 1 ----------------------------------------------------------
    def run_1st_round(self, ck, wire_values, rng, mask: bool,
                      dev_comms: bool = False):
        """wire_values: [L, W, n] eval tensor (one upload for all wires).
        Returns (comms, polys); with dev_comms the commitments stay on
        device as an affine batch (device-FS path)."""
        out_len = self.n + 3
        W = wire_values.shape[1]
        if not self._fusable:
            batched = self.be.intt(self.domain, wire_values)     # [L, W, n]
            polys = [batched[:, i] for i in range(W)]
            polys = self._mask_polys(polys, 1, rng, mask, out_len)
            comms = self.be.commit_batch(ck, polys)
            return comms, polys

        # fused: iNTT + masking + from_mont prep in ONE executable, then one
        # batched MSM - two dispatches for the whole round
        spec = self.spec
        n = self.n
        b = 2
        md = upload(spec, [rng.randrange(spec.p) for _ in range(W * b)]
                    if mask else [0] * (W * b)).reshape(spec.num_limbs, W, b)
        nck = ck.powers_of_g[0].shape[1]
        tag, intt_fn, intt_args = N.intt_kernel(self.domain)

        def fn(wv, md_, *targs):
            batched = intt_fn(wv, *targs)
            padded = jnp.concatenate(
                [batched, F.zeros(spec, (W, out_len - n))], axis=2)
            if mask:
                padded = F.add(spec, padded,
                               self._zh_mask(spec, md_, n, out_len))
            return padded, self._msm_scalars(spec, padded, nck)

        from ..utils.aot_cache import cached_jit
        t0 = time.time()
        f = cached_jit(f"r1{tag}-{spec.name}-n{n}-W{W}-msk{int(mask)}"
                       f"-nck{nck}", fn, wire_values, md, *intt_args,
                   deps=("ntt", "prover"))
        t0 = _trb("r1 get-exe", t0)
        padded, sc = f(wire_values, md, *intt_args)
        t0 = _trb("r1 intt+mask+prep", t0, sc)
        if dev_comms:
            comms = kzg.commit_batch_stacked_dev(ck, sc)
        else:
            comms = kzg.commit_batch_stacked(ck, sc)
        _trb("r1 commit", t0)
        return comms, [padded[:, i] for i in range(W)]

    def pub_input_poly(self, pi_values):
        return self.be.intt(self.domain, pi_values)

    # -- round 2: permutation grand product -------------------------------
    def run_2nd_round(self, ck, wire_values, id_evals, sigma_evals, beta, gamma,
                      rng, mask: bool, dev_comms: bool = False):
        """Grand product z(X) (reference constraint_system.rs:1197-1223).
        beta/gamma: host ints OR device [L, 1] Montgomery tensors
        (device-FS)."""
        spec = self.spec
        n = self.n
        # one upload: beta, gamma, and the 3 hiding coefficients
        mask_coeffs = [rng.randrange(spec.p) for _ in range(3)] if mask \
            else [0, 0, 0]
        if isinstance(beta, int):
            bg = upload(spec, [beta, gamma] + mask_coeffs)
        else:
            bg = jnp.concatenate([beta, gamma, upload(spec, mask_coeffs)],
                                 axis=1)
        if not self._fusable:
            beta_d = bg[:, :1]
            gamma_d = bg[:, 1:2]
            mask_dev = bg[:, 2:5].reshape(spec.num_limbs, 1, 3)
            num = F.ones(spec, (n,))
            den = F.ones(spec, (n,))
            for w, idp, sg in zip(wire_values, id_evals, sigma_evals):
                t = F.add(spec, w, gamma_d)
                num = F.mul(spec, num, F.add(spec, t, F.mul(spec, beta_d, idp)))
                den = F.mul(spec, den, F.add(spec, t, F.mul(spec, beta_d, sg)))
            ratio = F.mul(spec, num, F.inv(spec, den))
            prod = self.be.cumprod(spec, ratio)
            z_evals = jnp.concatenate([F.ones(spec, (1,)), prod[:, :n - 1]],
                                      axis=1)
            coeffs = self.be.intt(self.domain, z_evals)
            coeffs = self._mask_polys([coeffs], 2, rng, mask, n + 3,
                                      mask_dev=mask_dev)[0]
            comm = self.be.commit_batch(ck, [coeffs])[0]
            return comm, coeffs

        # fused: num/den accumulation + Fermat inverse + cumprod + iNTT +
        # masking + MSM prep in ONE executable
        W = len(wire_values)
        wv = jnp.stack(list(wire_values), axis=1)
        idv = jnp.stack(list(id_evals), axis=1)
        sgv = jnp.stack(list(sigma_evals), axis=1)
        out_len = n + 3
        nck = ck.powers_of_g[0].shape[1]
        tag, intt_fn, intt_args = N.intt_kernel(self.domain)

        def fn(wv_, idv_, sgv_, bg_, *targs):
            beta_d = bg_[:, :1]
            gamma_d = bg_[:, 1:2]
            md = bg_[:, 2:5].reshape(spec.num_limbs, 1, 3)
            num = F.ones(spec, (n,))
            den = F.ones(spec, (n,))
            for j in range(W):
                t = F.add(spec, wv_[:, j], gamma_d)
                num = F.mul(spec, num,
                            F.add(spec, t, F.mul(spec, beta_d, idv_[:, j])))
                den = F.mul(spec, den,
                            F.add(spec, t, F.mul(spec, beta_d, sgv_[:, j])))
            ratio = F.mul(spec, num, F.inv(spec, den))
            prod = F.cumprod(spec, ratio, axis=1)
            z_evals = jnp.concatenate([F.ones(spec, (1,)), prod[:, :n - 1]],
                                      axis=1)
            coeffs = intt_fn(z_evals, *targs)
            padded = jnp.concatenate(
                [coeffs, F.zeros(spec, (out_len - n,))], axis=1)
            if mask:
                padded = F.add(
                    spec, padded,
                    self._zh_mask(spec, md, n, out_len)[:, 0])
            return padded, self._msm_scalars(spec, padded[:, None], nck)

        from ..utils.aot_cache import cached_jit
        f = cached_jit(f"r2{tag}-{spec.name}-n{n}-W{W}-msk{int(mask)}"
                       f"-nck{nck}", fn, wv, idv, sgv, bg, *intt_args,
                       deps=("ntt", "prover"))
        coeffs, sc = f(wv, idv, sgv, bg, *intt_args)
        if dev_comms:
            comms = kzg.commit_batch_stacked_dev(ck, sc)
            return comms, coeffs
        comm = kzg.commit_batch_stacked(ck, sc)[0]
        return comm, coeffs

    # -- rounds 1.5 / 2.5: Plookup ----------------------------------------
    def plookup_merge(self, pk, wire_values, tau: int):
        """Merged lookup table t(tau) and merged lookup wire lw(tau), ON
        DEVICE (constraint_system.rs:1370-1417 value computation).

        Round 2's host loops over n gates of bigint math (~6s at 2^17) are
        replaced by one jitted elementwise program over the already-resident
        wire tensor and the static eval tables cached on the plookup pk."""
        spec = self.spec
        ppk = pk.plookup_pk
        statics = ppk.eval_tables    # [L, 5, n]: rt, key, tds, qds, q_lookup
        tau_d = upload(spec, [tau])
        if isinstance(wire_values, (list, tuple)):
            wire_values = jnp.stack(list(wire_values), axis=1)  # [L, W, n]

        def fn(wv, st, tau_):
            rt, key, tds, qds, ql = (st[:, j] for j in range(5))
            w0, w1, w2, w3, w4, w5 = (wv[:, j] for j in range(6))
            # t = rt + ql*tau*(tds + tau*(key + tau*(w3 + tau w4)))
            acc = F.add(spec, w3, F.mul(spec, tau_, w4))
            acc = F.add(spec, key, F.mul(spec, tau_, acc))
            acc = F.add(spec, tds, F.mul(spec, tau_, acc))
            mt = F.add(spec, rt, F.mul(spec, F.mul(spec, ql, tau_), acc))
            # lw = w5 + ql*tau*(qds + tau*(w0 + tau(w1 + tau w2)))
            acc = F.add(spec, w1, F.mul(spec, tau_, w2))
            acc = F.add(spec, w0, F.mul(spec, tau_, acc))
            acc = F.add(spec, qds, F.mul(spec, tau_, acc))
            ml = F.add(spec, w5, F.mul(spec, F.mul(spec, ql, tau_), acc))
            return mt, ml

        from ..utils.aot_cache import cached_jit
        f = cached_jit(f"plkm-{spec.name}-n{self.n}", fn, wire_values,
                       statics, tau_d, deps=("prover",))
        return f(wire_values, statics, tau_d)

    def plookup_sorted_indices_dev(self, mt, ml):
        """Device-side Plookup sorted-vector indices (reference
        constraint_system.rs:1370-1417 ordering, computed without the host).

        Round-3 did this on the host: TWO full-vector D2H transfers +
        limb->bigint conversion + an O(n) Python dict walk per prove (the
        UltraPlonk margin, VERDICT r4 item 6).  Here: one lexicographic
        multi-key sort groups equal values (table rows tie-break first and
        by index), a run-start scan binds every lookup to the FIRST table
        row holding its value (dict-iteration parity with the reference),
        and a final i32 sort yields the gather indices.

        mt, ml: [L, n] Montgomery limb tensors (equality of Montgomery
        reps == equality of values; numeric ORDER is irrelevant — any
        consistent grouping works).  Returns (idx [2n-1] i32, ok scalar
        bool); ok is False iff some lookup value is absent from the table.
        """
        spec = self.spec
        n = self.n
        L = spec.num_limbs
        m = 2 * n - 1
        I32 = jnp.int32

        def fn(mt_, ml_):
            vals = jnp.concatenate([mt_, ml_[:, :n - 1]], axis=1)  # [L, m]
            flag = jnp.concatenate([jnp.zeros(n, I32), jnp.ones(n - 1, I32)])
            orig = jnp.concatenate([jnp.arange(n, dtype=I32),
                                    jnp.zeros(n - 1, I32)])
            # keys: limbs most-significant first, then flag (table rows
            # before equal lookups), then orig (first table occurrence
            # first) — fully deterministic
            ops = tuple(vals[L - 1 - i] for i in range(L)) + (flag, orig)
            s = jax.lax.sort(ops, num_keys=L + 2)
            s_limbs, s_flag, s_orig = s[:L], s[L], s[L + 1]
            same = None
            for l in s_limbs:
                eq = l[1:] == l[:-1]
                same = eq if same is None else (same & eq)
            is_new = jnp.concatenate(
                [jnp.ones((1,), dtype=jnp.bool_), ~same])
            pos = jnp.arange(m, dtype=I32)
            run_start = jax.lax.cummax(jnp.where(is_new, pos, 0))
            ok = jnp.all(jnp.take(s_flag, run_start) == 0)
            assigned = jnp.take(s_orig, run_start)
            idx_vals = jnp.where(s_flag == 0, s_orig, assigned)
            return jnp.sort(idx_vals), ok

        from ..utils.aot_cache import cached_jit
        f = cached_jit(f"plksort-{spec.name}-n{n}", fn, mt, ml,
                       deps=("prover",))
        return f(mt, ml)

    def run_plookup_1st_round(self, ck, sorted_dev, rng, mask: bool):
        """Commit the sorted-vector halves h1, h2 (prover.rs:98-118).

        sorted_dev: [L, 2n-1] device tensor (gathered from the merged
        table by index — no host field math).  Returns (comms, [h1, h2])."""
        spec = self.spec
        n = self.n
        out_len = n + 3
        md = upload(spec, [rng.randrange(spec.p) for _ in range(6)]
                    if mask else [0] * 6).reshape(spec.num_limbs, 2, 3)
        nck = ck.powers_of_g[0].shape[1]
        tag, intt_fn, intt_args = N.intt_kernel(self.domain)

        def fn(s, md_, *targs):
            stacked = jnp.stack([s[:, :n], s[:, n - 1:]], axis=1)  # [L,2,n]
            hs = intt_fn(stacked, *targs)
            padded = jnp.concatenate(
                [hs, F.zeros(spec, (2, out_len - n))], axis=2)
            if mask:
                padded = F.add(spec, padded,
                               self._zh_mask(spec, md_, n, out_len))
            return padded, self._msm_scalars(spec, padded, nck)

        from ..utils.aot_cache import cached_jit
        f = cached_jit(f"r15{tag}-{spec.name}-n{n}-msk{int(mask)}-nck{nck}",
                       fn, sorted_dev, md, *intt_args,
                       deps=("ntt", "prover"))
        padded, sc = f(sorted_dev, md, *intt_args)
        comms = kzg.commit_batch_stacked(ck, sc)
        return comms, [padded[:, 0], padded[:, 1]]

    def run_plookup_2nd_round(self, ck, challenges: Challenges,
                              merged_table_dev, sorted_dev, lookup_wire_dev,
                              rng, mask: bool):
        """Plookup grand product (constraint_system.rs:1311-1368), fully
        fused: pointwise terms + Fermat inverse + cumprod + iNTT + masking
        + MSM prep in ONE executable (mirrors run_2nd_round)."""
        spec = self.spec
        p = spec.p
        n = self.n
        beta, gamma = challenges.beta, challenges.gamma
        mask_coeffs = [rng.randrange(spec.p) for _ in range(3)] if mask \
            else [0, 0, 0]
        consts = upload(spec, [(1 + beta) % p, gamma * (1 + beta) % p, beta,
                               gamma] + mask_coeffs)
        out_len = n + 3
        nck = ck.powers_of_g[0].shape[1]
        tag, intt_fn, intt_args = N.intt_kernel(self.domain)

        def fn(t, lw, s, consts_, *targs):
            beta_plus_one = consts_[:, 0:1]
            gb1 = consts_[:, 1:2]
            beta_d = consts_[:, 2:3]
            gamma_d = consts_[:, 3:4]
            md = consts_[:, 4:7].reshape(spec.num_limbs, 1, 3)
            lw_j = lw[:, :n - 2]
            t_j = t[:, :n - 2]
            t_j1 = t[:, 1:n - 1]
            h1_j = s[:, :n - 2]
            h1_j1 = s[:, 1:n - 1]
            h2_j = s[:, n - 1:2 * n - 3]
            h2_j1 = s[:, n:2 * n - 2]
            a = F.mul(spec, beta_plus_one, F.add(spec, gamma_d, lw_j))
            a = F.mul(spec, a, F.add(
                spec, gb1, F.add(spec, t_j, F.mul(spec, beta_d, t_j1))))
            b = F.mul(
                spec,
                F.add(spec, gb1,
                      F.add(spec, h1_j, F.mul(spec, beta_d, h1_j1))),
                F.add(spec, gb1,
                      F.add(spec, h2_j, F.mul(spec, beta_d, h2_j1))))
            ratio = F.mul(spec, a, F.inv(spec, b))
            prod = F.cumprod(spec, ratio, axis=1)
            z = jnp.concatenate(
                [F.ones(spec, (1,)), prod, F.ones(spec, (1,))], axis=1)
            coeffs = intt_fn(z, *targs)
            padded = jnp.concatenate(
                [coeffs, F.zeros(spec, (out_len - n,))], axis=1)
            if mask:
                padded = F.add(spec, padded,
                               self._zh_mask(spec, md, n, out_len)[:, 0])
            return padded, self._msm_scalars(spec, padded[:, None], nck)

        from ..utils.aot_cache import cached_jit
        args = (merged_table_dev, lookup_wire_dev, sorted_dev, consts) \
            + intt_args
        f = cached_jit(f"r25{tag}-{spec.name}-n{n}-msk{int(mask)}-nck{nck}",
                       fn, *args, deps=("ntt", "prover"))
        coeffs, sc = f(*args)
        comm = kzg.commit_batch_stacked(ck, sc)[0]
        return comm, coeffs

    # -- round 3: quotient -------------------------------------------------
    def compute_quotient_coset_evals(self, pk, challenges: Challenges,
                                     oracles: Oracles, consts=None):
        """Coset evaluations of the (single-instance) quotient contribution
        (t1 * zh_inv + t2).  Mirror of prover.rs:512-675 minus the
        multi-instance alpha aggregation (done by the caller)."""
        spec = self.spec
        W = self.num_wire_types

        lookup = pk.plookup_pk is not None
        p = spec.p
        ch = challenges
        if consts is None:
            extra = []
            if lookup:
                a3 = pow(ch.alpha, 3, p)
                extra = [ch.tau, a3, a3 * ch.alpha % p,
                         pow(ch.alpha, 5, p), pow(ch.alpha, 6, p),
                         (1 + ch.beta) % p, ch.gamma * (1 + ch.beta) % p]
            consts = upload(spec, [ch.alpha, ch.beta, ch.gamma,
                                   ch.alpha * ch.alpha % p]
                            + list(pk.vk.k) + extra)

        # ONE batched coset NTT for all polynomials (selectors + sigmas +
        # wires + z + pi [+ lookup tables/oracles]): a single scan over
        # stages on [L, B, m] instead of ~25 separate transforms.
        group = list(pk.selectors) + list(pk.sigmas) + list(oracles.wire_polys) \
            + [oracles.prod_perm_poly, oracles.pub_inp_poly]
        n_sel = len(pk.selectors)
        if lookup:
            po = oracles.plookup_oracles
            group += [pk.plookup_pk.range_table_poly, pk.plookup_pk.key_table_poly,
                      pk.plookup_pk.table_dom_sep_poly, pk.plookup_pk.q_dom_sep_poly,
                      po.h_polys[0], po.h_polys[1], po.prod_lookup_poly]
        if self._fusable and 2 * 4 * spec.num_limbs * self.m * len(group) \
                > int(os.environ.get(
                    "MPC_JELLYFISH_TPU_QUOT_HBM_BYTES", 8_000_000_000)):
            # Monolithic m-domain evaluation would exceed HBM (21 polys
            # padded to m = 8n, twice over, is ~22GB at n = 2^20).  Chunked
            # path: the quotient domain splits into size_ratio cosets
            # g*w_m^j*H of the BASE domain; each chunk is one batched
            # size-n coset NTT + pointwise evaluation.  w_m-neighbour
            # shifts (z(w x) etc.) stay inside a chunk as roll-by-1.
            return self._quotient_chunked(pk, consts, group, n_sel, lookup)

        if self._fusable:
            # The selector/sigma (+ lookup table) polynomials are fixed per
            # circuit: their coset FFTs are computed ONCE and cached on the
            # proving key.  Only the per-proof polynomials (wires, z, PI,
            # lookup oracles) are transformed inside the round executable -
            # 21 -> 8 transforms on the 8n domain (the round's hot loop).
            qd = self.quot_domain
            from ..utils.aot_cache import cached_jit
            n_head = n_sel + W                  # selectors + sigmas
            static_group = group[:n_head]
            dynamic = group[n_head:n_head + W + 2]
            if lookup:
                static_group = static_group + group[n_head + W + 2:
                                                    n_head + W + 6]
                dynamic = dynamic + group[n_head + W + 6:]

            # HBM budget: the cache is 4*L*m bytes per static poly
            # (600MB at n=2^16, 9.5GB at 2^20) - above the cap, transform
            # everything per-prove instead of caching
            cache_bytes = 4 * spec.num_limbs * self.m * len(static_group)
            if cache_bytes > int(os.environ.get(
                    "MPC_JELLYFISH_TPU_STATIC_FFT_CACHE_BYTES", 3_000_000_000)):
                static_group = []
                dynamic = group
                n_head = 0

            ctag, cfft_fn, cfft_args = N.coset_ntt_kernel(qd, self.coset)

            static_ffts = getattr(pk, "_coset_fft_cache", None)
            if static_ffts is None and static_group:
                slens = "_".join(str(g.shape[1]) for g in static_group)

                def fs(group_, *targs):
                    stacked = jnp.stack([
                        jnp.concatenate(
                            [g, F.zeros(spec, (self.m - g.shape[1],))],
                            axis=1)
                        if g.shape[1] < self.m else g
                        for g in group_], axis=1)
                    return cfft_fn(stacked, *targs)

                sargs = (tuple(static_group),) + cfft_args
                f = cached_jit(f"r3s{ctag}-{spec.name}-m{self.m}-{slens}", fs,
                               *sargs, deps=("ntt", "prover"))
                static_ffts = f(*sargs)
                pk._coset_fft_cache = static_ffts
            if static_ffts is None:
                static_ffts = F.zeros(spec, (0, self.m))   # cache disabled

            lens = "_".join(str(g.shape[1]) for g in dynamic)

            def fn(dyn_, static_, consts_, x_, zh_, i1_, ign_, *targs):
                stacked = jnp.stack([
                    jnp.concatenate(
                        [g, F.zeros(spec, (self.m - g.shape[1],))], axis=1)
                    if g.shape[1] < self.m else g for g in dyn_], axis=1)
                dyn_ffts = cfft_fn(stacked, *targs)
                if n_head == 0:
                    ffts = dyn_ffts       # cache disabled: original order
                else:
                    parts = [static_[:, :n_head], dyn_ffts[:, :W + 2]]
                    if lookup:
                        parts += [static_[:, n_head:], dyn_ffts[:, W + 2:]]
                    ffts = jnp.concatenate(parts, axis=1)
                return self._quot_from_ffts(ffts, consts_, x_, zh_, i1_,
                                            ign_, n_sel, lookup)

            args = (tuple(dynamic), static_ffts, consts,
                    self.coset_elements, self.zh_inv_coset,
                    self.inv_n_x_minus_1, self.inv_n_x_minus_gn) + cfft_args
            f = cached_jit(
                f"r3a{ctag}-{spec.name}-m{self.m}-W{W}-lk{int(lookup)}-{lens}"
                f"-k{consts.shape[1]}", fn, *args, deps=("ntt", "prover"))
            t0 = time.time()
            out = f(*args)
            _trb("r3a exe", t0, out)
            return out

        stacked = jnp.stack([
            jnp.concatenate([g, F.zeros(spec, (self.m - g.shape[1],))], axis=1)
            if g.shape[1] < self.m else g for g in group], axis=1)
        ffts = self.be.coset_ntt(self.quot_domain, stacked, self.coset)
        return self._quot_from_ffts(ffts, consts, self.coset_elements,
                                    self.zh_inv_coset, self.inv_n_x_minus_1,
                                    self.inv_n_x_minus_gn, n_sel, lookup)

    def _quotient_chunked(self, pk, consts, group, n_sel: int, lookup: bool):
        """Evaluate the quotient on the 8n coset domain one size-n coset at
        a time.  Peak HBM is ~3 group-sized tensors (the monolithic path
        needs ~2 m-sized = 16x more and OOMs at n = 2^20).

        The group polys are stacked ONCE into a [L, G, n] heads tensor plus
        a [L, G, 3] tails tensor (degrees n..n+2 from masking); each chunk
        folds the tail exactly via x^{n+t} = shift^n * x^t on its coset and
        runs one batched size-n coset NTT + the pointwise evaluation.
        w_m-neighbour shifts (z(w x) etc.) stay inside a chunk (roll 1)."""
        spec = self.spec
        W = self.num_wire_types
        n = self.n
        r = self.size_ratio
        qd = self.quot_domain
        dom = self.domain
        G = len(group)
        from ..utils.aot_cache import cached_jit

        p = spec.p
        shifts = [spec.generator * pow(qd.w, j, p) % p for j in range(r)]
        shift_dev = upload(spec, shifts)                      # [L, r]
        zh_inv_host = [pow(pow(s, n, p) - 1, -1, p) for s in shifts]
        zh_inv_dev = upload(spec, zh_inv_host)                # [L, r]
        sn_dev = upload(spec, [pow(s, n, p) for s in shifts]) # [L, r]

        lens = "_".join(str(g.shape[1]) for g in group)

        def fstack(group_):
            heads = jnp.stack([
                jnp.concatenate([g[:, :n], F.zeros(spec, (n - g.shape[1],))],
                                axis=1)
                if g.shape[1] < n else g[:, :n] for g in group_], axis=1)
            tails = jnp.stack([
                jnp.concatenate([g[:, n:], F.zeros(spec,
                                                   (3 - max(g.shape[1] - n,
                                                            0),))], axis=1)
                if g.shape[1] < n + 3 else g[:, n:n + 3]
                for g in group_], axis=1)
            return heads, tails

        sargs = (tuple(group),)
        fst = cached_jit(f"r3cs-{spec.name}-n{n}-G{G}-{lens}", fstack, *sargs,
                         deps=("ntt", "prover"))
        heads, tails = fst(*sargs)

        ctag, cfft_fn, cfft_args = N.coset_ntt_dyn_kernel(dom)

        def fchunk(heads_, tails_, consts_, shift, snj, zh_s, x_, i1_, ign_,
                   *targs):
            folded = heads_.at[:, :, :3].set(
                F.add(spec, heads_[:, :, :3],
                      F.mul(spec, tails_, snj[:, :, None])))
            pows = F.powers(spec, shift, n)
            ffts = cfft_fn(folded, pows, *targs)
            return self._quot_from_ffts(ffts, consts_, x_, zh_s, i1_, ign_,
                                        n_sel, lookup, ratio=1)

        chunks = []
        x_full = self.coset_elements           # [L, m], cached
        i1_full = self.inv_n_x_minus_1
        ign_full = self.inv_n_x_minus_gn
        f = None
        for j in range(r):
            args = (heads, tails, consts, shift_dev[:, j:j + 1],
                    sn_dev[:, j:j + 1], zh_inv_dev[:, j:j + 1],
                    x_full[:, j::r], i1_full[:, j::r], ign_full[:, j::r],
                    ) + cfft_args
            if f is None:
                f = cached_jit(
                    f"r3c{ctag}-{spec.name}-n{n}-W{W}-G{G}-lk{int(lookup)}"
                    f"-k{consts.shape[1]}", fchunk, *args,
                    deps=("ntt", "prover"))
            chunks.append(f(*args))
        # reassemble natural m-order: evals[j + r*k] = chunk_j[k]
        out = jnp.stack(chunks, axis=-1)       # [L, n, r]
        return out.reshape(spec.num_limbs, self.m)

    def _quot_from_ffts(self, ffts, consts, coset_x, zh_inv, inv_nx1,
                        inv_nxgn, n_sel: int, lookup: bool,
                        ratio: int | None = None):
        """Gate + copy-constraint (+ Plookup) terms from the batched coset
        FFTs; pure function of its tensors (jit-safe for the fused path)."""
        spec = self.spec
        W = self.num_wire_types
        p = spec.p
        alpha = consts[:, 0:1]
        beta = consts[:, 1:2]
        gamma = consts[:, 2:3]
        alpha2 = consts[:, 3:4]
        ks = [consts[:, 4 + j:5 + j] for j in range(W)]
        sel_fft = [ffts[:, i] for i in range(n_sel)]
        off = n_sel
        sigma_fft = [ffts[:, off + i] for i in range(W)]
        off += W
        wire_fft = [ffts[:, off + i] for i in range(W)]
        off += W
        z_fft = ffts[:, off]
        pi_fft = ffts[:, off + 1]
        off += 2
        if lookup:
            lk_fft = [ffts[:, off + i] for i in range(7)]

        w = wire_fft
        # gate equation (prover.rs:684-709); selector order:
        # q_lc x4, q_mul x2, q_hash x4, q_o, q_c, q_ecc
        q_lc = sel_fft[0:4]
        q_mul = sel_fft[4:6]
        q_hash = sel_fft[6:10]
        q_o, q_c, q_ecc = sel_fft[10], sel_fft[11], sel_fft[12]

        t_circ = F.add(spec, q_c, pi_fft)
        for j in range(4):
            t_circ = F.add(spec, t_circ, F.mul(spec, q_lc[j], w[j]))
        t_circ = F.add(spec, t_circ, F.mul(spec, q_mul[0], F.mul(spec, w[0], w[1])))
        t_circ = F.add(spec, t_circ, F.mul(spec, q_mul[1], F.mul(spec, w[2], w[3])))
        prod_w = w[0]
        for j in range(1, 5):
            prod_w = F.mul(spec, prod_w, w[j])
        t_circ = F.add(spec, t_circ, F.mul(spec, q_ecc, prod_w))
        for j in range(4):
            w5 = F.mul(spec, F.sqr(spec, F.sqr(spec, w[j])), w[j])
            t_circ = F.add(spec, t_circ, F.mul(spec, q_hash[j], w5))
        t_circ = F.sub(spec, t_circ, F.mul(spec, q_o, w[4]))

        # copy constraints (prover.rs:719-759)
        x = coset_x
        if ratio is None:
            ratio = self.size_ratio
        z_next = jnp.roll(z_fft, -ratio, axis=1)
        term1 = F.mul(spec, alpha, z_fft)
        term2 = F.mul(spec, alpha, z_next)
        for j in range(W):
            a = F.add(spec, F.add(spec, w[j], gamma),
                      F.mul(spec, F.mul(spec, beta, ks[j]), x))
            term1 = F.mul(spec, term1, a)
            b = F.add(spec, F.add(spec, w[j], gamma),
                      F.mul(spec, beta, sigma_fft[j]))
            term2 = F.mul(spec, term2, b)
        t_perm_1 = F.sub(spec, term1, term2)

        one = F.ones(spec, (1,))
        t_perm_2 = F.mul(spec, alpha2,
                         F.mul(spec, F.sub(spec, z_fft, one), inv_nx1))

        t1 = F.add(spec, t_circ, t_perm_1)
        t2 = t_perm_2

        if lookup:
            # Plookup contribution (prover.rs:773-887)
            base = 4 + W
            tau = consts[:, base:base + 1]
            alpha3 = consts[:, base + 1:base + 2]
            alpha4 = consts[:, base + 2:base + 3]
            alpha5 = consts[:, base + 3:base + 4]
            alpha6 = consts[:, base + 4:base + 5]
            beta_plus_one = consts[:, base + 5:base + 6]
            gb1 = consts[:, base + 6:base + 7]

            range_fft, key_fft, tds_fft, qds_fft, h1_fft, h2_fft, pl_fft = lk_fft
            q_lookup_fft = sel_fft[-1]

            r = ratio

            def nxt(t):
                return jnp.roll(t, -r, axis=1)

            def merged_table(rg, ky, ql, w3, w4, td):
                inner = F.add(spec, w3, F.mul(spec, tau, w4))
                inner = F.add(spec, ky, F.mul(spec, tau, inner))
                inner = F.add(spec, td, F.mul(spec, tau, inner))
                return F.add(spec, rg, F.mul(spec, F.mul(spec, ql, tau), inner))

            def merged_lookup(w5, w0, w1, w2, ql, qd):
                inner = F.add(spec, w1, F.mul(spec, tau, w2))
                inner = F.add(spec, w0, F.mul(spec, tau, inner))
                inner = F.add(spec, qd, F.mul(spec, tau, inner))
                return F.add(spec, w5, F.mul(spec, F.mul(spec, ql, tau), inner))

            table_x = merged_table(range_fft, key_fft, q_lookup_fft,
                                   w[3], w[4], tds_fft)
            table_xw = merged_table(nxt(range_fft), nxt(key_fft),
                                    nxt(q_lookup_fft), nxt(w[3]), nxt(w[4]),
                                    nxt(tds_fft))
            lookup_x = merged_lookup(w[5], w[0], w[1], w[2],
                                     q_lookup_fft, qds_fft)

            one = F.ones(spec, (1,))
            # t2: Ln(x)*(h1 - h2(wx))*a^3 + L1(x)*(p-1)*a^4 + Ln(x)*(p-1)*a^5
            term_h = F.mul(spec, F.sub(spec, h1_fft, nxt(h2_fft)),
                           inv_nxgn)
            t2 = F.add(spec, t2, F.mul(spec, alpha3, term_h))
            pm1 = F.sub(spec, pl_fft, one)
            t2 = F.add(spec, t2, F.mul(spec, alpha4,
                                       F.mul(spec, pm1, inv_nx1)))
            t2 = F.add(spec, t2, F.mul(spec, alpha5,
                                       F.mul(spec, pm1, inv_nxgn)))

            # t1 += a^6 (x - w^{n-1}) [p(x)(1+b)(g+lookup)(g(1+b)+table+b*table_w)
            #                          - p(wx)(g(1+b)+h1+b h1w)(g(1+b)+h2+b h2w)]
            g_inv = pow(self.domain.w, -1, p)
            x_minus_gn = F.sub(spec, coset_x, _const(spec, g_inv))
            lhs = F.mul(spec, pl_fft, beta_plus_one)
            lhs = F.mul(spec, lhs, F.add(spec, gamma, lookup_x))
            lhs = F.mul(spec, lhs, F.add(spec, gb1, F.add(
                spec, table_x, F.mul(spec, beta, table_xw))))
            rhs = F.mul(spec, nxt(pl_fft),
                        F.add(spec, gb1, F.add(spec, h1_fft,
                                               F.mul(spec, beta, nxt(h1_fft)))))
            rhs = F.mul(spec, rhs,
                        F.add(spec, gb1, F.add(spec, h2_fft,
                                               F.mul(spec, beta, nxt(h2_fft)))))
            term_p3 = F.mul(spec, x_minus_gn, F.sub(spec, lhs, rhs))
            t1 = F.add(spec, t1, F.mul(spec, alpha6, term_p3))

        quot = F.add(spec, F.mul(spec, t1, zh_inv), t2)
        return quot

    def quotient_evals_to_split_polys(self, quot_evals, rng, mask: bool):
        """Coset iNTT + split into W chunks of n+2 coeffs (prover.rs:890-959)."""
        spec = self.spec
        W = self.num_wire_types
        n = self.n
        coeffs = self.be.coset_intt(self.quot_domain, quot_evals, self.coset)
        expected_len = W * (n + 1) + 3   # degree W*(n+1)+2 (prover.rs:1126)
        chunk = n + 2
        polys = []
        for i in range(W):
            end = (i + 1) * chunk if i < W - 1 else expected_len
            piece = coeffs[:, i * chunk:end]
            pad = n + 3 - piece.shape[1]
            if pad > 0:
                piece = jnp.concatenate([piece, F.zeros(spec, (pad,))], axis=1)
            polys.append(piece)
        if mask:
            # t_i(X) = t'_i(X) - b_{i-1} + b_i X^{n+2} ; single upload of b's
            bs = [rng.randrange(spec.p) for _ in range(W - 1)]
            bd = upload(spec, bs)                       # [L, W-1]
            for i in range(W - 1):
                b = bd[:, i:i + 1]
                polys[i] = polys[i].at[:, :1].set(
                    F.sub(spec, polys[i][:, :1],
                          bd[:, i - 1:i] if i > 0 else F.zeros(spec, (1,))))
                polys[i] = polys[i].at[:, n + 2:n + 3].set(
                    F.add(spec, polys[i][:, n + 2:n + 3], b))
            polys[W - 1] = polys[W - 1].at[:, :1].set(
                F.sub(spec, polys[W - 1][:, :1], bd[:, W - 2:W - 1]))
        return polys

    def run_3rd_round(self, ck, quot_evals_sum, rng, mask: bool,
                      dev_comms: bool = False):
        if not self._fusable:
            polys = self.quotient_evals_to_split_polys(quot_evals_sum, rng,
                                                       mask)
            comms = self.be.commit_batch(ck, polys)
            return comms, polys

        # fused: coset iNTT + split + hiding chain + MSM prep in ONE
        # executable (prover.rs:890-959)
        spec = self.spec
        W = self.num_wire_types
        n = self.n
        bd = upload(spec, [rng.randrange(spec.p) for _ in range(W - 1)]
                    if mask else [0] * (W - 1))
        nck = ck.powers_of_g[0].shape[1]
        qd = self.quot_domain
        tag, cintt_fn, cintt_args = N.coset_intt_kernel(qd, self.coset)

        def fn(qe, bd_, *targs):
            coeffs = cintt_fn(qe, *targs)
            expected_len = W * (n + 1) + 3
            chunk = n + 2
            polys = []
            for i in range(W):
                end = (i + 1) * chunk if i < W - 1 else expected_len
                piece = coeffs[:, i * chunk:end]
                pad = n + 3 - piece.shape[1]
                if pad > 0:
                    piece = jnp.concatenate(
                        [piece, F.zeros(spec, (pad,))], axis=1)
                polys.append(piece)
            if mask:
                for i in range(W - 1):
                    b = bd_[:, i:i + 1]
                    prev = bd_[:, i - 1:i] if i > 0 else F.zeros(spec, (1,))
                    polys[i] = polys[i].at[:, :1].set(
                        F.sub(spec, polys[i][:, :1], prev))
                    polys[i] = polys[i].at[:, n + 2:n + 3].set(
                        F.add(spec, polys[i][:, n + 2:n + 3], b))
                polys[W - 1] = polys[W - 1].at[:, :1].set(
                    F.sub(spec, polys[W - 1][:, :1], bd_[:, W - 2:W - 1]))
            st = jnp.stack(polys, axis=1)
            return st, self._msm_scalars(spec, st, nck)

        from ..utils.aot_cache import cached_jit
        args = (quot_evals_sum, bd) + cintt_args
        f = cached_jit(f"r3b{tag}-{spec.name}-m{self.m}-n{n}-W{W}"
                       f"-msk{int(mask)}-nck{nck}", fn, *args,
                       deps=("ntt", "prover"))
        t0 = time.time()
        st, sc = f(*args)
        t0 = _trb("r3b exe", t0, sc)
        if dev_comms:
            comms = kzg.commit_batch_stacked_dev(ck, sc)
        else:
            comms = kzg.commit_batch_stacked(ck, sc)
        _trb("r3b commit", t0)
        return comms, [st[:, i] for i in range(W)]

    # -- round 4: evaluations ---------------------------------------------
    def compute_evaluations(self, pk, challenges: Challenges, oracles: Oracles):
        """Evaluate wires at zeta, sigmas (all but last) at zeta, z at zeta*w,
        in two batched eval calls and ONE device->host transfer
        (prover.rs:216-235)."""
        spec = self.spec
        W = self.num_wire_types
        n3 = self.n + 3
        pts = upload(spec, [challenges.zeta,
                            challenges.zeta * self.domain.w % spec.p])
        zeta = pts[:, 0]
        zeta_w = pts[:, 1]

        def pad(c):
            k = n3 - c.shape[1]
            return c if k == 0 else jnp.concatenate(
                [c, F.zeros(spec, (k,))], axis=1)

        group = jnp.stack([pad(c) for c in oracles.wire_polys]
                          + [pad(c) for c in pk.sigmas[:W - 1]], axis=1)
        evs = P.eval_at(spec, group, zeta)                  # [L, 2W-1]
        ev_next = P.eval_at(spec, pad(oracles.prod_perm_poly), zeta_w)
        allv = jnp.concatenate([evs, ev_next.reshape(spec.num_limbs, 1)], axis=1)
        host = spec.from_device(allv)                       # ONE transfer
        return ProofEvaluations(
            wires_evals=host[:W],
            wire_sigma_evals=host[W:2 * W - 1],
            perm_next_eval=host[2 * W - 1],
        )

    def compute_evaluations_dev(self, pk, zeta_dev, oracles: Oracles):
        """Device-FS round 4: zeta is a [L, 1] Montgomery tensor; returns
        the eval row [L, 2W] (wires | sigmas[:-1] | perm_next) WITHOUT any
        host transfer — the transcript append, the linearization scalars
        and the final proof fetch all consume the device row."""
        spec = self.spec
        W = self.num_wire_types
        n3 = self.n + 3
        zeta = zeta_dev[:, 0]
        zeta_w = F.mul(spec, zeta_dev, _const(spec, self.domain.w))[:, 0]

        def pad(c):
            k = n3 - c.shape[1]
            return c if k == 0 else jnp.concatenate(
                [c, F.zeros(spec, (k,))], axis=1)

        group = jnp.stack([pad(c) for c in oracles.wire_polys]
                          + [pad(c) for c in pk.sigmas[:W - 1]], axis=1)
        evs = P.eval_at(spec, group, zeta)                  # [L, 2W-1]
        ev_next = P.eval_at(spec, pad(oracles.prod_perm_poly), zeta_w)
        return jnp.concatenate(
            [evs, ev_next.reshape(spec.num_limbs, 1)], axis=1)

    def lin_coeffs_dev(self, pk, alpha, beta, gamma, zeta, allv):
        """Device-FS linearization coefficients (TurboPlonk, single
        instance): the host-int scalar math of compute_lin_poly as one
        fused device program over the challenge tensors and the eval row.
        Returns [L, W + 15] coeffs in _scale_sum's poly order:
        quot splits (W) | selectors (13) | z | last sigma."""
        spec = self.spec
        W = self.num_wire_types
        n = self.n
        ks = upload(spec, list(pk.vk.k))                    # [L, W]
        from ..utils.aot_cache import cached_jit

        def fn(alpha_, beta_, gamma_, zeta_, allv_, ks_):
            one = F.ones(spec, (1,))
            zn = zeta_
            for _ in range(n.bit_length() - 1):             # zeta^n, n = 2^k
                zn = F.sqr(spec, zn)
            vanish = F.sub(spec, zn, one)
            z2 = F.sqr(spec, zeta_)
            z_np2 = F.mul(spec, zn, z2)
            # quotient coeffs: -vanish * z_np2^i
            qc = [F.neg(spec, vanish)]
            for _ in range(W - 1):
                qc.append(F.mul(spec, qc[-1], z_np2))
            w = [allv_[:, j:j + 1] for j in range(W)]
            sig = [allv_[:, W + j:W + j + 1] for j in range(W - 1)]
            perm_next = allv_[:, 2 * W - 1:2 * W]
            w01 = F.mul(spec, w[0], w[1])
            w23 = F.mul(spec, w[2], w[3])

            def pow5(x):
                return F.mul(spec, F.sqr(spec, F.sqr(spec, x)), x)

            sel = [w[0], w[1], w[2], w[3], w01, w23,
                   pow5(w[0]), pow5(w[1]), pow5(w[2]), pow5(w[3]),
                   F.neg(spec, w[4]), one,
                   F.mul(spec, F.mul(spec, w01, w23), w[4])]
            n_inv_xm1 = F.inv(
                spec, F.mul_const(spec, F.sub(spec, zeta_, one), n))
            lagrange_1 = F.mul(spec, vanish, n_inv_xm1)
            coeff_z = alpha_
            bz = F.mul(spec, beta_, zeta_)
            for j in range(W):
                t = F.add(spec, F.add(spec, w[j], gamma_),
                          F.mul(spec, bz, ks_[:, j:j + 1]))
                coeff_z = F.mul(spec, coeff_z, t)
            a2 = F.sqr(spec, alpha_)
            coeff_z = F.add(spec, coeff_z, F.mul(spec, a2, lagrange_1))
            coeff_s = F.mul(spec, F.mul(spec, alpha_, beta_), perm_next)
            for j in range(W - 1):
                t = F.add(spec, F.add(spec, w[j], gamma_),
                          F.mul(spec, beta_, sig[j]))
                coeff_s = F.mul(spec, coeff_s, t)
            coeff_s = F.neg(spec, coeff_s)
            return jnp.concatenate(qc + sel + [coeff_z, coeff_s], axis=1)

        f = cached_jit(f"lincoef-{spec.name}-n{n}-W{W}", fn,
                       alpha, beta, gamma, zeta, allv, ks, deps=("prover",))
        return f(alpha, beta, gamma, zeta, allv, ks)

    def quotient_consts_dev(self, pk, alpha, beta, gamma):
        """Device-FS consts row for compute_quotient_coset_evals (Turbo):
        [alpha, beta, gamma, alpha^2] ++ vk.k as one [L, 4+W] tensor."""
        spec = self.spec
        a2 = F.sqr(spec, alpha)
        ks = upload(spec, list(pk.vk.k))
        return jnp.concatenate([alpha, beta, gamma, a2, ks], axis=1)

    def compute_plookup_evaluations(self, pk, challenges: Challenges,
                                    oracles: Oracles):
        """Round 4.5: evaluations of Plookup polys at zeta / zeta*w
        (prover.rs:239-299).  One batched eval + one transfer."""
        from .structs import PlookupEvaluations
        spec = self.spec
        n3 = self.n + 3
        ppk = pk.plookup_pk
        po = oracles.plookup_oracles
        pts = upload(spec, [challenges.zeta,
                            challenges.zeta * self.domain.w % spec.p])

        def pad(c):
            k = n3 - c.shape[1]
            return c if k == 0 else jnp.concatenate(
                [c, F.zeros(spec, (k,))], axis=1)

        at_z = [ppk.range_table_poly, ppk.key_table_poly, po.h_polys[0],
                pk.q_lookup_poly(), ppk.table_dom_sep_poly, ppk.q_dom_sep_poly]
        at_zw = [po.prod_lookup_poly, ppk.range_table_poly, ppk.key_table_poly,
                 po.h_polys[0], po.h_polys[1], pk.q_lookup_poly(),
                 oracles.wire_polys[3], oracles.wire_polys[4],
                 ppk.table_dom_sep_poly]
        g1 = jnp.stack([pad(c) for c in at_z], axis=1)
        g2 = jnp.stack([pad(c) for c in at_zw], axis=1)
        e1 = P.eval_at(spec, g1, pts[:, 0])
        e2 = P.eval_at(spec, g2, pts[:, 1])
        host = spec.from_device(jnp.concatenate([e1, e2], axis=1))
        return PlookupEvaluations(
            range_table_eval=host[0], key_table_eval=host[1], h_1_eval=host[2],
            q_lookup_eval=host[3], table_dom_sep_eval=host[4],
            q_dom_sep_eval=host[5],
            prod_next_eval=host[6], range_table_next_eval=host[7],
            key_table_next_eval=host[8], h_1_next_eval=host[9],
            h_2_next_eval=host[10], q_lookup_next_eval=host[11],
            w_3_next_eval=host[12], w_4_next_eval=host[13],
            table_dom_sep_next_eval=host[14],
        )

    # -- linearization poly ------------------------------------------------
    def compute_lin_poly(self, alpha_bases, pks, challenges: Challenges,
                         oracles_list, poly_evals_list, split_quot_polys,
                         plookup_evals_list=None):
        """Full linearization polynomial: quotient component + per-instance
        circuit/copy (+ Plookup) components, as ONE stacked scale-and-sum
        (prover.rs:302-358, 962-1112)."""
        spec = self.spec
        p = spec.p
        n = self.n
        ch = challenges
        n3 = n + 3

        polys = []
        coeffs = []

        # quotient component: -Z_H(zeta) * sum zeta^{i(n+2)} t_i(X)
        vanish = (pow(ch.zeta, n, p) - 1) % p
        z_np2 = pow(ch.zeta, n + 2, p)
        coeff = (p - vanish) % p
        for i, poly in enumerate(split_quot_polys):
            polys.append(poly)
            coeffs.append(coeff)
            coeff = coeff * z_np2 % p

        for i, (alpha_base, pk, oracles, evals) in enumerate(zip(
                alpha_bases, pks, oracles_list, poly_evals_list)):
            w = evals.wires_evals
            sel_coeffs = [w[0], w[1], w[2], w[3],
                          w[0] * w[1] % p, w[2] * w[3] % p,
                          pow(w[0], 5, p), pow(w[1], 5, p),
                          pow(w[2], 5, p), pow(w[3], 5, p),
                          (p - w[4]) % p, 1,
                          w[0] * w[1] % p * w[2] % p * w[3] % p * w[4] % p]
            for c, poly in zip(sel_coeffs, pk.selectors):
                polys.append(poly)
                coeffs.append(c * alpha_base % p)

            lagrange_1 = vanish * pow(n * (ch.zeta - 1) % p, -1, p) % p
            coeff_z = ch.alpha
            for j in range(self.num_wire_types):
                coeff_z = coeff_z * (w[j] + ch.beta * pk.vk.k[j] % p * ch.zeta
                                     + ch.gamma) % p
            coeff_z = (coeff_z + ch.alpha * ch.alpha % p * lagrange_1) % p
            polys.append(oracles.prod_perm_poly)
            coeffs.append(coeff_z * alpha_base % p)

            coeff_s = ch.alpha * ch.beta % p * evals.perm_next_eval % p
            for j in range(self.num_wire_types - 1):
                coeff_s = coeff_s * (w[j] + ch.beta * evals.wire_sigma_evals[j]
                                     + ch.gamma) % p
            polys.append(pk.sigmas[self.num_wire_types - 1])
            coeffs.append((p - coeff_s * alpha_base) % p)

            # Plookup contribution (prover.rs:1037-1112)
            if plookup_evals_list is not None and plookup_evals_list[i] is not None:
                pe = plookup_evals_list[i]
                oracles_i = oracles_list[i]
                from .structs import eval_merged_lookup_witness, eval_merged_table
                a2 = ch.alpha * ch.alpha % p
                a4 = a2 * a2 % p
                a5 = a4 * ch.alpha % p
                a6 = a4 * a2 % p
                g_inv = pow(self.domain.w, -1, p)
                l1 = vanish * pow(n * (ch.zeta - 1) % p, -1, p) % p
                ln = vanish * g_inv % p * pow(n * (ch.zeta - g_inv) % p, -1, p) % p
                mt = eval_merged_table(p, ch.tau, pe.range_table_eval,
                                       pe.key_table_eval, pe.q_lookup_eval,
                                       w[3], w[4], pe.table_dom_sep_eval)
                mt_w = eval_merged_table(p, ch.tau, pe.range_table_next_eval,
                                         pe.key_table_next_eval,
                                         pe.q_lookup_next_eval,
                                         pe.w_3_next_eval, pe.w_4_next_eval,
                                         pe.table_dom_sep_next_eval)
                ml = eval_merged_lookup_witness(p, ch.tau, w[5], w[0], w[1],
                                                w[2], pe.q_lookup_eval,
                                                pe.q_dom_sep_eval)
                b1 = (1 + ch.beta) % p
                zg = (ch.zeta - g_inv) % p
                coeff = (a4 * l1 + a5 * ln
                         + a6 * zg % p * b1 % p
                         * (ch.gamma + ml) % p
                         * (ch.gamma * b1 + mt + ch.beta * mt_w)) % p
                polys.append(oracles_i.plookup_oracles.prod_lookup_poly)
                coeffs.append(coeff * alpha_base % p)
                coeff = (p - a6 * zg % p * pe.prod_next_eval % p
                         * (ch.gamma * b1 + pe.h_1_eval
                            + ch.beta * pe.h_1_next_eval) % p * alpha_base) % p
                polys.append(oracles_i.plookup_oracles.h_polys[1])
                coeffs.append(coeff)

        return self._scale_sum(polys, coeffs, n3)

    def _scale_sum(self, polys, coeffs, out_len):
        """sum_i coeffs[i] * polys[i] with one upload + one stacked kernel.
        coeffs: host int list OR a device [L, k] tensor (device-FS)."""
        spec = self.spec

        def pad(c):
            k = out_len - c.shape[1]
            return c if k == 0 else jnp.concatenate(
                [c, F.zeros(spec, (k,))], axis=1)

        stacked = jnp.stack([pad(c) for c in polys], axis=1)  # [L, k, len]
        cd = (coeffs if not isinstance(coeffs, list)
              else upload(spec, coeffs))[:, :, None]          # [L, k, 1]
        return F.sum_reduce(spec, F.mul(spec, stacked, cd), axis=1)

    # -- round 5: opening proofs ------------------------------------------
    def compute_opening_proofs(self, ck, pks, zeta, v, oracles_list,
                               lin_poly, dev_comms: bool = False):
        """Batched witness polynomial commitments (prover.rs:362-419):
        both openings in one batched MSM / one transfer.  zeta / v: host
        ints or [L, 1] device tensors (device-FS)."""
        spec = self.spec
        p = spec.p
        n3 = self.n + 3
        device_ch = not isinstance(zeta, int)

        polys = [lin_poly]
        for pk, oracles in zip(pks, oracles_list):
            polys += list(oracles.wire_polys)
            polys += list(pk.sigmas[:-1])
            if pk.plookup_pk is not None and oracles.plookup_oracles is not None:
                ppk = pk.plookup_pk
                polys += [ppk.range_table_poly, ppk.key_table_poly,
                          oracles.plookup_oracles.h_polys[0],
                          pk.q_lookup_poly(), ppk.table_dom_sep_poly,
                          ppk.q_dom_sep_poly]
        vpow = []
        if not device_ch:
            cur = 1
            for _ in polys:
                vpow.append(cur)
                cur = cur * v % p

        polys2 = []
        for pk, oracles in zip(pks, oracles_list):
            polys2.append(oracles.prod_perm_poly)
            if pk.plookup_pk is not None and oracles.plookup_oracles is not None:
                ppk = pk.plookup_pk
                polys2 += [oracles.plookup_oracles.prod_lookup_poly,
                           ppk.range_table_poly, ppk.key_table_poly,
                           oracles.plookup_oracles.h_polys[0],
                           oracles.plookup_oracles.h_polys[1],
                           pk.q_lookup_poly(), oracles.wire_polys[3],
                           oracles.wire_polys[4], ppk.table_dom_sep_poly]
        vpow2 = []
        if not device_ch:
            cur = 1
            for _ in polys2:
                vpow2.append(cur)
                cur = cur * v % p

        if self._fusable:
            # fused: both v-power linear combinations + both (X - z)
            # divisions + MSM scalar prep in ONE executable, then one
            # batched MSM (prover.rs:362-425 in two dispatches)
            nck = ck.powers_of_g[0].shape[1]
            k1 = len(polys)
            k2 = len(polys2)
            if device_ch:
                vp = F.powers(spec, v[:, 0], max(k1, k2))   # [L, max]
                zw = F.mul(spec, zeta, _const(spec, self.domain.w))
                cv = jnp.concatenate(
                    [vp[:, :k1], vp[:, :k2], zeta, zw], axis=1)
            else:
                cv = upload(spec, vpow + vpow2 + [zeta,
                                                  zeta * self.domain.w % p])

            def pad(c):
                k = n3 - c.shape[1]
                return c if k == 0 else jnp.concatenate(
                    [c, F.zeros(spec, (k,))], axis=1)

            def fn(g1_, g2_, cv_):
                s1 = jnp.stack([pad(c) for c in g1_], axis=1)
                s2 = jnp.stack([pad(c) for c in g2_], axis=1)
                b1 = F.sum_reduce(spec, F.mul(
                    spec, s1, cv_[:, :k1, None]), axis=1)
                b2 = F.sum_reduce(spec, F.mul(
                    spec, s2, cv_[:, k1:k1 + k2, None]), axis=1)
                q1, _ = P.divide_by_linear(spec, b1, cv_[:, k1 + k2])
                q2, _ = P.divide_by_linear(spec, b2, cv_[:, k1 + k2 + 1])
                st = jnp.stack([q1, q2], axis=1)
                return self._msm_scalars(spec, st, nck)

            from ..utils.aot_cache import cached_jit
            lens = "_".join(str(c.shape[1]) for c in polys + polys2)
            args = (tuple(polys), tuple(polys2), cv)
            f = cached_jit(f"r5-{spec.name}-n{self.n}-k{k1}.{k2}-nck{nck}"
                           f"-{lens}", fn, *args, deps=("poly", "prover"))
            sc = f(*args)
            if dev_comms:
                comms = kzg.commit_batch_stacked_dev(ck, sc)
                return comms, None
            comms = kzg.commit_batch_stacked(ck, sc)
            return comms[0], comms[1]

        if device_ch:
            raise NotImplementedError(
                "device-FS openings need the fused prover path")
        batch = self._scale_sum(polys, vpow, n3)
        batch2 = self._scale_sum(polys2, vpow2, n3)
        pts = upload(spec, [zeta, zeta * self.domain.w % p])
        q1, _ = self.be.divide_by_linear(spec, batch, pts[:, 0])
        q2, _ = self.be.divide_by_linear(spec, batch2, pts[:, 1])
        comms = self.be.commit_batch(ck, [q1, q2])
        return comms[0], comms[1]
