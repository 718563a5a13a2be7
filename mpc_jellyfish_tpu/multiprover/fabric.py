"""MPC fabric: 2-party additive secret sharing with SPDZ-style MACs.

TPU-native equivalent of the `ark-mpc` surface the reference consumes
(SURVEY.md §2.7/§2.9): `MpcFabric`, `AuthenticatedScalarResult` batch ops
(add/mul/div/fft), `open_authenticated`, Beaver triples, shared randomness.

Design: shares are limb tensors with a PARTY axis - an authenticated batch
is ``share[L, P, *batch]`` plus ``mac[L, P, *batch]`` (mac = alpha * value,
alpha itself additively shared).  The *mock* fabric executes both parties in
one process (the reference tests do the same via
`ark_mpc::test_helpers::execute_mock_mpc`, SURVEY.md §4): "network" openings
are sums over the party axis.  A cross-process fabric maps the same ops onto
`jax.distributed` collectives (psum over a party mesh axis) - the API below
is written against the party axis only, so the transport swap is local.

Linear ops are share-local; each multiplication consumes a Beaver triple and
one opening round; division uses the classic masked-inversion trick
(1 triple + 1 open).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops import field as F
from ..ops.field import FieldSpec

N_PARTIES = 2


@dataclass
class Shared:
    """An authenticated secret-shared batch: value = sum_p share[:, p]."""
    share: jnp.ndarray           # [L, P, *batch]
    mac: jnp.ndarray             # [L, P, *batch]

    @property
    def batch_shape(self):
        return self.share.shape[2:]


@functools.partial(jax.jit, static_argnums=(0, 1))
def _ew_jit(spec, op, as_, am, bs, bm):
    """Fused share+mac elementwise op: the fabric's add/sub/mul_public run
    OUTSIDE any jit (the prover composes them imperatively), and each eager
    F.add/F.mul is a dozen unfused limb primitives — 8.8s of a 12.5s 2^10
    collaborative quotient round was raw `apply_primitive` dispatch
    (prof_collab2.log).  One jit per (op, shape) collapses that."""
    if op == "add":
        return F.add(spec, as_, bs), F.add(spec, am, bm)
    if op == "sub":
        return F.sub(spec, as_, bs), F.sub(spec, am, bm)
    return F.mul(spec, as_, bs), F.mul(spec, am, bm)    # "mul_public"


@functools.partial(jax.jit, static_argnums=(0,))
def _neg_jit(spec, as_, am):
    return F.neg(spec, as_), F.neg(spec, am)


@functools.partial(jax.jit, static_argnums=(0,))
def _add_public_jit(spec, as_, am, cb, alpha_r):
    """Party-0 share bump + alpha*c mac bump, fused."""
    full = (as_.shape[0], 1) + as_.shape[2:]
    bump = jnp.concatenate([
        jnp.broadcast_to(cb, full),
        jnp.zeros(full, dtype=cb.dtype),
    ], axis=1)
    mac_bump = F.mul(spec, alpha_r, cb)
    return F.add(spec, as_, bump), F.add(spec, am, mac_bump)


@functools.partial(jax.jit, static_argnums=(0,))
def _beaver_mask_jit(spec, xs, xm, ys, ym, ash, amc, bsh, bmc):
    """Fused d = x - a, e = y - b maskings (share + mac), shape-grouped."""
    return (F.sub(spec, xs, ash), F.sub(spec, xm, amc),
            F.sub(spec, ys, bsh), F.sub(spec, ym, bmc))


@functools.partial(jax.jit, static_argnums=(0,))
def _beaver_tail_jit(spec, ash, amc, bsh, bmc, csh, cmc, d, e, alpha_r):
    """Fused z = c + d*b + e*a + d*e reconstruction (share + mac).

    Tensors are [L, 2(party), *batch, k]; d/e are public [L, *batch, k];
    the d*e constant lands on party 0's share and alpha*d*e on both macs
    (mirror of mul_public/add_public composition)."""
    dp = d[:, None]
    ep = e[:, None]
    de = F.mul(spec, d, e)
    zs = F.add(spec, csh, F.add(spec, F.mul(spec, bsh, dp),
                                F.mul(spec, ash, ep)))
    bump = jnp.concatenate([de[:, None], jnp.zeros_like(de)[:, None]],
                           axis=1)
    zs = F.add(spec, zs, bump)
    zm = F.add(spec, cmc, F.add(spec, F.mul(spec, bmc, dp),
                                F.mul(spec, amc, ep)))
    zm = F.add(spec, zm, F.mul(spec, alpha_r, de[:, None]))
    return zs, zm


class MockFabric:
    """Both parties in one process; openings are party-axis sums.

    Mirrors the `MpcFabric` allocator API (constants, shared randomness,
    share/open, beaver products) plus telemetry counters (ark-mpc `stats`
    feature): `n_openings`, `n_triples`.
    """

    def __init__(self, spec: FieldSpec, seed: int = 0):
        self.spec = spec
        import random
        self._rng = random.Random(seed)
        p = spec.p
        # shared MAC key alpha
        a0 = self._rng.randrange(p)
        a1 = self._rng.randrange(p)
        self.alpha = (a0 + a1) % p
        self._alpha_shares = spec.to_device([a0, a1])      # [L, 2]
        self.n_openings = 0
        self.n_triples = 0
        # offline-phase artifacts (ark-mpc's executor gets triples from an
        # offline Beaver source; the reference bench's mock source is even
        # a constant): a FIFO pool filled by `preload_triples` so the
        # ONLINE path pays no dealer work.  Order-preserving, so pooled and
        # on-demand runs consume identical dealer randomness.
        self._triple_pool: list = []
        # consumption log of triple batch shapes: a warmup prove records
        # the plan, `preload_triples(fabric.triple_log)` replays it offline
        self.triple_log: list = []
        # deferred MAC checks (ark-mpc lazy-graph batching): openings
        # accumulate (value, mac) and ONE random-linear-combination check
        # runs at end of proof — no per-round device->host sync.
        self._defer = False
        self._deferred: list = []

    # -- allocation -------------------------------------------------------
    def _share_of_values(self, values: list) -> Shared:
        """Split host values into random additive shares (dealer model)."""
        p = self.spec.p
        s0 = [self._rng.randrange(p) for _ in values]
        s1 = [(v - a) % p for v, a in zip(values, s0)]
        m = [v * self.alpha % p for v in values]
        m0 = [self._rng.randrange(p) for _ in values]
        m1 = [(v - a) % p for v, a in zip(m, m0)]
        share = self.spec.to_device(s0 + s1).reshape(
            self.spec.num_limbs, 2, len(values))
        mac = self.spec.to_device(m0 + m1).reshape(
            self.spec.num_limbs, 2, len(values))
        return Shared(share=share, mac=mac)

    def share_scalars(self, values: list) -> Shared:
        return self._share_of_values([v % self.spec.p for v in values])

    def zeros_authenticated(self, n: int) -> Shared:
        return self._share_of_values([0] * n)

    def one_authenticated(self) -> Shared:
        return self._share_of_values([1])

    def random_shared_scalars(self, n: int) -> Shared:
        return self._share_of_values(
            [self._rng.randrange(self.spec.p) for _ in range(n)])

    def public(self, values: list) -> jnp.ndarray:
        """Public constants as a plain [L, k] tensor."""
        return self.spec.to_device(list(values))

    # -- linear ops (share-local) -----------------------------------------
    def add(self, a: Shared, b: Shared) -> Shared:
        return Shared(*_ew_jit(self.spec, "add", a.share, a.mac,
                               b.share, b.mac))

    def sub(self, a: Shared, b: Shared) -> Shared:
        return Shared(*_ew_jit(self.spec, "sub", a.share, a.mac,
                               b.share, b.mac))

    def neg(self, a: Shared) -> Shared:
        return Shared(*_neg_jit(self.spec, a.share, a.mac))

    def mul_public(self, a: Shared, c: jnp.ndarray) -> Shared:
        """c public [L, *batch-compatible]."""
        cb = c[:, None] if c.ndim == a.share.ndim - 1 else c
        return Shared(*_ew_jit(self.spec, "mul_public", a.share, a.mac,
                               cb, cb))

    def add_public(self, a: Shared, c: jnp.ndarray) -> Shared:
        """Only party 0 adds the public value to its share; macs add alpha*c."""
        spec = self.spec
        nb = len(a.batch_shape)
        if c.ndim == 1 + nb:
            cb = c[:, None]                           # [L, 1, *batch]
        else:
            cb = c
        alpha_r = self._alpha_shares.reshape(
            (spec.num_limbs, 2) + (1,) * nb)
        return Shared(*_add_public_jit(spec, a.share, a.mac, cb, alpha_r))

    # -- openings ----------------------------------------------------------
    def open(self, a: Shared, check: bool = True) -> jnp.ndarray:
        """Open to a public [L, *batch] tensor (party-axis sum) + MAC check."""
        self.n_openings += 1
        return self._open_one(a, check)

    def _open_one(self, a: Shared, check: bool) -> jnp.ndarray:
        spec = self.spec
        value = F.sum_reduce(spec, a.share, axis=1)
        if check:
            mac = F.sum_reduce(spec, a.mac, axis=1)
            if self._defer:
                self._deferred.append((value, mac))
                return value
            self._check_items([(value, mac)])
        return value

    def _check_items(self, items):
        """SPDZ check sum_i r_i (mac_i - alpha v_i) == 0 over a batch
        (r_i = 1 for a single immediate check)."""
        spec = self.spec
        alpha = F.sum_reduce(spec, self._alpha_shares.reshape(
            spec.num_limbs, 2, 1), axis=1)
        acc = None
        multi = len(items) > 1
        rng = self._rng
        for value, mac in items:
            v = value.reshape(spec.num_limbs, -1)
            m = mac.reshape(spec.num_limbs, -1)
            diff = F.sub(spec, m, F.mul(spec, v, alpha))
            if multi:
                r = spec.to_device(
                    [rng.randrange(spec.p) for _ in range(v.shape[1])])
                diff = F.mul(spec, diff, r)
            t = F.sum_reduce(spec, diff, axis=1) if multi else diff
            acc = t if acc is None else F.add(spec, acc, t)
        if not bool(jnp.all(F.is_zero(spec, acc))):
            raise ValueError("MAC check failed on opening")

    # -- deferred checks + offline phase ----------------------------------
    def begin_deferred_checks(self):
        self._defer = True

    def verify_deferred_checks(self):
        """One RLC-batched check for every deferred opening."""
        self._defer = False
        items, self._deferred = self._deferred, []
        if items:
            self._check_items(items)

    def preload_triples(self, counts: list):
        """Offline phase: pre-draw Beaver triples for the given batch
        SHAPES, in consumption order.  The online `_beaver_triples` pops
        them FIFO, so pooled and on-demand runs are bit-identical.

        NOTE: record the plan with `triple_log.clear()` AFTER circuit
        construction — the log accumulates from fabric creation, and a
        stale head blocks the FIFO (every online draw then falls back to
        the dealer, round-4 collab bench)."""
        for shape in counts:
            self._triple_pool.append(self._draw_triples(shape))

    def open_to_ints(self, a: Shared, check: bool = True) -> list:
        return self.spec.from_device(self.open(a, check))

    def open_batch(self, shareds: list, check: bool = True) -> list:
        """Open MANY shared tensors in ONE communication round.

        Mirror of ark-mpc `open_authenticated_batch` / the executor's op
        batching (SURVEY §2.7): the prover knows its round structure, so
        every round's openings travel together.  The mock counts one
        opening round; `NetworkFabric` overrides this with a single
        transport exchange of the whole tuple."""
        if not shareds:
            return []
        self.n_openings += 1
        return [self._open_one(a, check) for a in shareds]

    def open_point_batch(self, fq, jac_locals: list) -> list:
        """Open MANY EC point shares in one round (batched
        multiprover_kzg.rs commitment resolution)."""
        if not jac_locals:
            return []
        self.n_openings += 1
        return list(jac_locals)

    # -- multiplication (Beaver) -------------------------------------------
    def _draw_triples(self, batch_shape) -> tuple:
        """Dealer draw of (a, b, c=a*b) shares for one batch shape."""
        import math
        n = int(math.prod(batch_shape)) if batch_shape else 1
        p = self.spec.p
        av = [self._rng.randrange(p) for _ in range(n)]
        bv = [self._rng.randrange(p) for _ in range(n)]
        cv = [x * y % p for x, y in zip(av, bv)]
        return (
            batch_shape,
            self._share_of_values(av),
            self._share_of_values(bv),
            self._share_of_values(cv),
        )

    def _beaver_triples(self, batch_shape) -> tuple:
        """Mock triple source: pooled (offline) or dealer-on-demand."""
        import math
        n = int(math.prod(batch_shape)) if batch_shape else 1
        self.n_triples += n
        self.triple_log.append(tuple(batch_shape))
        if self._triple_pool:
            shape, a, b, c = self._triple_pool.pop(0)
            if shape == tuple(batch_shape):
                return a, b, c
            # shape mismatch: the preload plan diverged — fall through to
            # an on-demand draw (correctness first; determinism vs pooled
            # runs is then void)
            self._triple_pool.insert(0, (shape, a, b, c))
        _, a, b, c = self._draw_triples(batch_shape)
        return a, b, c

    def mul(self, x: Shared, y: Shared) -> Shared:
        """Beaver multiplication: z = c + d*b + e*a + d*e,
        d = open(x - a), e = open(y - b)."""
        return self.mul_batch([(x, y)])[0]

    def mul_batch(self, pairs: list) -> list:
        """MANY independent Beaver products in ONE communication round: all
        d_i, e_i maskings travel in a single batched opening (the ark-mpc
        executor batches exactly these; SURVEY §2.7).

        The local math (maskings + the z = c + d*b + e*a + d*e
        reconstruction) runs as ONE jitted program per shape group: the
        eager per-op dispatch of the naive composition was ~6s of a 10s
        2-party 2^10 collaborative prove."""
        spec = self.spec
        if type(self) is not MockFabric:
            # subclasses (NetworkFabric) override the party-aware
            # primitives (add_public adds on ONE process's local slice);
            # the fused tail below hard-codes the in-process 2-party
            # layout, so they keep the primitive composition
            return self._mul_batch_primitive(pairs)
        shapes = [tuple(x.share.shape) for x, _ in pairs]
        triples = []
        for x, y in pairs:
            a, b, c = self._beaver_triples(x.batch_shape)
            triples.append(tuple(
                t.reshape(x.share.shape) for t in
                (a.share, a.mac, b.share, b.mac, c.share, c.mac)))

        # group indices by share shape -> one fused program per group
        groups: dict = {}
        for i, sh in enumerate(shapes):
            groups.setdefault(sh, []).append(i)

        masked = [None] * (2 * len(pairs))
        tstacks = {}
        for sh, idxs in groups.items():
            # stack on a TRAILING axis: the field kernels index limbs on
            # axis 0.  Triple stacks are built once and reused by the
            # reconstruction pass below (they were stacked twice before).
            xs = jnp.stack([pairs[i][0].share for i in idxs], axis=-1)
            xm = jnp.stack([pairs[i][0].mac for i in idxs], axis=-1)
            ys = jnp.stack([pairs[i][1].share for i in idxs], axis=-1)
            ym = jnp.stack([pairs[i][1].mac for i in idxs], axis=-1)
            tstacks[sh] = tuple(
                jnp.stack([triples[i][t] for i in idxs], axis=-1)
                for t in range(6))
            ash, amc, bsh, bmc = tstacks[sh][:4]
            ds, dm, es, em = _beaver_mask_jit(spec, xs, xm, ys, ym,
                                              ash, amc, bsh, bmc)
            for j, i in enumerate(idxs):
                masked[2 * i] = Shared(ds[..., j], dm[..., j])
                masked[2 * i + 1] = Shared(es[..., j], em[..., j])
        opened = self.open_batch(masked, check=False)

        out = [None] * len(pairs)
        for sh, idxs in groups.items():
            ash, amc, bsh, bmc, csh, cmc = tstacks[sh]
            d = jnp.stack([opened[2 * i] for i in idxs], axis=-1)
            e = jnp.stack([opened[2 * i + 1] for i in idxs], axis=-1)
            nb = len(sh) - 2                      # batch dims after [L, 2]
            alpha_r = self._alpha_shares.reshape(
                (spec.num_limbs, 2) + (1,) * nb + (1,))
            zs, zm = _beaver_tail_jit(spec, ash, amc, bsh, bmc, csh, cmc,
                                      d, e, alpha_r)
            for j, i in enumerate(idxs):
                out[i] = Shared(zs[..., j], zm[..., j])
        return out

    def _mul_batch_primitive(self, pairs: list) -> list:
        """Beaver products via the (overridable) share primitives."""
        spec = self.spec
        masked = []
        triples = []
        for x, y in pairs:
            a, b, c = self._beaver_triples(x.batch_shape)
            a = Shared(a.share.reshape(x.share.shape),
                       a.mac.reshape(x.share.shape))
            b = Shared(b.share.reshape(x.share.shape),
                       b.mac.reshape(x.share.shape))
            c = Shared(c.share.reshape(x.share.shape),
                       c.mac.reshape(x.share.shape))
            triples.append((a, b, c))
            masked.append(self.sub(x, a))
            masked.append(self.sub(y, b))
        opened = self.open_batch(masked, check=False)
        out = []
        for (a, b, c), d, e in zip(triples, opened[0::2], opened[1::2]):
            z = self.add(c, self.mul_public(b, d))
            z = self.add(z, self.mul_public(a, e))
            out.append(self.add_public(z, F.mul(spec, d, e)))
        return out

    def inv(self, x: Shared) -> Shared:
        """Masked inversion: r shared random, w = open(x*r), x^-1 = r * w^-1."""
        import math
        n = int(math.prod(x.batch_shape)) if x.batch_shape else 1
        r = self.random_shared_scalars(n)
        r = Shared(r.share.reshape(x.share.shape), r.mac.reshape(x.share.shape))
        w = self.open(self.mul(x, r), check=False)
        w_inv = F.inv(self.spec, w)
        return self.mul_public(r, w_inv)

    def div(self, x: Shared, y: Shared) -> Shared:
        return self.mul(x, self.inv(y))

    # -- share-local linear transforms --------------------------------------
    def map_local(self, fn, a: Shared) -> Shared:
        """Apply a LINEAR [L, *batch] -> [L, *batch'] function to each party's
        share (and mac).  Used for NTT/iNTT/poly padding - linearity makes
        these network-free (SURVEY.md §3.4)."""
        n_local = a.share.shape[1]
        return Shared(
            jnp.stack([fn(a.share[:, p]) for p in range(n_local)], axis=1),
            jnp.stack([fn(a.mac[:, p]) for p in range(n_local)], axis=1),
        )

    def map_local_b(self, fn, a: Shared) -> Shared:
        """Batched map_local for [L, P, n] shares and BATCH-AWARE linear
        fns ([L, B, n] -> [L, B, n']): shares and MACs of all parties run
        as ONE application over a merged [L, 2P, n] tensor.  The per-party
        loop + stacks of map_local were the single largest slice of the
        collaborative prover's overhead (prof_collab2.log) — the hot call
        sites (NTT/coset FFT/iNTT/roll/slice/pad) all have batched kernels,
        so they go through here (ark-mpc batches the same ops through its
        lazy graph, SURVEY.md §2.7)."""
        assert a.share.ndim == 3, "map_local_b needs [L, P, n] shares"
        n_local = a.share.shape[1]
        both = jnp.concatenate([a.share, a.mac], axis=1)
        out = fn(both)
        return Shared(out[:, :n_local], out[:, n_local:])

    def open_point(self, fq, jac_local):
        """Open an EC point share: the mock already holds the full party-sum
        (commit_shared sums both parties' MSMs), so this just counts the
        opening round (multiprover_kzg.rs:126-142 network resolution)."""
        self.n_openings += 1
        return jac_local

    def cumprod(self, a: Shared, axis: int = 1) -> Shared:
        """Grand-product style cumulative product over shares.

        log2(n) rounds of batched Beaver muls (the reference's ark-mpc
        evaluates the same recursion through its lazy graph)."""
        n = a.share.shape[2]
        shift = 1
        out = a
        while shift < n:
            rolled = Shared(jnp.roll(out.share, shift, axis=2),
                            jnp.roll(out.mac, shift, axis=2))
            prod = self.mul(out, rolled)
            mask = (jnp.arange(n) >= shift)[None, None, :]
            out = Shared(jnp.where(mask, prod.share, out.share),
                         jnp.where(mask, prod.mac, out.mac))
            shift *= 2
        return out
