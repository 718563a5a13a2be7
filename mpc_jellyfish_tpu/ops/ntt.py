"""Radix-2 NTT / iNTT / coset-NTT over prime-field limb tensors.

TPU-native replacement for arkworks ``Radix2EvaluationDomain::{fft, ifft,
coset_fft}`` (SURVEY.md L0; hot loops in
`plonk/src/proof_system/prover.rs:512-675` and
`relation/src/constraint_system.rs:1225-1259`).

Layout: coefficient/evaluation vectors are ``uint32[L, n]`` limb-major
tensors (n on the minor axis -> TPU lanes).  The transform is an iterative
decimation-in-frequency butterfly over the trailing axis followed by a single
bit-reversal gather.  log2(n) stages, each one vectorized field mul +
add/sub on n/2 lanes.  Twiddle tables are precomputed per domain
(Montgomery form) and passed as operands so they are not baked into the
compiled executable.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import field as F
from .field import FieldSpec
from ..utils.bigint import ints_to_limbs


class Domain:
    """Radix-2 evaluation domain of size n (mirror of Radix2EvaluationDomain).

    Precomputes on host: the group generator w (primitive n-th root of
    unity), its inverse, 1/n, per-stage twiddle tables (device, Montgomery
    form) and the bit-reversal permutation.  Hashable by (field, n) so it can
    be a static jit argument.
    """

    _INTERN: dict = {}

    def __new__(cls, spec: FieldSpec, n: int):
        # Interned by (field, n): domain tables (host twiddle generation is
        # O(n) Python bigint work) are built once per process, not per
        # Prover construction.
        key = (spec.name, n)
        inst = cls._INTERN.get(key)
        if inst is None:
            inst = super().__new__(cls)
            cls._INTERN[key] = inst
        return inst

    def __init__(self, spec: FieldSpec, n: int):
        if getattr(self, "_ready", False):
            return
        self._ready = True
        assert n & (n - 1) == 0, "domain size must be a power of two"
        self.spec = spec
        self.n = n
        self.log_n = n.bit_length() - 1
        self.w = spec.nth_root(n) if n > 1 else 1
        self.w_inv = pow(self.w, -1, spec.p)
        self.n_inv = pow(n, -1, spec.p)
        self.generator = spec.generator  # default coset shift

    @functools.cached_property
    def bitrev(self) -> jnp.ndarray:
        idx = np.arange(self.n)
        rev = np.zeros(self.n, dtype=np.int32)
        for b in range(self.log_n):
            rev |= ((idx >> b) & 1) << (self.log_n - 1 - b)
        # keep as numpy: cached jnp values materialized inside a trace would
        # leak tracers (shard_map closures touch these lazily)
        return rev

    def _twiddles(self, root: int):
        """Flat constant-geometry (Pease) twiddle table + per-stage offsets.

        Stage s of the constant-geometry DIF needs W_s[i] = root^(2^s * (i>>s))
        for i in [0, n/2).  The distinct values per stage are
        root^(2^s * j), j in [0, n >> (s+1)); we store them concatenated
        (total n-1 entries, padded to n) and expand on device with a gather.
        """
        spec = self.spec
        flat, offsets = [], []
        for s in range(self.log_n):
            offsets.append(len(flat))
            stride = 1 << s
            cnt = self.n >> (s + 1)
            cur = 1
            step = pow(root, stride, spec.p)
            for _ in range(cnt):
                flat.append(spec.to_mont_int(cur))
                cur = cur * step % spec.p
        flat.append(0)  # pad
        # numpy (not jnp): see `bitrev` note on tracer leaks
        return (
            ints_to_limbs(flat, spec.num_limbs),
            np.asarray(offsets, dtype=np.int32),
        )

    @functools.cached_property
    def twiddles_fwd(self):
        return self._twiddles(self.w)

    @functools.cached_property
    def twiddles_inv(self):
        return self._twiddles(self.w_inv)

    def _twiddles_dense(self, root: int):
        """Per-stage DISTINCT twiddle vectors (numpy [L, n >> (s+1)]).

        The TPU path expands these with a broadcast (repeat 2^s) instead of a
        runtime gather - gathers are the slowest primitive on TPU."""
        spec = self.spec
        out = []
        for s in range(self.log_n):
            stride = 1 << s
            cnt = self.n >> (s + 1)
            step = pow(root, stride, spec.p)
            vals, cur = [], 1
            for _ in range(cnt):
                vals.append(spec.to_mont_int(cur))
                cur = cur * step % spec.p
            out.append(ints_to_limbs(vals, spec.num_limbs))
        return out

    @functools.cached_property
    def twiddles_fwd_dense(self):
        return self._twiddles_dense(self.w)

    @functools.cached_property
    def twiddles_inv_dense(self):
        return self._twiddles_dense(self.w_inv)

    @functools.cached_property
    def elements_host(self) -> list:
        """Host list of domain elements 1, w, w^2, ... (normal-form ints)."""
        out, cur = [], 1
        for _ in range(self.n):
            out.append(cur)
            cur = cur * self.w % self.spec.p
        return out

    def __hash__(self):
        return hash((self.spec, self.n))

    def __eq__(self, other):
        return isinstance(other, Domain) and self.spec == other.spec and self.n == other.n


class CosetTable:
    """Per-(domain, g) coset scaling powers g^j / g^-j (Montgomery, device)."""

    _INTERN: dict = {}

    def __new__(cls, domain: Domain, g: int | None = None):
        key = (domain.spec.name, domain.n,
               domain.generator if g is None else g)
        inst = cls._INTERN.get(key)
        if inst is None:
            inst = super().__new__(cls)
            cls._INTERN[key] = inst
        return inst

    def __init__(self, domain: Domain, g: int | None = None):
        if getattr(self, "_ready", False):
            return
        self._ready = True
        spec = domain.spec
        self.domain = domain
        self.g = domain.generator if g is None else g
        g_inv = pow(self.g, -1, spec.p)
        # device log-depth power tables (a host bigint loop here costs
        # ~1.5s at n=2^19 and used to run per Prover construction)
        self.pows = F.powers(spec, spec.to_device([self.g])[:, 0], domain.n)
        self.pows_inv = F.powers(spec, spec.to_device([g_inv])[:, 0],
                                 domain.n)


def _stage_pallas_ok(n: int) -> bool:
    """True iff the per-stage Pallas butterfly kernel supports domain size n.

    The kernel tiles each half (n/2 elements) into [rows, 128] lane blocks
    with an 8-row sublane block; Mosaic rejects block shapes whose
    second-to-last dim is not a multiple of 8 (unless equal to the array
    dim, which never holds here since a block covers only half the poly).
    """
    return n >= 2048 and (n // 2 // 128) % 8 == 0


def _dif(spec: FieldSpec, x: jnp.ndarray, twiddles, log_n: int) -> jnp.ndarray:
    """Constant-geometry (Pease) DIF butterflies; output in bit-reversed order.

    Every stage does the same data movement:
        a = x[..., :n/2]; b = x[..., n/2:]
        x' = interleave(a + b, (a - b) * W_s)
    so the whole transform is one `lax.scan` over stages - the compiled graph
    is O(1) in n, which keeps XLA compile times flat for large domains.

    x may be [L, n] or [L, B, n] (batch of polynomials).
    """
    n = x.shape[-1]
    h = n // 2
    flat_tw, offsets = twiddles
    flat_tw = jnp.asarray(flat_tw)      # numpy -> fresh constants at trace time
    offsets = jnp.asarray(offsets)
    lane = jnp.arange(h, dtype=jnp.int32)
    batched = x.ndim == 3

    def body(xc, s):
        idx = offsets[s] + (lane >> s)
        w = flat_tw[:, idx]                     # [L, h] expanded twiddles
        if batched:
            w = w[:, None, :]
        a = xc[..., :h]
        b = xc[..., h:]
        s_ = F.add(spec, a, b)
        d_ = F.mul(spec, F.sub(spec, a, b), w)
        out = jnp.stack([s_, d_], axis=-1).reshape(xc.shape[:-1] + (n,))
        return out, None

    x, _ = jax.lax.scan(body, x, jnp.arange(log_n, dtype=jnp.int32))
    return x


def _dif_tpu(spec: FieldSpec, x: jnp.ndarray, dense_tw, log_n: int) -> jnp.ndarray:
    """Unrolled constant-geometry DIF using the fused Pallas butterfly kernel.

    dense_tw: list of numpy [L, n >> (s+1)] distinct twiddles per stage,
    expanded by repeat (broadcast+reshape, gather-free).  Supports [L, n] and
    [L, B, n] (vmapped over the poly batch).
    """
    from . import pallas_field as PF
    n = x.shape[-1]
    h = n // 2
    batched = x.ndim == 3

    del batched
    for s in range(log_n):
        tw = jnp.asarray(dense_tw[s])                  # [L, cnt]
        w = jnp.repeat(tw, 1 << s, axis=1)             # [L, h] dense
        x = PF.ntt_stage_pallas(spec, x, w)
    return x


def _dif_dispatch(domain: Domain, x, twiddles, inverse: bool):
    from . import field as F
    # Pallas stage kernel blocks each HALF of the poly: Mosaic requires the
    # sublane block dim to be a multiple of 8, so the half must span >= 8
    # rows of 128 lanes (n/2/128 % 8 == 0 -> n >= 2048).  n in {256..1024}
    # used to slip through a `n >= 256` gate and crash Mosaic lowering on
    # real TPUs (round-3 batch-verify bench, bench_r3_batchverify.log).
    if F._use_pallas() and _stage_pallas_ok(domain.n):
        dense = (domain.twiddles_inv_dense if inverse
                 else domain.twiddles_fwd_dense)
        return _dif_tpu(domain.spec, x, dense, domain.log_n)
    return _dif(domain.spec, x, twiddles, domain.log_n)


@functools.partial(jax.jit, static_argnums=0)
def _ntt_jit(domain: Domain, coeffs, twiddles, bitrev):
    y = _dif_dispatch(domain, coeffs, twiddles, False)
    return jnp.take(y, bitrev, axis=-1)


@functools.partial(jax.jit, static_argnums=0)
def _intt_jit(domain: Domain, evals, twiddles, bitrev):
    y = _dif_dispatch(domain, evals, twiddles, True)
    y = jnp.take(y, bitrev, axis=-1)
    return F.mul_const(domain.spec, y, domain.n_inv)


def _cached(name, domain, fn, *args):
    from ..utils.aot_cache import cached_jit
    leaves = jax.tree_util.tree_leaves(args)
    shapes = "-".join("x".join(map(str, a.shape)) for a in leaves)
    key = f"{name}-{domain.spec.name}-n{domain.n}-{shapes}"
    return cached_jit(key, fn, *args, deps=("ntt",))(*args)


def _fused_plan(domain: Domain, inverse: bool, coset=None):
    if not F._use_pallas():
        return None
    from .pallas_ntt import FusedNtt
    return FusedNtt.get(domain, inverse, coset)


# -- composable kernel getters ---------------------------------------------
# Each returns (tag, fn, args) where fn(x, *args) computes the transform and
# is safe to call inside an OUTER jit: every table rides in `args` as an
# operand (callers must thread them through their own jit boundary — baking
# them as closed-over constants is what OOM'd 2^20 in round 2).  `tag` is a
# short string for cache keys (the fused and per-stage paths have different
# signatures).

def intt_kernel(domain: Domain):
    plan = _fused_plan(domain, inverse=True)
    if plan is not None:
        from .pallas_ntt import _apply
        fn = (lambda x, stws, posts, perm: _apply(
            domain.spec, plan.factors, x, stws, posts, None, None, perm))
        return "f", fn, (plan.stws, plan.posts, plan.perm)
    return ("s", lambda x, tw, br: _intt_jit(domain, x, tw, br),
            (domain.twiddles_inv, domain.bitrev))


def ntt_kernel(domain: Domain):
    plan = _fused_plan(domain, inverse=False)
    if plan is not None:
        from .pallas_ntt import _apply
        fn = (lambda x, stws, posts, perm: _apply(
            domain.spec, plan.factors, x, stws, posts, None, None, perm))
        return "f", fn, (plan.stws, plan.posts, plan.perm)
    return ("s", lambda x, tw, br: _ntt_jit(domain, x, tw, br),
            (domain.twiddles_fwd, domain.bitrev))


def coset_ntt_kernel(domain: Domain, table: "CosetTable"):
    plan = _fused_plan(domain, inverse=False, coset=table)
    if plan is not None:
        from .pallas_ntt import _apply
        fn = (lambda x, stws, posts, pre0, perm: _apply(
            domain.spec, plan.factors, x, stws, posts, pre0, None, perm))
        return "f", fn, (plan.stws, plan.posts, plan.pre0, plan.perm)
    return ("s", lambda x, pw, tw, br: _coset_ntt_jit(domain, x, pw, tw, br),
            (table.pows, domain.twiddles_fwd, domain.bitrev))


def coset_ntt_dyn_kernel(domain: Domain):
    """Coset NTT whose shift-power table is computed by the CALLER in-trace
    (chunked quotient: a different coset per chunk).  fn(x, pows, *args)."""
    plan = _fused_plan(domain, inverse=False)
    if plan is not None:
        from .pallas_ntt import _apply
        f0 = plan.factors[0]

        def fn(x, pows, stws, posts, perm):
            pre0 = pows.reshape(domain.spec.num_limbs, f0, domain.n // f0)
            return _apply(domain.spec, plan.factors, x, stws, posts, pre0,
                          None, perm)
        return "f", fn, (plan.stws, plan.posts, plan.perm)
    return ("s",
            lambda x, pw, tw, br: _coset_ntt_jit(domain, x, pw, tw, br),
            (domain.twiddles_fwd, domain.bitrev))


def coset_intt_kernel(domain: Domain, table: "CosetTable"):
    plan = _fused_plan(domain, inverse=True, coset=table)
    if plan is not None:
        from .pallas_ntt import _apply
        fn = (lambda x, stws, posts, postlast, perm: _apply(
            domain.spec, plan.factors, x, stws, posts, None, postlast, perm))
        return "f", fn, (plan.stws, plan.posts, plan.postlast, plan.perm)
    return ("s",
            lambda x, pw, tw, br: _coset_intt_jit(domain, x, pw, tw, br),
            (table.pows_inv, domain.twiddles_inv, domain.bitrev))


def ntt(domain: Domain, coeffs: jnp.ndarray) -> jnp.ndarray:
    """Forward NTT: coefficients -> evaluations on the domain (natural order)."""
    if domain.n == 1:
        return coeffs
    plan = _fused_plan(domain, inverse=False)
    if plan is not None:
        return plan(coeffs)
    return _cached("ntt", domain,
                   lambda c, tw, br: _ntt_jit(domain, c, tw, br),
                   coeffs, domain.twiddles_fwd, domain.bitrev)


def intt(domain: Domain, evals: jnp.ndarray) -> jnp.ndarray:
    """Inverse NTT: evaluations -> coefficients."""
    if domain.n == 1:
        return evals
    plan = _fused_plan(domain, inverse=True)
    if plan is not None:
        return plan(evals)
    return _cached("intt", domain,
                   lambda e, tw, br: _intt_jit(domain, e, tw, br),
                   evals, domain.twiddles_inv, domain.bitrev)


@functools.partial(jax.jit, static_argnums=0)
def _coset_ntt_jit(domain: Domain, coeffs, pows, twiddles, bitrev):
    if coeffs.ndim == 3:
        pows = pows[:, None, :]
    scaled = F.mul(domain.spec, coeffs, pows)
    y = _dif_dispatch(domain, scaled, twiddles, False)
    return jnp.take(y, bitrev, axis=-1)


@functools.partial(jax.jit, static_argnums=0)
def _coset_intt_jit(domain: Domain, evals, pows_inv, twiddles, bitrev):
    if evals.ndim == 3:
        pows_inv = pows_inv[:, None, :]
    y = _dif_dispatch(domain, evals, twiddles, True)
    y = jnp.take(y, bitrev, axis=-1)
    y = F.mul_const(domain.spec, y, domain.n_inv)
    return F.mul(domain.spec, y, pows_inv)


def coset_ntt(domain: Domain, coeffs: jnp.ndarray, table: CosetTable) -> jnp.ndarray:
    """Evaluate poly on the coset g*H: NTT(coeff_j * g^j), natural order."""
    plan = _fused_plan(domain, inverse=False, coset=table)
    if plan is not None:
        return plan(coeffs)
    return _cached("coset_ntt", domain,
                   lambda c, pw, tw, br: _coset_ntt_jit(domain, c, pw, tw, br),
                   coeffs, table.pows, domain.twiddles_fwd, domain.bitrev)


def coset_intt(domain: Domain, evals: jnp.ndarray, table: CosetTable) -> jnp.ndarray:
    """Interpolate from evaluations on coset g*H back to coefficients."""
    plan = _fused_plan(domain, inverse=True, coset=table)
    if plan is not None:
        return plan(evals)
    return _cached("coset_intt", domain,
                   lambda e, pw, tw, br: _coset_intt_jit(domain, e, pw, tw, br),
                   evals, table.pows_inv, domain.twiddles_inv, domain.bitrev)
