"""Vectorized prime-field arithmetic kernels (JAX, TPU-native layout).

This is the TPU-first replacement for the arkworks ``ark-ff`` layer that the
reference relies on everywhere (SURVEY.md L0).  A batch of field elements is a
``uint32[L, *batch]`` tensor holding 16-bit little-endian limbs in Montgomery
form (R = 2^(16*L)).  The limb axis is the *leading* axis so the (large) batch
axes are the minor ones and map onto TPU vector lanes.

Design notes
------------
* 16-bit limbs: a 16x16-bit product fits exactly in uint32, so schoolbook
  multiplication with lazy (delayed-carry) column accumulation never overflows
  uint32 (column sums stay < 2^23).  No uint64 needed - uint64 is emulated
  (slow) on TPU.
* Montgomery (CIOS-style) reduction with one carry propagated per round keeps
  all intermediate limbs < 2^23.
* Inversion is Fermat (x^(p-2)) so it is fully batched - no sequential
  Montgomery-batch-inversion scans on device.
* All control flow is static; every op traces to a fixed-size XLA graph.

Reference parity: arkworks `ark_ff::PrimeField` ops used by
`relation/src/constraint_system.rs`, `plonk/src/proof_system/prover.rs` etc.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field as dc_field

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.bigint import LIMB_BITS, LIMB_MASK, int_to_limbs, ints_to_limbs, limbs_to_ints

U32 = jnp.uint32
I32 = jnp.int32


@dataclass(frozen=True)
class FieldSpec:
    """Static description of a prime field for the limb kernels.

    Hashable/eq by modulus so it can close over jitted functions.
    """

    name: str
    p: int                      # the prime modulus
    num_limbs: int              # number of 16-bit limbs (R = 2^(16*num_limbs))
    generator: int              # multiplicative group generator (for cosets/FFT)
    two_adicity: int = dc_field(default=0)

    def __post_init__(self):
        if self.p >> (LIMB_BITS * self.num_limbs):
            raise ValueError("modulus too large for limb count")
        if 2 * self.p >> (LIMB_BITS * self.num_limbs):
            # mont-mul output fits in L limbs only when 2p < 2^(16L)
            raise ValueError("need 2p < R for lazy Montgomery output")
        object.__setattr__(self, "two_adicity", _two_adicity(self.p))

    # -- derived constants (cached) ------------------------------------
    @functools.cached_property
    def R(self) -> int:
        return 1 << (LIMB_BITS * self.num_limbs)

    @functools.cached_property
    def r_mod_p(self) -> int:
        return self.R % self.p

    @functools.cached_property
    def r2_mod_p(self) -> int:
        return (self.R * self.R) % self.p

    @functools.cached_property
    def n0inv(self) -> int:
        """-p^{-1} mod 2^16 (Montgomery constant)."""
        return (-pow(self.p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)

    @functools.cached_property
    def p_limbs(self) -> np.ndarray:
        return int_to_limbs(self.p, self.num_limbs)

    @functools.cached_property
    def root_of_unity(self) -> int:
        """2^two_adicity-th primitive root of unity: generator^((p-1)/2^s)."""
        return pow(self.generator, (self.p - 1) >> self.two_adicity, self.p)

    def nth_root(self, n: int) -> int:
        """Primitive n-th root of unity (n a power of two <= 2^two_adicity)."""
        assert n & (n - 1) == 0 and n.bit_length() - 1 <= self.two_adicity
        return pow(self.root_of_unity, 1 << (self.two_adicity - (n.bit_length() - 1)), self.p)

    def __hash__(self):
        return hash((self.name, self.p, self.num_limbs))

    def __eq__(self, other):
        return isinstance(other, FieldSpec) and self.p == other.p and self.num_limbs == other.num_limbs

    # -- host-side conversions -----------------------------------------
    def to_mont_int(self, x: int) -> int:
        return (x % self.p) * self.R % self.p

    def from_mont_int(self, x: int) -> int:
        return x * pow(self.R, -1, self.p) % self.p

    def to_device(self, xs, mont: bool = True) -> jax.Array:
        """Host ints -> device limb tensor (Montgomery form by default)."""
        if isinstance(xs, int):
            xs = [xs]
        vals = [self.to_mont_int(x) if mont else x % self.p for x in xs]
        return jnp.asarray(ints_to_limbs(vals, self.num_limbs))

    def from_device(self, arr, mont: bool = True) -> list:
        """Device limb tensor -> list of Python ints (batch flattened C-order)."""
        vals = limbs_to_ints(np.asarray(jax.device_get(arr)))
        if mont:
            rinv = pow(self.R, -1, self.p)
            vals = [v * rinv % self.p for v in vals]
        return vals

    # -- common constants as [L, 1]-broadcastable numpy --------------------
    @functools.cached_property
    def mont_one_np(self) -> np.ndarray:
        return int_to_limbs(self.r_mod_p, self.num_limbs)

    @functools.cached_property
    def zero_np(self) -> np.ndarray:
        return np.zeros(self.num_limbs, dtype=np.uint32)


def _two_adicity(p: int) -> int:
    s, t = 0, p - 1
    while t % 2 == 0:
        s += 1
        t //= 2
    return s


def _const(spec: FieldSpec, limbs: np.ndarray, batch_ndim: int) -> jnp.ndarray:
    """Reshape a [L] numpy constant for broadcast against [L, *batch]."""
    return jnp.asarray(limbs.reshape((spec.num_limbs,) + (1,) * batch_ndim))


# ---------------------------------------------------------------------------
# basic limb helpers
# ---------------------------------------------------------------------------

def zeros(spec: FieldSpec, batch_shape=()) -> jnp.ndarray:
    return jnp.zeros((spec.num_limbs,) + tuple(batch_shape), dtype=U32)


def ones(spec: FieldSpec, batch_shape=()) -> jnp.ndarray:
    one = _const(spec, spec.mont_one_np, len(batch_shape))
    return jnp.broadcast_to(one, (spec.num_limbs,) + tuple(batch_shape)).astype(U32)


def is_zero(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Boolean [*batch]: a == 0 (canonical form assumed)."""
    return jnp.all(a == 0, axis=0)


def eq(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=0)


def select(cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise select: cond ? a : b.  cond is [*batch] bool."""
    return jnp.where(cond[None, ...], a, b)


def _geq(spec: FieldSpec, a: jnp.ndarray, b_limbs) -> jnp.ndarray:
    """Lexicographic a >= b for canonical-limb inputs. Returns bool [*batch].

    Scan from the most significant limb down (compact graph).
    """
    if isinstance(b_limbs, (list, tuple)):
        b = jnp.stack([jnp.broadcast_to(x, a.shape[1:]) for x in b_limbs])
    else:
        b = jnp.broadcast_to(b_limbs, a.shape)

    def body(carry, rows):
        gt, eq = carry
        ra, rb = rows
        gt = gt | (eq & (ra > rb))
        eq = eq & (ra == rb)
        return (gt, eq), None

    # inits derived from `a` so they inherit shard_map varying-axis types
    init = (a[0] != a[0], a[0] == a[0])
    (gt, eq), _ = jax.lax.scan(body, init, (jnp.flip(a, 0), jnp.flip(b, 0)))
    return gt | eq


def _sub_limbs(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray):
    """Raw limbwise a - b with borrow propagation (int32 internally).

    Returns (diff uint32[L, *batch] canonical limbs, borrow bool[*batch]).
    """
    def body(borrow, rows):
        ra, rb = rows
        d = ra.astype(I32) - rb.astype(I32) - borrow
        borrow = (d < 0).astype(I32)
        return borrow, (d + (borrow << LIMB_BITS)).astype(U32)

    borrow, rows = jax.lax.scan(body, (a[0] * 0).astype(I32), (a, b))
    return rows, borrow > 0


def _add_limbs(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray):
    """Raw limbwise a + b with carry propagation. Returns (sum, carry_out)."""
    def body(carry, rows):
        ra, rb = rows
        s = ra + rb + carry
        return s >> LIMB_BITS, s & LIMB_MASK

    carry, rows = jax.lax.scan(body, a[0] * 0, (a, b))
    return rows, carry > 0


def _cond_sub_p(spec: FieldSpec, a: jnp.ndarray, force_mask=None) -> jnp.ndarray:
    """Subtract p where (a >= p) or force_mask; a must be canonical limbs."""
    L = spec.num_limbs
    p_b = _const(spec, spec.p_limbs, a.ndim - 1)
    p_bc = jnp.broadcast_to(p_b, a.shape)
    diff, _ = _sub_limbs(spec, a, p_bc)
    mask = _geq(spec, a, [p_b[i] for i in range(L)])
    if force_mask is not None:
        mask = mask | force_mask
    return jnp.where(mask[None, ...], diff, a)


# ---------------------------------------------------------------------------
# modular add/sub/neg
# ---------------------------------------------------------------------------

def add(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a + b mod p (inputs/outputs canonical Montgomery limbs)."""
    a, b = jnp.broadcast_arrays(a, b)
    if _use_pallas():
        from . import pallas_field
        return pallas_field.mont_add_pallas(spec, a, b)
    s, carry = _add_limbs(spec, a, b)
    # a + b < 2p < R so carry-out can only occur when 2p would exceed R;
    # FieldSpec guarantees 2p < R, hence carry is always False - but keep the
    # conditional-subtract correct regardless.
    return _cond_sub_p(spec, s, force_mask=carry)


def sub(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a - b mod p."""
    a, b = jnp.broadcast_arrays(a, b)
    if _use_pallas():
        from . import pallas_field
        return pallas_field.mont_sub_pallas(spec, a, b)
    d, borrow = _sub_limbs(spec, a, b)
    p_b = jnp.broadcast_to(_const(spec, spec.p_limbs, a.ndim - 1), a.shape)
    d_plus_p, _ = _add_limbs(spec, d, p_b)
    return jnp.where(borrow[None, ...], d_plus_p, d)


def neg(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """-a mod p (maps 0 -> 0)."""
    p_b = jnp.broadcast_to(_const(spec, spec.p_limbs, a.ndim - 1), a.shape)
    d, _ = _sub_limbs(spec, p_b, a)
    return jnp.where(is_zero(spec, a)[None, ...], a, d)


# ---------------------------------------------------------------------------
# Montgomery multiplication
# ---------------------------------------------------------------------------

def _mul_rolled(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product with rolled (fori_loop) limb loops.

    Schoolbook product with lazy column accumulation, then CIOS-style
    reduction.  All intermediates bounded < 2^23, so uint32 is safe.
    The rolled form keeps the XLA graph O(L) instead of O(L^2) - critical for
    compile time when this is traced thousands of times inside the prover.
    """
    L = spec.num_limbs
    batch_shape = a.shape[1:]
    zero_row = a[0] * 0 + b[0] * 0   # derived zero (inherits varying axes)
    acc0 = jnp.broadcast_to(zero_row[None], (2 * L + 1,) + batch_shape).astype(U32)
    pad_lo = [(0, 1)] + [(0, 0)] * len(batch_shape)
    pad_hi = [(1, 0)] + [(0, 0)] * len(batch_shape)

    def prod_body(i, acc):
        ai = jax.lax.dynamic_index_in_dim(a, i, axis=0, keepdims=True)  # [1,*b]
        p = ai * b
        contrib = jnp.pad(p & LIMB_MASK, pad_lo) + jnp.pad(p >> LIMB_BITS, pad_hi)
        cur = jax.lax.dynamic_slice_in_dim(acc, i, L + 1, axis=0)
        return jax.lax.dynamic_update_slice_in_dim(acc, cur + contrib, i, axis=0)

    acc = jax.lax.fori_loop(0, L, prod_body, acc0)

    p_dev = _const(spec, spec.p_limbs, len(batch_shape))
    n0inv = np.uint32(spec.n0inv)

    def redc_body(i, acc):
        t_i = jax.lax.dynamic_index_in_dim(acc, i, axis=0, keepdims=True)
        m = ((t_i & LIMB_MASK) * n0inv) & LIMB_MASK
        p = m * p_dev
        contrib = jnp.pad(p & LIMB_MASK, pad_lo) + jnp.pad(p >> LIMB_BITS, pad_hi)
        cur = jax.lax.dynamic_slice_in_dim(acc, i, L + 1, axis=0)
        cur = cur + contrib
        # retire limb i: move its carry into limb i+1 (limb i becomes 0 mod 2^16)
        carry = cur[0] >> LIMB_BITS
        cur = cur.at[1].add(carry)
        return jax.lax.dynamic_update_slice_in_dim(acc, cur, i, axis=0)

    acc = jax.lax.fori_loop(0, L, redc_body, acc)

    # carry-propagate the high half (scan over the limb axis)
    def carry_body(carry, row):
        s = row + carry
        return s >> LIMB_BITS, s & LIMB_MASK

    carry, rows = jax.lax.scan(carry_body, zero_row, acc[L:2 * L])
    top = acc[2 * L] + carry  # must end zero for in-range inputs (2p < R)
    return _cond_sub_p(spec, rows, force_mask=(top > 0))


def _mul_unrolled(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Fully unrolled variant of `_mul_rolled` (bigger graph, no loop overhead)."""
    L = spec.num_limbs
    batch_shape = a.shape[1:]
    acc = [jnp.zeros(batch_shape, dtype=U32) for _ in range(2 * L + 1)]
    for i in range(L):
        p = a[i][None, ...] * b          # [L, *batch] 32-bit products
        lo = p & LIMB_MASK
        hi = p >> LIMB_BITS
        for j in range(L):
            acc[i + j] = acc[i + j] + lo[j]
            acc[i + j + 1] = acc[i + j + 1] + hi[j]
    p_np = spec.p_limbs
    n0inv = np.uint32(spec.n0inv)
    for i in range(L):
        m = ((acc[i] & LIMB_MASK) * n0inv) & LIMB_MASK
        for j in range(L):
            prod = m * np.uint32(p_np[j])
            acc[i + j] = acc[i + j] + (prod & LIMB_MASK)
            acc[i + j + 1] = acc[i + j + 1] + (prod >> LIMB_BITS)
        acc[i + 1] = acc[i + 1] + (acc[i] >> LIMB_BITS)
    out = []
    carry = jnp.zeros(batch_shape, dtype=U32)
    for j in range(L, 2 * L):
        s = acc[j] + carry
        carry = s >> LIMB_BITS
        out.append(s & LIMB_MASK)
    top = acc[2 * L] + carry
    return _cond_sub_p(spec, jnp.stack(out), force_mask=(top > 0))


import os as _os

_FORCE_NO_PALLAS = _os.environ.get("MPC_JELLYFISH_NO_PALLAS", "") == "1"


def _use_pallas() -> bool:
    if _FORCE_NO_PALLAS:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product a*b*R^-1 mod p (canonical limbs in/out).

    On TPU this dispatches to the Pallas kernel (VMEM-resident accumulator,
    ~optimal HBM traffic); elsewhere to the rolled XLA implementation.
    """
    a, b = jnp.broadcast_arrays(a, b)
    if _use_pallas():
        from . import pallas_field
        return pallas_field.mont_mul_pallas(spec, a, b)
    return _mul_rolled(spec, a, b)


def sqr(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mul(spec, a, a)


def mul_const(spec: FieldSpec, a: jnp.ndarray, c: int) -> jnp.ndarray:
    """Multiply by a host constant (c given in normal form)."""
    c_mont = _const(spec, int_to_limbs(spec.to_mont_int(c), spec.num_limbs), a.ndim - 1)
    return mul(spec, a, c_mont)


def pow_static(spec: FieldSpec, a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a^e for a static Python-int exponent (square and multiply, unrolled)."""
    if e == 0:
        return ones(spec, a.shape[1:])
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else mul(spec, result, base)
        e >>= 1
        if e:
            base = sqr(spec, base)
    return result


def _pow_loop(spec: FieldSpec, a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a^e with a rolled (fori_loop) square-and-multiply.

    Keeps the XLA graph O(1) in the exponent bit-length - important because the
    Fermat inverse runs ~2*254 Montgomery muls and a fully unrolled graph
    would dominate compile time.  The conditional multiply is a select, so the
    loop body is shape-invariant.
    """
    nbits = e.bit_length()
    bits = jnp.asarray([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=jnp.bool_)
    res0 = ones(spec, a.shape[1:]) + a * 0   # derived for shard_map varying axes

    def body(i, res):
        res = sqr(spec, res)
        return select(bits[i], mul(spec, res, a), res)

    return jax.lax.fori_loop(0, nbits, body, res0)


def inv(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Batched inverse via Fermat: a^(p-2).  inv(0) = 0."""
    return _pow_loop(spec, a, spec.p - 2)


def to_mont(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Normal-form limbs -> Montgomery form (device)."""
    r2 = _const(spec, int_to_limbs(spec.r2_mod_p, spec.num_limbs), a.ndim - 1)
    return mul(spec, a, r2)


def from_mont(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery form -> normal-form limbs (device)."""
    one = jnp.zeros_like(a).at[0].set(1)
    return mul(spec, a, one)


# ---------------------------------------------------------------------------
# reductions / scans used by polynomial code
# ---------------------------------------------------------------------------

def sum_reduce(spec: FieldSpec, a: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Field sum along one batch axis (log-depth tree)."""
    assert axis >= 1
    n = a.shape[axis]
    while n > 1:
        half = n // 2
        lo = jax.lax.slice_in_dim(a, 0, half, axis=axis)
        hi = jax.lax.slice_in_dim(a, half, 2 * half, axis=axis)
        s = add(spec, lo, hi)
        if n % 2:
            tail = jax.lax.slice_in_dim(a, 2 * half, n, axis=axis)
            s = jnp.concatenate([s, tail], axis=axis)
            n = half + 1
        else:
            n = half
        a = s
    return jnp.squeeze(a, axis=axis)


def cumprod(spec: FieldSpec, a: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Inclusive cumulative field product along a batch axis (Hillis-Steele).

    log2(n) vectorized field muls; used for grand-product polynomials
    (reference `relation/src/constraint_system.rs:1197` prefix product).
    """
    assert axis >= 1
    n = a.shape[axis]
    shift = 1
    while shift < n:
        # multiply element i by element i-shift (where defined)
        rolled = jnp.roll(a, shift, axis=axis)
        prefix_mask = (jnp.arange(n) >= shift)
        shape = [1] * a.ndim
        shape[axis] = n
        mask = prefix_mask.reshape(shape)
        prod = mul(spec, a, rolled)
        a = jnp.where(mask, prod, a)
        shift *= 2
    return a


def powers_outer(spec: FieldSpec, base: jnp.ndarray, k: int) -> jnp.ndarray:
    """base [L, B] -> [L, B, k] with out[:, b, j] = base[:, b]^j.

    Log-depth doubling along the new power axis.
    """
    L, B = base.shape
    out = ones(spec, (B, 1))
    bk = base[:, :, None]                    # base^(2^round)
    while out.shape[2] < k:
        nxt = mul(spec, out, bk)
        out = jnp.concatenate([out, nxt], axis=2)
        bk = sqr(spec, bk)
    return out[:, :, :k]


def cumsum(spec: FieldSpec, a: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Inclusive cumulative field sum along a batch axis (Hillis-Steele)."""
    assert axis >= 1
    n = a.shape[axis]
    shift = 1
    while shift < n:
        rolled = jnp.roll(a, shift, axis=axis)
        prefix_mask = (jnp.arange(n) >= shift)
        shape = [1] * a.ndim
        shape[axis] = n
        mask = prefix_mask.reshape(shape)
        s = add(spec, a, rolled)
        a = jnp.where(mask, s, a)
        shift *= 2
    return a


def powers(spec: FieldSpec, base: jnp.ndarray, n: int) -> jnp.ndarray:
    """[L, n] tensor of base^0, base^1, ..., base^(n-1) (Montgomery form).

    base is [L] or [L,1].  Log-depth doubling construction.
    """
    b = base.reshape(spec.num_limbs, 1)
    out = ones(spec, (1,))
    bk = b  # base^(2^round) = base^len(out)
    while out.shape[1] < n:
        nxt = mul(spec, out, bk)          # out * base^len -> next block
        out = jnp.concatenate([out, nxt], axis=1)
        bk = sqr(spec, bk)
    return out[:, :n]


# ---------------------------------------------------------------------------
# jit-wrapped public API (spec & other config args are static).
# Calling these eagerly dispatches one compiled XLA program per (op, shape)
# instead of thousands of tiny eager ops.
# ---------------------------------------------------------------------------
import functools as _ft

add = _ft.partial(jax.jit, static_argnums=0)(add)
sub = _ft.partial(jax.jit, static_argnums=0)(sub)
neg = _ft.partial(jax.jit, static_argnums=0)(neg)
mul = _ft.partial(jax.jit, static_argnums=0)(mul)
sqr = _ft.partial(jax.jit, static_argnums=0)(sqr)
inv = _ft.partial(jax.jit, static_argnums=0)(inv)
to_mont = _ft.partial(jax.jit, static_argnums=0)(to_mont)
from_mont = _ft.partial(jax.jit, static_argnums=0)(from_mont)
mul_const = _ft.partial(jax.jit, static_argnums=(0, 2))(mul_const)
pow_static = _ft.partial(jax.jit, static_argnums=(0, 2))(pow_static)
sum_reduce = _ft.partial(jax.jit, static_argnums=(0, 2))(sum_reduce)
cumprod = _ft.partial(jax.jit, static_argnums=(0, 2))(cumprod)
cumsum = _ft.partial(jax.jit, static_argnums=(0, 2))(cumsum)
powers = _ft.partial(jax.jit, static_argnums=(0, 2))(powers)


def batch_inv(spec: FieldSpec, a: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Batched inverse via the Montgomery trick: prefix products + ONE
    Fermat inverse of the total + suffix products.

    ~2*log2(n) + 2 full-width muls instead of Fermat's ~380 per element
    (measured ~10x at n = 2^16).  Requires all elements nonzero (grand
    product denominators are, by soundness).  inv(a_i) = P_{i-1} * S_{i+1}
    * inv(total) with P/S the prefix/suffix cumulative products.
    """
    n = a.shape[axis]
    pre = cumprod(spec, a, axis=axis)                       # P_i
    rev = jnp.flip(a, axis=axis)
    suf = jnp.flip(cumprod(spec, rev, axis=axis), axis=axis)  # S_i
    total = jax.lax.slice_in_dim(pre, n - 1, n, axis=axis)  # [., 1]
    inv_total = inv(spec, total)
    # shift: P_{i-1} (P_{-1} = 1), S_{i+1} (S_n = 1)
    one_shape = list(a.shape)
    one_shape[axis] = 1
    one = ones(spec, tuple(one_shape[1:]))
    p_prev = jnp.concatenate(
        [one, jax.lax.slice_in_dim(pre, 0, n - 1, axis=axis)], axis=axis)
    s_next = jnp.concatenate(
        [jax.lax.slice_in_dim(suf, 1, n, axis=axis), one], axis=axis)
    return mul(spec, mul(spec, p_prev, s_next), inv_total)
