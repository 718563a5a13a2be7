"""Vectorized short-Weierstrass G1 arithmetic (Jacobian coordinates).

TPU-native replacement for arkworks `ark-ec` group ops on the MSM/commit hot
path (SURVEY.md L0; `pcs/univariate_kzg/mod.rs:108-112` msm_bigint).

A batch of Jacobian points is a tuple ``(X, Y, Z)`` of ``uint32[L, *batch]``
Fq limb tensors (Montgomery form); Z == 0 encodes infinity.  Affine batches
are ``(x, y, inf_mask)`` with ``inf_mask: bool[*batch]``.  All formulas are
branchless - every case (infinity, doubling, inverse points) is computed and
selected, so the ops map onto the TPU VPU with no divergence.

Compile-time design: independent field muls are batched per dependency level
(one `F.mul` instantiation on a stacked [L, k, n] tensor per level) so each
EC op contains ~6 Montgomery-mul subgraphs instead of ~30 - XLA compile time
and VPU utilization both improve.

Curves have a = 0 (BN254, BLS12-381), which the doubling formula exploits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import field as F
from .field import FieldSpec
from ..utils.ec_host import AffinePoint


def _bmul(spec: FieldSpec, pairs):
    """Batched independent muls: [(a, b), ...] -> list of products.

    All operands must share the same shape [L, *batch]; one Montgomery-mul
    subgraph on [L, k, *batch] serves the whole level.
    """
    a = jnp.stack([x for x, _ in pairs], axis=1)
    b = jnp.stack([y for _, y in pairs], axis=1)
    out = F.mul(spec, a, b)
    return [out[:, i] for i in range(len(pairs))]


def jac_infinity(spec: FieldSpec, batch_shape=()):
    z = F.zeros(spec, batch_shape)
    return (F.ones(spec, batch_shape), F.ones(spec, batch_shape), z)


def jac_is_inf(spec: FieldSpec, P):
    return F.is_zero(spec, P[2])


def jac_neg(spec: FieldSpec, P):
    return (P[0], F.neg(spec, P[1]), P[2])


def _sel(cond, a, b):
    return tuple(F.select(cond, ai, bi) for ai, bi in zip(a, b))


def _double_core(spec: FieldSpec, X, Y, Z, A, B, C, T, YZ):
    """Doubling given precomputed A=X^2, B=Y^2, C=B^2, T=(X+B)^2, YZ=Y*Z.

    Returns (X3, Y3, Z3, E, D): needs one more mul level for F=E^2 and
    E*(D-X3), supplied by the caller's level batching.
    """
    D = F.sub(spec, F.sub(spec, T, A), C)
    D = F.add(spec, D, D)
    E = F.add(spec, F.add(spec, A, A), A)
    Z3 = F.add(spec, YZ, YZ)
    return D, E, Z3


def jac_double(spec: FieldSpec, P):
    """Point doubling, a=0 curve.  Handles Z=0 (Z3 = 2YZ = 0)."""
    X, Y, Z = P
    A, B = _bmul(spec, [(X, X), (Y, Y)])
    XB = F.add(spec, X, B)
    C, T, YZ = _bmul(spec, [(B, B), (XB, XB), (Y, Z)])
    D, E, Z3 = _double_core(spec, X, Y, Z, A, B, C, T, YZ)
    (Ff,) = _bmul(spec, [(E, E)])
    X3 = F.sub(spec, Ff, F.add(spec, D, D))
    (EDX,) = _bmul(spec, [(E, F.sub(spec, D, X3))])
    C8 = F.add(spec, C, C)
    C8 = F.add(spec, C8, C8)
    C8 = F.add(spec, C8, C8)
    Y3 = F.sub(spec, EDX, C8)
    return (X3, Y3, Z3)


def jac_add(spec: FieldSpec, P, Q):
    """General Jacobian + Jacobian addition, complete via selects."""
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    # L1: squares (+ doubling-path A, B)
    Z1Z1, Z2Z2, A, B = _bmul(spec, [(Z1, Z1), (Z2, Z2), (X1, X1), (Y1, Y1)])
    # L2
    XB = F.add(spec, X1, B)
    U1, U2, T1, T2, C, T, YZ = _bmul(spec, [
        (X1, Z2Z2), (X2, Z1Z1), (Z2, Z2Z2), (Z1, Z1Z1), (B, B), (XB, XB), (Y1, Z1)])
    # L3
    D, E, Z3d = _double_core(spec, X1, Y1, Z1, A, B, C, T, YZ)
    S1, S2, Ff = _bmul(spec, [(Y1, T1), (Y2, T2), (E, E)])
    H = F.sub(spec, U2, U1)
    R = F.sub(spec, S2, S1)
    X3d = F.sub(spec, Ff, F.add(spec, D, D))
    # L4
    HH, Z12 = _bmul(spec, [(H, H), (Z1, Z2)])
    # L5
    HHH, V, RR, Z3, EDX = _bmul(spec, [
        (H, HH), (U1, HH), (R, R), (Z12, H), (E, F.sub(spec, D, X3d))])
    X3 = F.sub(spec, F.sub(spec, RR, HHH), F.add(spec, V, V))
    C8 = F.add(spec, C, C)
    C8 = F.add(spec, C8, C8)
    C8 = F.add(spec, C8, C8)
    Y3d = F.sub(spec, EDX, C8)
    # L6
    RVX, S1H = _bmul(spec, [(R, F.sub(spec, V, X3)), (S1, HHH)])
    Y3 = F.sub(spec, RVX, S1H)
    added = (X3, Y3, Z3)
    dbl = (X3d, Y3d, Z3d)

    p_inf = jac_is_inf(spec, P)
    q_inf = jac_is_inf(spec, Q)
    h_zero = F.is_zero(spec, H)
    r_zero = F.is_zero(spec, R)
    inf = jac_infinity(spec, X1.shape[1:])

    out = _sel(h_zero & r_zero, dbl, added)     # equal points -> double
    out = _sel(h_zero & ~r_zero, inf, out)      # inverse points -> infinity
    out = _sel(q_inf, P, out)
    out = _sel(p_inf, Q, out)
    return out


def jac_madd(spec: FieldSpec, P, Qa):
    """Mixed addition: Jacobian P + affine Q (Z2 = 1), complete via selects."""
    X1, Y1, Z1 = P
    x2, y2, q_inf = Qa
    # L1
    Z1Z1, A, B = _bmul(spec, [(Z1, Z1), (X1, X1), (Y1, Y1)])
    # L2
    XB = F.add(spec, X1, B)
    U2, T2, C, T, YZ = _bmul(spec, [
        (x2, Z1Z1), (Z1, Z1Z1), (B, B), (XB, XB), (Y1, Z1)])
    # L3
    D, E, Z3d = _double_core(spec, X1, Y1, Z1, A, B, C, T, YZ)
    S2, Ff = _bmul(spec, [(y2, T2), (E, E)])
    H = F.sub(spec, U2, X1)
    R = F.sub(spec, S2, Y1)
    X3d = F.sub(spec, Ff, F.add(spec, D, D))
    # L4
    (HH,) = _bmul(spec, [(H, H)])
    # L5
    HHH, V, RR, Z3, EDX = _bmul(spec, [
        (H, HH), (X1, HH), (R, R), (Z1, H), (E, F.sub(spec, D, X3d))])
    X3 = F.sub(spec, F.sub(spec, RR, HHH), F.add(spec, V, V))
    C8 = F.add(spec, C, C)
    C8 = F.add(spec, C8, C8)
    C8 = F.add(spec, C8, C8)
    Y3d = F.sub(spec, EDX, C8)
    # L6
    RVX, Y1H = _bmul(spec, [(R, F.sub(spec, V, X3)), (Y1, HHH)])
    Y3 = F.sub(spec, RVX, Y1H)
    added = (X3, Y3, Z3)
    dbl = (X3d, Y3d, Z3d)

    p_inf = jac_is_inf(spec, P)
    h_zero = F.is_zero(spec, H)
    r_zero = F.is_zero(spec, R)
    one = F.ones(spec, x2.shape[1:])
    q_as_jac = (x2, y2, one)
    inf = jac_infinity(spec, X1.shape[1:])

    out = _sel(h_zero & r_zero, dbl, added)
    out = _sel(h_zero & ~r_zero, inf, out)
    out = _sel(p_inf, q_as_jac, out)
    out = _sel(q_inf, P, out)
    return out


@functools.partial(jax.jit, static_argnums=0)
def jac_to_affine(spec: FieldSpec, P):
    """Jacobian -> affine: (X/Z^2, Y/Z^3, inf_mask).  Batched inverse.

    Jitted: the eager version paid one device-link round trip per op, and
    the Fermat-inverse chain made a single-point conversion cost ~1.5s
    through the remote-TPU tunnel (measured; ~3ms jitted)."""
    X, Y, Z = P
    inf = F.is_zero(spec, Z)
    zi = F.inv(spec, Z)
    zi2 = F.sqr(spec, zi)
    x = F.mul(spec, X, zi2)
    y = F.mul(spec, Y, F.mul(spec, zi, zi2))
    return (x, y, inf)


# -- host <-> device conversions --------------------------------------------

def affine_to_device(spec: FieldSpec, points: list):
    """List of host AffinePoint -> device affine batch (Montgomery coords)."""
    xs = [0 if p.inf else p.x for p in points]
    ys = [0 if p.inf else p.y for p in points]
    mask = jnp.asarray([p.inf for p in points], dtype=jnp.bool_)
    return (spec.to_device(xs), spec.to_device(ys), mask)


def affine_from_device(spec: FieldSpec, batch) -> list:
    """Device affine batch -> list of host AffinePoint."""
    x, y, inf = batch
    xs = spec.from_device(x)
    ys = spec.from_device(y)
    infs = list(jax.device_get(inf).reshape(-1))
    return [AffinePoint.infinity() if i else AffinePoint(a, b)
            for a, b, i in zip(xs, ys, infs)]


def batch_scalar_mul(spec: FieldSpec, P, scalars: jnp.ndarray):
    """Independent scalar muls: P_i * s_i (NOT an MSM; no accumulation).

    P: jacobian tuple [L, n]; scalars: [Lr, n] NORMAL-form limbs.
    Left-to-right double-and-add as one lax.scan over the bit positions.
    Used by the FK23 group-FFT (reference toeplitz.rs:27-118 applied to
    G1 vectors in `univariate_kzg/mod.rs:336-376`)."""
    Lr = scalars.shape[0]
    bits = Lr * 16
    n_shape = P[0].shape[1:]
    acc = jac_infinity(spec, n_shape)

    def body(acc, j):
        jj = bits - 1 - j
        limb = scalars[jj // 16]
        bit = ((limb >> (jj % 16)) & 1) > 0
        acc = jac_double(spec, acc)
        added = jac_add(spec, acc, P)
        return _sel(bit, added, acc), None

    acc, _ = jax.lax.scan(body, acc, jnp.arange(bits, dtype=jnp.int32))
    return acc


def scalar_mul_const(spec: FieldSpec, P, k: int, k_limbs: int):
    """P_i * k for one shared constant k (scan-based; small compiled graph)."""
    from ..utils.bigint import ints_to_limbs
    sc = jnp.asarray(ints_to_limbs([k], k_limbs))       # [Lr, 1]
    sc = jnp.broadcast_to(sc, (k_limbs,) + P[0].shape[1:])
    return batch_scalar_mul(spec, P, sc)


# jit-wrapped public ops
jac_double = functools.partial(jax.jit, static_argnums=0)(jac_double)
jac_add = functools.partial(jax.jit, static_argnums=0)(jac_add)
jac_madd = functools.partial(jax.jit, static_argnums=0)(jac_madd)
