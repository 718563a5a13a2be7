"""Mixed-radix NTT with MXU (int8-matmul) DFT levels.

Factor n = r_0 * r_1 * ... (each r <= 128) and evaluate each level's
r-point DFT as a constant field matmul on the systolic array
(ops/mxu_field.py), with inter-level twiddle scaling as one vectorized
field mul:

    NTT_n(x[r, m]) = transpose_k2k1( NTT_m( (W_r @ x) * omega^{k1 j2} ) )

Natural order in and out.  The inverse folds 1/n into the FIRST level's
matrix.  Compared with the Pease butterfly path (log2(n) VPU stages at
n/2 muls each) this moves the O(n log n) butterfly muls onto the MXU and
leaves ~(levels-1) * n twiddle muls + per-level fold tails on the VPU.

Used as an alternative backend for `ops/ntt.py` transforms (exactness
cross-checked against the butterfly path in tests).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import field as F
from . import mxu_field as MX
from .field import FieldSpec
from .ntt import Domain

MAX_RADIX = 128


def _factor(n: int) -> list:
    """Split n into radices <= MAX_RADIX, largest first."""
    out = []
    while n > 1:
        r = min(n, MAX_RADIX)
        out.append(r)
        n //= r
    return out


class MxuNttPlan:
    """Per (field, n, inverse) constant tables."""

    _INTERN: dict = {}

    def __new__(cls, spec: FieldSpec, n: int, inverse: bool):
        key = (spec.name, n, inverse)
        inst = cls._INTERN.get(key)
        if inst is None:
            inst = super().__new__(cls)
            inst._build(spec, n, inverse)
            cls._INTERN[key] = inst
        return inst

    def _build(self, spec: FieldSpec, n: int, inverse: bool):
        self.spec = spec
        self.n = n
        self.inverse = inverse
        p = spec.p
        dom = Domain(spec, n)
        w = dom.w_inv if inverse else dom.w
        self.radices = _factor(n)
        self.dft_digits = []     # per level: int8 [64, r, r]
        self.twiddles = []       # per level: [L, r*m] device Montgomery or None
        scale = dom.n_inv if inverse else 1
        m_rem = n
        wl = w                   # root of order m_rem at current level
        for li, r in enumerate(self.radices):
            m = m_rem // r
            wr = pow(wl, m, p)   # r-th root
            rows = [[pow(wr, (i * j) % r, p) * (scale if li == 0 else 1) % p
                     for j in range(r)] for i in range(r)]
            self.dft_digits.append(
                jnp.asarray(MX.const_matrix_digits(spec, rows)))
            if m > 1:
                tw = [pow(wl, (k1 * j2) % m_rem, p)
                      for k1 in range(r) for j2 in range(m)]
                self.twiddles.append(spec.to_device(tw))
            else:
                self.twiddles.append(None)
            m_rem = m
            wl = pow(wl, r, p)


def _apply(plan: MxuNttPlan, x: jnp.ndarray, level: int) -> jnp.ndarray:
    """x [L, B, m_level] -> transformed [L, B, m_level], natural order."""
    spec = plan.spec
    L = spec.num_limbs
    r = plan.radices[level]
    B = x.shape[1]
    m = x.shape[2] // r
    # view rows j1-major: x[b, j1, j2]
    xv = x.reshape(L, B, r, m)
    # DFT over j1: [r, r] @ [r, B*m]
    xin = jnp.moveaxis(xv, 2, 1).reshape(L, r, B * m)
    y = MX.field_matmul_const(spec, plan.dft_digits[level], xin)
    y = jnp.moveaxis(y.reshape(L, r, B, m), 1, 2)       # [L, B, r, m]
    if m == 1:
        return y.reshape(L, B, r)
    tw = plan.twiddles[level].reshape(L, 1, r, m)
    y = F.mul(spec, y, tw)
    # recurse along j2 with (B*r) batch
    z = _apply(plan, y.reshape(L, B * r, m), level + 1)
    z = z.reshape(L, B, r, m)
    # output index k1 + r*k2: transpose to [m, r]
    return jnp.swapaxes(z, 2, 3).reshape(L, B, r * m)


@functools.partial(jax.jit, static_argnums=(0, 2))
def _ntt_jit(plan: MxuNttPlan, x: jnp.ndarray, batched: bool) -> jnp.ndarray:
    if not batched:
        x = x[:, None]
    out = _apply(plan, x, 0)
    return out if batched else out[:, 0]


def ntt_mxu(domain: Domain, x: jnp.ndarray, inverse: bool = False
            ) -> jnp.ndarray:
    """Forward/inverse NTT (natural order both ends), MXU DFT levels.

    x: [L, n] or [L, B, n] Montgomery limb tensor.
    """
    plan = MxuNttPlan(domain.spec, domain.n, inverse)
    return _ntt_jit(plan, x, x.ndim == 3)
