"""Univariate KZG polynomial commitment scheme on TPU.

TPU-native equivalent of the reference's `UnivariateKzgPCS`
(`primitives/src/pcs/univariate_kzg/mod.rs:90-166`; SRS types in
`pcs/univariate_kzg/srs.rs`): commit = one MSM over the SRS powers-of-g,
open = quotient-poly division + MSM, verify = 2-pairing check (host).

Device-side: SRS G1 powers live as affine limb tensors; commit/open run the
Pippenger MSM kernel.  Host-side: G2 elements, pairings, (de)serialization.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..curves import CurveSpec
from ..ops import field as F
from ..ops import ec as E
from ..ops import msm as M
from ..ops import poly as P
from .. import pairing as PR
from ..utils.ec_host import AffinePoint, ec_mul, ec_neg, ec_add
from ..utils.bigint import ints_to_limbs


@dataclass
class UniversalSrs:
    """powers_of_g on device (affine batch), h / beta_h host G2 points.

    Mirror of `UnivariateUniversalParams` (reference srs.rs).
    """

    curve: CurveSpec
    powers_of_g: tuple          # device affine batch (x, y, inf), length max_degree+1
    h: PR.G2Point
    beta_h: PR.G2Point

    @property
    def max_degree(self) -> int:
        return self.powers_of_g[0].shape[1] - 1

    def trim(self, supported_degree: int):
        """-> (CommitKey, OpenKey).  Mirror of `srs.trim` (snark.rs:561)."""
        if supported_degree > self.max_degree:
            raise ValueError(
                f"SRS supports degree {self.max_degree} < {supported_degree}")
        n = supported_degree + 1
        ck = CommitKey(
            curve=self.curve,
            powers_of_g=tuple(t[..., :n] for t in self.powers_of_g),
        )
        g = E.affine_from_device(self.curve.fq, tuple(t[..., :1] for t in self.powers_of_g))[0]
        vk = OpenKey(curve=self.curve, g=g, h=self.h, beta_h=self.beta_h)
        return ck, vk

    def save(self, path: str):
        x, y, inf = self.powers_of_g
        np.savez_compressed(
            path,
            x=np.asarray(jax.device_get(x)),
            y=np.asarray(jax.device_get(y)),
            inf=np.asarray(jax.device_get(inf)),
            h=np.asarray([*self.h.x, *self.h.y], dtype=object),
            beta_h=np.asarray([*self.beta_h.x, *self.beta_h.y], dtype=object),
            curve=self.curve.name,
        )

    @staticmethod
    def load(path: str, curve: CurveSpec) -> "UniversalSrs":
        """Mirror of `load_srs_from_file` (pcs/mod.rs:78)."""
        z = np.load(path, allow_pickle=True)
        assert str(z["curve"]) == curve.name
        pg = (jnp.asarray(z["x"]), jnp.asarray(z["y"]), jnp.asarray(z["inf"]))
        h = PR.G2Point((int(z["h"][0]), int(z["h"][1])), (int(z["h"][2]), int(z["h"][3])))
        bh = PR.G2Point((int(z["beta_h"][0]), int(z["beta_h"][1])),
                        (int(z["beta_h"][2]), int(z["beta_h"][3])))
        return UniversalSrs(curve=curve, powers_of_g=pg, h=h, beta_h=bh)


@dataclass
class CommitKey:
    curve: CurveSpec
    powers_of_g: tuple          # device affine batch


@dataclass
class OpenKey:
    """Verifier key: g, h, beta_h (host points).  Mirror of `UnivariateVerifierParam`."""
    curve: CurveSpec
    g: AffinePoint
    h: PR.G2Point
    beta_h: PR.G2Point


# ---------------------------------------------------------------------------
# setup
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0,))
def _fixed_base_msm(fq, table, scalars):
    """P_i = scalars_i * G via a 16*L-step scan over a doubling table of G.

    table: affine batch of G*2^j, j in [0, bits).  scalars: [Lr, n] normal.
    """
    Lr, n = scalars.shape
    bits = table[0].shape[1]
    acc = E.jac_infinity(fq, (n,))

    def body(acc, j):
        limb = scalars[j // 16]
        bit = ((limb >> (j % 16)) & 1) > 0
        tj = tuple(jax.lax.dynamic_index_in_dim(t, j, axis=t.ndim - 1, keepdims=False)
                   for t in table[:2]) + (table[2][j],)
        tj = (tj[0][:, None], tj[1][:, None], jnp.broadcast_to(tj[2], (1,)))
        tj = (jnp.broadcast_to(tj[0], acc[0].shape),
              jnp.broadcast_to(tj[1], acc[1].shape),
              jnp.broadcast_to(tj[2][0], (n,)))
        added = E.jac_madd(fq, acc, tj)
        return tuple(F.select(bit, a, b) for a, b in zip(added, acc)), None

    acc, _ = jax.lax.scan(body, acc, jnp.arange(bits, dtype=jnp.int32))
    return acc


def universal_setup_for_testing(curve: CurveSpec, max_degree: int, seed: int = 0) -> UniversalSrs:
    """Insecure test SRS from a seeded beta (mirror of
    `universal_setup_for_testing`, snark.rs:486-525; `test-srs` feature)."""
    import random
    rng = random.Random(seed)
    fr, fq = curve.fr, curve.fq
    beta = rng.randrange(1, fr.p)
    g = AffinePoint(*curve.g1_gen)
    h = PR.g2_generator(curve)
    beta_h = PR.g2_mul(curve, h, beta)

    n = max_degree + 1
    # host: powers of beta (normal form ints)
    pows = []
    cur = 1
    for _ in range(n):
        pows.append(cur)
        cur = cur * beta % fr.p
    # native C comb when available: robust at 2^20+ (the device scan
    # kernel faulted the TPU worker at [L, 2^20+3]) and ~15s at 2^20
    from ..utils import native as _nv
    host_pts = _nv.fixed_base_powers(fq.p, g, pows)
    if host_pts is not None:
        powers_aff = E.affine_to_device(fq, host_pts)
        return UniversalSrs(curve=curve, powers_of_g=powers_aff, h=h,
                            beta_h=beta_h)
    scalars = jnp.asarray(ints_to_limbs(pows, fr.num_limbs))

    # host: doubling table of g (bits entries)
    bits = fr.num_limbs * 16
    tbl = []
    cur_pt = g
    for _ in range(bits):
        tbl.append(cur_pt)
        cur_pt = ec_add(fq.p, cur_pt, cur_pt)
    table = E.affine_to_device(fq, tbl)

    acc = _fixed_base_msm(fq, table, scalars)
    powers_aff = E.jac_to_affine(fq, acc)
    return UniversalSrs(curve=curve, powers_of_g=powers_aff, h=h, beta_h=beta_h)


# ---------------------------------------------------------------------------
# commit / open / verify
# ---------------------------------------------------------------------------

def commit_batch(ck: CommitKey, polys: list) -> list:
    """Commit to k polynomials with ONE batched MSM and ONE device->host
    transfer (the per-transfer latency through the device link dominates
    small commits; see prover round structure).

    Polys may have different lengths; they share the SRS bases.
    """
    import os, sys, time
    trace = os.environ.get("MPC_JELLYFISH_TPU_TRACE", "") == "1"
    t0 = time.time()
    fq, fr = ck.curve.fq, ck.curve.fr
    nmax = max(c.shape[1] for c in polys)
    if nmax > ck.powers_of_g[0].shape[1]:
        raise ValueError("poly degree exceeds commit key")
    # pad every poly to the FULL commit-key length: all MSMs at a given
    # domain then share one compiled executable (shape stability trumps the
    # few extra zero scalars)
    nmax = ck.powers_of_g[0].shape[1]
    padded = []
    for c in polys:
        if c.shape[1] < nmax:
            c = jnp.concatenate(
                [c, F.zeros(fr, (nmax - c.shape[1],))], axis=1)
        padded.append(F.from_mont(fr, c))
    if trace:
        jax.block_until_ready(padded)
        print(f"      [commit] prep: {time.time()-t0:.2f}s", file=sys.stderr,
              flush=True)
        t0 = time.time()
    bases = tuple(t[..., :nmax] for t in ck.powers_of_g)
    res = M.msm_batch(fq, bases, padded)                  # jac [L, k]
    if trace:
        jax.block_until_ready(res)
        print(f"      [commit] msm: {time.time()-t0:.2f}s", file=sys.stderr,
              flush=True)
        t0 = time.time()
    aff = E.jac_to_affine(fq, res)
    out = E.affine_from_device(fq, aff)
    if trace:
        print(f"      [commit] affine+D2H: {time.time()-t0:.2f}s",
              file=sys.stderr, flush=True)
    return out


def commit_batch_stacked_dev(ck: CommitKey, scalars: jnp.ndarray):
    """Like commit_batch_stacked but the commitments STAY on device as an
    affine batch (x [L,k], y [L,k], inf [k]): the device-FS prover appends
    them to the device transcript and only fetches at end of prove."""
    fq = ck.curve.fq
    res = M.msm_batch(fq, ck.powers_of_g, scalars)
    return E.jac_to_affine(fq, res)


def commit_batch_stacked(ck: CommitKey, scalars: jnp.ndarray) -> list:
    """Batched commit over PRE-CONVERTED scalars [k, Lr, nck] (normal form,
    already padded to the commit-key length).  The prover's fused round
    kernels produce this layout directly so the from_mont/pad prep happens
    inside the round's single jit instead of as separate dispatches."""
    fq = ck.curve.fq
    res = M.msm_batch(fq, ck.powers_of_g, scalars)
    return E.affine_from_device(fq, E.jac_to_affine(fq, res))


def commit(ck: CommitKey, coeffs_mont: jnp.ndarray) -> AffinePoint:
    """Commit to one polynomial (reference univariate_kzg/mod.rs:108-112)."""
    return commit_batch(ck, [coeffs_mont])[0]


def batch_commit(ck: CommitKey, polys: list) -> list:
    return commit_batch(ck, polys)


def open_at(ck: CommitKey, coeffs_mont: jnp.ndarray, z: int):
    """Open poly at point z: returns (proof commitment, evaluation int).

    witness = (p(X) - p(z)) / (X - z); proof = commit(witness)
    (reference univariate_kzg/mod.rs:135-166).
    """
    fr = ck.curve.fr
    zd = fr.to_device([z])[:, 0]
    q, r = P.divide_by_linear(fr, coeffs_mont, zd)
    proof = commit(ck, q)
    value = fr.from_device(r.reshape(fr.num_limbs, 1))[0]
    return proof, value


def verify_open(vk: OpenKey, comm: AffinePoint, z: int, value: int,
                proof: AffinePoint) -> bool:
    """Check p(z) = value:  e(W, beta_h) == e(W*z + C - value*g, h)
    i.e. e(W, beta_h) * e(-(W*z + C - value*g), h) == 1."""
    curve = vk.curve
    p = curve.fq.p
    b = ec_add(p, ec_mul(p, proof, z % curve.fr.p), comm)
    b = ec_add(p, b, ec_neg(p, ec_mul(p, vk.g, value % curve.fr.p)))
    return PR.pairing_check(curve, [proof, ec_neg(p, b)], [vk.beta_h, vk.h])


# ---------------------------------------------------------------------------
# batch open / batch verify (reference univariate_kzg/mod.rs:180-270)
# ---------------------------------------------------------------------------

def batch_open(ck: CommitKey, polys: list, points: list):
    """Open poly_i at point_i: one batched quotient-commit MSM.

    Mirror of `UnivariateKzgPCS::batch_open` (univariate_kzg/mod.rs:180-213).
    Returns (proofs: [AffinePoint], evals: [int])."""
    fr = ck.curve.fr
    if len(polys) != len(points):
        raise ValueError("polys/points length mismatch")
    quotients, evals = [], []
    for coeffs, z in zip(polys, points):
        zd = fr.to_device([z % fr.p])[:, 0]
        q, r = P.divide_by_linear(fr, coeffs, zd)
        quotients.append(q)
        evals.append(fr.from_device(r.reshape(fr.num_limbs, 1))[0])
    proofs = commit_batch(ck, quotients)
    return proofs, evals


def batch_verify(vk: OpenKey, comms: list, points: list, values: list,
                 proofs: list, rng) -> bool:
    """Random-combiner aggregation into ONE 2-pairing check
    (univariate_kzg/mod.rs:223-270): with 128-bit randomizers r_i,
    e(sum r_i(W_i z_i + C_i - v_i g), h) == e(sum r_i W_i, beta_h)."""
    from ..utils.ec_host import ec_msm_fast
    curve = vk.curve
    p, r_mod = curve.fq.p, curve.fr.p
    c_pts, c_scs = [], []
    w_pts, w_scs = [], []
    g_mult = 0
    randomizer = 1
    for comm, z, v, w in zip(comms, points, values, proofs):
        c_pts += [w, comm]
        c_scs += [randomizer * z % r_mod, randomizer]
        w_pts.append(w)
        w_scs.append(randomizer)
        g_mult = (g_mult + randomizer * v) % r_mod
        randomizer = rng.getrandbits(128)
    c_pts.append(vk.g)
    c_scs.append((-g_mult) % r_mod)
    total_c = ec_msm_fast(p, c_pts, c_scs, order=r_mod)
    total_w = ec_msm_fast(p, w_pts, w_scs, order=r_mod)
    return PR.pairing_check(curve, [ec_neg(p, total_w), total_c],
                            [vk.beta_h, vk.h])


# ---------------------------------------------------------------------------
# FK23 amortized multi-open at roots of unity
# (reference pcs/mod.rs:228-309, univariate_kzg/mod.rs:296-376)
# ---------------------------------------------------------------------------

def checked_fft_size(degree: int) -> int:
    """pcs/mod.rs:310-330."""
    if degree & (degree - 1) == 0 and degree > 0:
        return degree * 2
    return 1 << (degree - 1).bit_length()


def multi_open_rou_eval_domain(curve: CurveSpec, degree: int,
                               num_points: int):
    """pcs/mod.rs:259-276 (Radix2 domains round up to a power of two)."""
    from ..ops.ntt import Domain
    size = max(checked_fft_size(degree) + 1, num_points)
    n = 1 << (size - 1).bit_length()
    return Domain(curve.fr, n)


def _compute_h_poly_fk23(ck: CommitKey, coeffs_mont: jnp.ndarray):
    """FK23 Sec 2.2 (univariate_kzg/mod.rs:336-376): h = Toeplitz(coeffs) @
    reversed SRS powers.  Returns a jacobian G1 vector [L, padded_degree]."""
    from ..ops import group_ntt as GN
    fq, fr = ck.curve.fq, ck.curve.fr
    coeffs = fr.from_device(coeffs_mont)
    d = len(coeffs) - 1
    padded_degree = 1 if d <= 1 else 1 << (d - 1).bit_length()
    coeffs = coeffs + [0] * (padded_degree + 1 - len(coeffs))
    toep_col = [coeffs[-1]] + [0] * (padded_degree - 1)
    toep_row = list(reversed(coeffs[1:]))
    x, y, inf = ck.powers_of_g
    srs = (x[..., :padded_degree], y[..., :padded_degree])
    srs = tuple(jnp.flip(t, axis=-1) for t in srs)
    one = F.ones(fq, (padded_degree,))
    srs_jac = (srs[0], srs[1], one)        # SRS points are never infinity
    return GN.toeplitz_group_mul(fq, fr, toep_col, toep_row, srs_jac)


def multi_open_rou(ck: CommitKey, coeffs_mont: jnp.ndarray, num_points: int,
                   domain) -> tuple:
    """Open one poly at the first `num_points` roots of unity of `domain`
    with O(n log n) group ops (pcs/mod.rs:279-300).

    Returns (proofs: [AffinePoint], evals: [int])."""
    from ..ops import group_ntt as GN
    from ..ops import ntt as N
    fq, fr = ck.curve.fq, ck.curve.fr
    h = _compute_h_poly_fk23(ck, coeffs_mont)
    m = h[0].shape[-1]
    if m < domain.n:
        pad = E.jac_infinity(fq, (domain.n - m,))
        h = tuple(jnp.concatenate([t, pd], axis=-1) for t, pd in zip(h, pad))
    proofs_jac = GN.group_ntt(fq, fr, domain, h)
    proofs_jac = tuple(t[..., :num_points] for t in proofs_jac)
    proofs = E.affine_from_device(fq, E.jac_to_affine(fq, proofs_jac))
    n = coeffs_mont.shape[-1]
    padded = coeffs_mont
    if n < domain.n:
        padded = jnp.concatenate(
            [coeffs_mont, F.zeros(fr, (domain.n - n,))], axis=-1)
    evals = fr.from_device(N.ntt(domain, padded))[:num_points]
    return proofs, evals
