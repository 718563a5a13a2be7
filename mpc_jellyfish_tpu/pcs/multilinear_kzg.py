"""Multilinear KZG polynomial commitment (PST13 style).

Mirror of `primitives/src/pcs/multilinear_kzg/mod.rs:49-420` and
`srs.rs:21-340`: commit to a dense multilinear extension given by its
evaluations over the boolean hypercube (x_0 = LSB of the index), open at a
point by per-variable folding (q = f[1,b] - f[0,b]; r = f[0,b] + q * p_i)
with one G1 MSM per round, verify with an (nv+1)-way pairing product
  e(g*value - C, h) * prod_i e(proof_i, h*t_i - h*p_i) == 1.

TPU mapping: evaluations live as [L, 2^nv] Montgomery limb tensors; the
fold is a reshape + one F.sub/F.mul per variable fused into a single jit,
and the per-round MSMs run as one batched device MSM per size class.
Verification is host-side (native C multi-pairing when available).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..curves import CurveSpec
from ..ops import ec as E
from ..ops import field as F
from ..ops import msm as M
from ..utils.ec_host import AffinePoint, ec_add, ec_mul, ec_neg
from .. import pairing as PR


class PCSError(ValueError):
    pass


@dataclass
class MultilinearProverParam:
    """powers_of_g[i] = {g * eq(b, t[i..nv])}_{b in {0,1}^(nv-i)} as device
    affine batches (srs.rs:37-50)."""
    curve: CurveSpec
    num_vars: int
    g: AffinePoint
    h: object                   # G2Point
    powers_of_g: list           # nv+1 device affine tuples, sizes 2^nv .. 1


@dataclass
class MultilinearVerifierParam:
    """srs.rs:52-64."""
    curve: CurveSpec
    num_vars: int
    g: AffinePoint
    h: object                   # G2Point
    h_mask: list                # nv G2Points: h * t_i


@dataclass
class MultilinearUniversalParams:
    prover_param: MultilinearProverParam
    h_mask: list

    @property
    def num_vars(self) -> int:
        return self.prover_param.num_vars

    def trim(self, supported_num_vars: int):
        """srs.rs:94-119."""
        pp = self.prover_param
        if supported_num_vars > pp.num_vars:
            raise PCSError("SRS does not support target number of vars")
        cut = pp.num_vars - supported_num_vars
        ck = MultilinearProverParam(
            curve=pp.curve, num_vars=supported_num_vars, g=pp.g, h=pp.h,
            powers_of_g=pp.powers_of_g[cut:])
        vk = MultilinearVerifierParam(
            curve=pp.curve, num_vars=supported_num_vars, g=pp.g, h=pp.h,
            h_mask=self.h_mask[cut:])
        return ck, vk


@dataclass
class MultilinearKzgProof:
    """mod.rs:57-61."""
    proofs: list                # nv AffinePoints


def eq_eval(x, y, r: int) -> int:
    """eq(x, y) = prod (x_i y_i + (1-x_i)(1-y_i)) mod r (pcs util)."""
    acc = 1
    for xi, yi in zip(x, y):
        acc = acc * ((xi * yi + (1 - xi) * (1 - yi)) % r) % r
    return acc


def gen_srs_for_testing(curve: CurveSpec, num_vars: int,
                        seed: int = 0) -> MultilinearUniversalParams:
    """Insecure test SRS from a seeded t vector (srs.rs:258-340).

    powers_of_g[i][b] = g * prod_j eq1(bit_j(b), t[i+j]) with t[i] on the
    LSB, built as an iterated [1-t, t] outer product then one fixed-base MSM.
    """
    import random
    rng = random.Random(seed)
    fr, fq = curve.fr, curve.fq
    r = fr.p
    if num_vars == 0:
        raise PCSError("constant polynomial not supported")
    t = [rng.randrange(1, r) for _ in range(num_vars)]
    g = AffinePoint(*curve.g1_gen)
    h = PR.g2_generator(curve)

    # eq tables, table_i has size 2^(nv-i); T_i[b] = T_{i+1}[b >> 1] * eq1(b&1, t[i])
    tables = [None] * num_vars
    cur = [1]
    for i in reversed(range(num_vars)):
        nxt = []
        for v in cur:                       # new index 2*b' + bit_i: t[i] = LSB
            nxt.append(v * (1 - t[i]) % r)      # bit 0
            nxt.append(v * t[i] % r)            # bit 1
        cur = nxt
        tables[i] = cur

    flat = [s for tbl in tables for s in tbl] + [1]
    from ..utils.bigint import ints_to_limbs
    from .kzg import _fixed_base_msm
    scalars = jnp.asarray(ints_to_limbs(flat, fr.num_limbs))
    bits = fr.num_limbs * 16
    tbl, cur_pt = [], g
    for _ in range(bits):
        tbl.append(cur_pt)
        cur_pt = ec_add(fq.p, cur_pt, cur_pt)
    table = E.affine_to_device(fq, tbl)
    acc = E.jac_to_affine(fq, _fixed_base_msm(fq, table, scalars))

    powers_of_g = []
    start = 0
    for i in range(num_vars):
        size = 1 << (num_vars - i)
        powers_of_g.append(tuple(a[..., start:start + size] for a in acc[:2])
                           + (acc[2][start:start + size],))
        start += size
    powers_of_g.append(tuple(a[..., start:start + 1] for a in acc[:2])
                       + (acc[2][start:start + 1],))

    pp = MultilinearProverParam(curve=curve, num_vars=num_vars, g=g, h=h,
                                powers_of_g=powers_of_g)
    h_mask = [PR.g2_mul(curve, h, ti) for ti in t]
    return MultilinearUniversalParams(prover_param=pp, h_mask=h_mask)


def _poly_num_vars(evals: jnp.ndarray) -> int:
    n = evals.shape[-1]
    nv = n.bit_length() - 1
    if (1 << nv) != n:
        raise PCSError("evaluation vector must have power-of-two length")
    return nv


def commit(pp: MultilinearProverParam, evals_mont: jnp.ndarray) -> AffinePoint:
    """MSM of the 2^nv evaluations against powers_of_g[ignored]
    (mod.rs:124-148)."""
    fq, fr = pp.curve.fq, pp.curve.fr
    nv = _poly_num_vars(evals_mont)
    if nv > pp.num_vars:
        raise PCSError("poly num_vars exceeds param limit")
    ignored = pp.num_vars - nv
    sc = F.from_mont(fr, evals_mont)[None]
    res = M.msm_batch(fq, pp.powers_of_g[ignored], sc)
    return E.affine_from_device(fq, E.jac_to_affine(fq, res))[0]


def batch_commit(pp: MultilinearProverParam, polys: list) -> list:
    """mod.rs:150-175."""
    return [commit(pp, p) for p in polys]


def open_at(pp: MultilinearProverParam, evals_mont: jnp.ndarray, point: list):
    """Per-variable fold + MSM (open_internal, mod.rs:285-351).

    Returns (MultilinearKzgProof, evaluation int).
    """
    fr, fq = pp.curve.fr, pp.curve.fq
    nv = _poly_num_vars(evals_mont)
    if nv > pp.num_vars:
        raise PCSError("poly num_vars exceeds param limit")
    if len(point) != nv:
        raise PCSError("point length mismatch")
    ignored = pp.num_vars - nv + 1
    spec = fr
    L = spec.num_limbs
    pt_dev = spec.to_device(list(point))          # [L, nv]

    f = evals_mont
    proofs = []
    for i in range(nv):
        k = nv - 1 - i
        ff = f.reshape(L, 1 << k, 2)
        q = F.sub(spec, ff[..., 1], ff[..., 0])      # [L, 2^k]
        f = F.add(spec, ff[..., 0],
                  F.mul(spec, q, pt_dev[:, i:i + 1]))
        sc = F.from_mont(spec, q)[None]
        res = M.msm_batch(fq, pp.powers_of_g[ignored + i], sc)
        proofs.append(E.affine_from_device(fq, E.jac_to_affine(fq, res))[0])
    eval_int = spec.from_device(f.reshape(L, 1))[0]
    return MultilinearKzgProof(proofs=proofs), eval_int


def verify(vp: MultilinearVerifierParam, comm: AffinePoint, point: list,
           value: int, proof: MultilinearKzgProof) -> bool:
    """(nv+1)-way pairing product (verify_internal, mod.rs:358-410)."""
    curve = vp.curve
    p, r = curve.fq.p, curve.fr.p
    nv = len(point)
    if nv > vp.num_vars:
        raise PCSError("point length exceeds param limit")
    ignored = vp.num_vars - nv
    g1s, g2s = [], []
    for i in range(nv):
        # h_mask[ignored+i] - h * point_i
        h_term = PR.g2_add(curve, vp.h_mask[ignored + i],
                           PR.g2_neg(curve, PR.g2_mul(curve, vp.h,
                                                      point[i] % r)))
        g1s.append(proof.proofs[i])
        g2s.append(h_term)
    # g * value - C
    last = ec_add(p, ec_mul(p, vp.g, value % r), ec_neg(p, comm))
    g1s.append(last)
    g2s.append(vp.h)
    return PR.pairing_check(curve, g1s, g2s)


# ---------------------------------------------------------------------------
# batch open / verify via q(x) = w(l(x))  (batching.rs:57-270, util.rs)
# ---------------------------------------------------------------------------

@dataclass
class MultilinearKzgBatchProof:
    """mod.rs:64-74."""
    proof: MultilinearKzgProof        # opening of the merged MLE at l(r)
    q_x_commit: AffinePoint           # univariate commitment to q(x)
    q_x_opens: list                   # k+1 AffinePoints (omega^i .. , r)


def _host_intt(r: int, vals: list, w: int) -> list:
    """Exact host inverse NTT over F_r (domain generated by w, |vals| = k)."""
    k = len(vals)
    w_inv = pow(w, -1, r)
    k_inv = pow(k, -1, r)
    return [sum(v * pow(w_inv, i * j, r) for j, v in enumerate(vals))
            * k_inv % r for i in range(k)]


def _poly_eval_host(r: int, coeffs: list, x: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % r
    return acc


def _mle_eval_host(r: int, evals: list, point: list) -> int:
    f = list(evals)
    for p_i in point:
        f = [(f[2 * b] + (f[2 * b + 1] - f[2 * b]) * p_i) % r
             for b in range(len(f) // 2)]
    return f[0]


def _build_l(curve: CurveSpec, num_var: int, points: list, dom) -> list:
    """Univariate polys through the points + index-bit prefix polys
    (util.rs:244-270): returns [l_0..l_{nv-1}, pre_0..pre_{P-1}] with
    l_j(w^i) = points[i][j] and pre_t(w^i) = bit t of i."""
    r = curve.fr.p
    k = dom.n
    prefix_len = max(1, (len(points) - 1).bit_length()) \
        if len(points) > 1 else 0
    out = []
    for j in range(num_var):
        vals = [pt[j] for pt in points] + [0] * (k - len(points))
        out.append(_host_intt(r, vals, dom.w))
    for t in range(prefix_len):
        vals = [(i >> t) & 1 for i in range(len(points))] + \
            [0] * (k - len(points))
        out.append(_host_intt(r, vals, dom.w))
    return out


def merge_polynomials(curve: CurveSpec, evals_list: list):
    """Concatenate MLE evaluation vectors, zero-padded to the next
    power-of-two variable count (util.rs:227-241).  Host ints."""
    nv = (len(evals_list[0])).bit_length() - 1
    for e in evals_list:
        if len(e) != 1 << nv:
            raise PCSError("num_vars do not match for polynomials")
    merged_nv = nv + max(1, (len(evals_list) - 1).bit_length()) \
        if len(evals_list) > 1 else nv
    scalars = [v for e in evals_list for v in e]
    scalars += [0] * ((1 << merged_nv) - len(scalars))
    return merged_nv, scalars


def _batch_transcript_r(curve: CurveSpec, batch_comm: AffinePoint,
                        points: list, q_commit: AffinePoint) -> int:
    """Challenge r from a keccak transcript over (w-comm, points, q-comm).
    (The reference uses its IOPTranscript; this derivation is the
    framework-native equivalent -- self-consistent prover/verifier.)"""
    from ..utils.keccak import keccak256
    from ..utils import serialize as S
    st = b"ml kzg"
    st = keccak256(st + S.g1_to_bytes(curve, batch_comm))
    for pt in points:
        for v in pt:
            st = keccak256(st + S.field_to_bytes(curve.fr, v))
    st = keccak256(st + S.g1_to_bytes(curve, q_commit))
    return int.from_bytes(st, "big") % curve.fr.p


def batch_open(uni_ck, ml_pp: MultilinearProverParam, evals_list: list,
               batch_comm: AffinePoint, points: list):
    """Open k MLEs at k points through the merged polynomial
    (batching.rs:57-160).  evals_list: host evaluation vectors.

    Returns (MultilinearKzgBatchProof, q_x_evals)."""
    from .kzg import commit as uni_commit, open_at as uni_open
    from ..ops.ntt import Domain
    curve = ml_pp.curve
    r_mod = curve.fr.p
    if not points or len(points) != len(evals_list):
        raise PCSError("polynomial/point length mismatch")
    num_var = (len(evals_list[0])).bit_length() - 1
    for pt in points:
        if len(pt) != num_var:
            raise PCSError("points do not have same num_vars")

    k = 1 << max(1, (len(points) - 1).bit_length())
    dom = Domain(curve.fr, k)
    uni_polys = _build_l(curve, num_var, points, dom)
    merged_nv, merged = merge_polynomials(curve, evals_list)

    # q(x) = w(l(x)) by evaluation on a large-enough domain + interpolation
    uni_degree = (len(uni_polys) + 2) * k
    qdom = Domain(curve.fr, 1 << (uni_degree - 1).bit_length())
    q_evals = []
    for i in range(qdom.n):
        x = pow(qdom.w, i, r_mod)
        pt = [_poly_eval_host(r_mod, lp, x) for lp in uni_polys]
        q_evals.append(_mle_eval_host(r_mod, merged, pt))
    q_coeffs = _host_intt(r_mod, q_evals, qdom.w)
    q_dev = curve.fr.to_device(q_coeffs)

    q_commit = uni_commit(uni_ck, q_dev)
    r = _batch_transcript_r(curve, batch_comm, points, q_commit)

    q_x_opens, q_x_evals = [], []
    for i in range(len(points)):
        opn, ev = uni_open(uni_ck, q_dev, pow(dom.w, i, r_mod))
        q_x_opens.append(opn)
        q_x_evals.append(ev)
    opn, q_r = uni_open(uni_ck, q_dev, r)
    q_x_opens.append(opn)
    q_x_evals.append(q_r)

    # p := l(r), open the merged MLE there
    p_point = [_poly_eval_host(r_mod, lp, r) for lp in uni_polys]
    merged_dev = curve.fr.to_device(merged)
    mle_proof, mle_eval = open_at(ml_pp, merged_dev, p_point)
    if mle_eval != q_r:
        raise PCSError("q(r) does not match w(l(r))")
    return MultilinearKzgBatchProof(proof=mle_proof, q_x_commit=q_commit,
                                    q_x_opens=q_x_opens), q_x_evals


def batch_verify(uni_vk, ml_vk: MultilinearVerifierParam,
                 batch_comm: AffinePoint, points: list, values: list,
                 proof: MultilinearKzgBatchProof) -> bool:
    """batching.rs:172-270."""
    from .kzg import verify_open as uni_verify
    from ..ops.ntt import Domain
    curve = ml_vk.curve
    r_mod = curve.fr.p
    if len(values) != len(points) + 1:
        return False
    num_var = len(points[0])
    k = 1 << max(1, (len(points) - 1).bit_length())
    dom = Domain(curve.fr, k)
    r = _batch_transcript_r(curve, batch_comm, points, proof.q_x_commit)

    # univariate openings of q at omega^i and r
    for i in range(len(points)):
        if not uni_verify(uni_vk, proof.q_x_commit, pow(dom.w, i, r_mod),
                          values[i], proof.q_x_opens[i]):
            return False
    if not uni_verify(uni_vk, proof.q_x_commit, r, values[-1],
                      proof.q_x_opens[-1]):
        return False

    # p := l(r); multilinear check of the merged commitment at p
    uni_polys = _build_l(curve, num_var, points, dom)
    p_point = [_poly_eval_host(r_mod, lp, r) for lp in uni_polys]
    return verify(ml_vk, batch_comm, p_point, values[-1], proof.proof)
