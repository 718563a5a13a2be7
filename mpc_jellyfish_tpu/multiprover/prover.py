"""Collaborative (MPC) TurboPlonk prover.

Mirror of `plonk/src/multiprover/proof_system/` (SURVEY.md §2.5, §3.4):
the witness is additively secret-shared between 2 parties; every linear
operation (iNTT, coset FFT, polynomial division by a public linear factor,
linearization with public coefficients) is share-local; witness products in
the grand-product and quotient rounds consume Beaver triples; commitments
are per-party MSMs whose point shares are opened before transcript
absorption (`MultiproverKZG::commit`, multiprover_kzg.rs:126-142).

TurboPlonk only, as in the reference (snark.rs:104-106: no Plookup in MPC).
The produced proof is verified by the standard single-prover verifier -
that equivalence is the correctness oracle (SURVEY.md §4).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import field as F
from ..ops import ntt as N
from ..ops import poly as P
from ..ops import msm as M
from ..ops import ec as E
from ..pcs import kzg
from ..plonk.prover import Prover, upload
from ..plonk.structs import Challenges, ProofEvaluations
from .fabric import MockFabric, Shared, N_PARTIES

import functools
import jax


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _quot_fused_jit(spec, W, size_ratio, ws, wm, zs, zm, sel, sig, pi_fft,
                    consts, x_coset, zh_inv, inv_nx1, trip6, alpha_r):
    """TurboPlonk quotient-round gate + copy DAG over 2-party shares, fully
    traced (the in-process fabric's openings are party-axis sums, so every
    Beaver product is a pure tensor op).  Mirrors the unfused composition
    in MpcProver.quotient_round op for op — same triple order, same
    party-0 public bumps — so proofs are bit-identical."""
    def pub(v):                        # public [L, m] / [L, 1] -> party bcast
        return v[:, None]

    idx = [0]

    def bmul(pairs):
        outs = []
        for (xs_, xm_), (ys_, ym_) in pairs:
            i = idx[0]
            idx[0] += 1
            ash, amc, bsh, bmc, csh, cmc = trip6[i]
            ds = F.sub(spec, xs_, ash)
            es = F.sub(spec, ys_, bsh)
            d = F.sum_reduce(spec, ds, axis=1)          # open (unchecked)
            e = F.sum_reduce(spec, es, axis=1)
            de = F.mul(spec, d, e)
            zs_ = F.add(spec, csh, F.add(spec, F.mul(spec, bsh, pub(d)),
                                         F.mul(spec, ash, pub(e))))
            bump = jnp.concatenate(
                [de[:, None], jnp.zeros_like(de)[:, None]], axis=1)
            zs_ = F.add(spec, zs_, bump)
            zm_ = F.add(spec, cmc, F.add(spec, F.mul(spec, bmc, pub(d)),
                                         F.mul(spec, amc, pub(e))))
            zm_ = F.add(spec, zm_, F.mul(spec, alpha_r, de[:, None]))
            outs.append((zs_, zm_))
        return outs

    def mulp(x, v):
        return (F.mul(spec, x[0], pub(v)), F.mul(spec, x[1], pub(v)))

    def addsh(x, y):
        return (F.add(spec, x[0], y[0]), F.add(spec, x[1], y[1]))

    def subsh(x, y):
        return (F.sub(spec, x[0], y[0]), F.sub(spec, x[1], y[1]))

    def addp(x, v):
        bump = jnp.concatenate([v[:, None], jnp.zeros_like(v)[:, None]],
                               axis=1)
        return (F.add(spec, x[0], bump),
                F.add(spec, x[1], F.mul(spec, alpha_r, v[:, None])))

    w = list(zip(ws, wm))
    z = (zs, zm)
    alpha = consts[:, 0:1]
    beta = consts[:, 1:2]
    gamma = consts[:, 2:3]
    alpha2 = consts[:, 3:4]
    ks = [consts[:, 4 + j:5 + j] for j in range(W)]

    q_lc = [sel[:, j] for j in range(4)]
    q_mul = [sel[:, 4], sel[:, 5]]
    q_hash = [sel[:, 6 + j] for j in range(4)]
    q_o, q_c, q_ecc = sel[:, 10], sel[:, 11], sel[:, 12]

    t_circ = mulp(w[0], q_lc[0])
    for j in range(1, 4):
        t_circ = addsh(t_circ, mulp(w[j], q_lc[j]))
    lvl1 = bmul([(w[0], w[1]), (w[2], w[3])]
                + [(w[j], w[j]) for j in range(4)])
    w01, w23, w2s = lvl1[0], lvl1[1], lvl1[2:]
    t_circ = addsh(t_circ, mulp(w01, q_mul[0]))
    t_circ = addsh(t_circ, mulp(w23, q_mul[1]))
    lvl2 = bmul([(w01, w23)] + [(w2, w2) for w2 in w2s])
    w0123, w4s = lvl2[0], lvl2[1:]
    lvl3 = bmul([(w0123, w[4])]
                + [(w4s[j], w[j]) for j in range(4)])
    prod_w, w5s = lvl3[0], lvl3[1:]
    t_circ = addsh(t_circ, mulp(prod_w, q_ecc))
    for j in range(4):
        t_circ = addsh(t_circ, mulp(w5s[j], q_hash[j]))
    t_circ = subsh(t_circ, mulp(w[4], q_o))
    t_circ = addp(t_circ, F.add(spec, q_c, pi_fft))

    z_next = (jnp.roll(zs, -size_ratio, axis=-1),
              jnp.roll(zm, -size_ratio, axis=-1))
    term1 = mulp(z, alpha)
    term2 = mulp(z_next, alpha)
    for j in range(W):
        aj_pub = F.add(spec, gamma, F.mul(
            spec, F.mul(spec, beta, ks[j]), x_coset))
        bj_pub = F.add(spec, gamma, F.mul(spec, beta, sig[:, j]))
        aj = addp(w[j], aj_pub)
        bj = addp(w[j], bj_pub)
        term1, term2 = bmul([(term1, aj), (term2, bj)])
    t_perm_1 = subsh(term1, term2)

    one = F.ones(spec, (1,))
    zm1 = addp(z, F.neg(spec, one))
    t_perm_2 = mulp(mulp(zm1, inv_nx1), alpha2)

    t1 = addsh(t_circ, t_perm_1)
    quot = addsh(mulp(t1, zh_inv), t_perm_2)
    return quot

GATE_WIDTH = 4


def _local_msm(fabric, ck, sh: Shared):
    """This party's MSM accumulator over its share scalars (Jacobian)."""
    spec = fabric.spec
    fq = ck.curve.fq
    n = sh.share.shape[-1]
    bases = tuple(t[..., :n] for t in ck.powers_of_g)
    acc = None
    for party in range(sh.share.shape[1]):
        scalars = F.from_mont(spec, sh.share[:, party])
        pt = M.msm(fq, bases, scalars)
        acc = pt if acc is None else E.jac_add(fq, acc, pt)
    return acc


def commit_shared_batch(fabric, ck, shs: list) -> list:
    """Authenticated MSMs for a ROUND of polynomials: per-party local MSMs,
    all point shares opened in ONE communication round
    (multiprover_kzg.rs:126-142 + ark-mpc executor batching)."""
    fq = ck.curve.fq
    accs = [_local_msm(fabric, ck, sh) for sh in shs]
    opened = fabric.open_point_batch(fq, accs)
    return [E.affine_from_device(
        fq, E.jac_to_affine(fq, tuple(t[:, None] for t in o)))[0]
        for o in opened]


def commit_shared(fabric, ck, sh: Shared):
    """Single authenticated MSM (one-element batch)."""
    return commit_shared_batch(fabric, ck, [sh])[0]


class MpcProver:
    """Drives the shared-witness rounds on top of the plaintext `Prover`
    (which supplies domains, cached coset constants and public-poly FFTs)."""

    def __init__(self, fabric: MockFabric, spec, domain_size: int,
                 num_wire_types: int):
        self.fabric = fabric
        self.spec = spec
        self.base = Prover(spec, domain_size, num_wire_types)
        self.n = domain_size
        self.num_wire_types = num_wire_types

    # -- shared-poly helpers ----------------------------------------------
    def intt_shared(self, sh: Shared) -> Shared:
        return self.fabric.map_local_b(
            lambda x: N.intt(self.base.domain, x), sh)

    def coset_fft_shared(self, sh: Shared) -> Shared:
        base = self.base
        spec = self.spec

        def fft_b(x):                       # [L, B, n] batched coset FFT
            cur = x.shape[-1]
            if cur < base.m:
                x = jnp.concatenate(
                    [x, F.zeros(spec, x.shape[1:-1] + (base.m - cur,))],
                    axis=-1)
            return base.be.coset_ntt(base.quot_domain, x, base.coset)
        return self.fabric.map_local_b(fft_b, sh)

    def pad_shared(self, sh: Shared, out_len: int) -> Shared:
        spec = self.spec

        def pad(x):
            k = out_len - x.shape[-1]
            if k <= 0:
                return x
            return jnp.concatenate([x, F.zeros(spec, x.shape[1:-1] + (k,))],
                                   axis=-1)
        return self.fabric.map_local_b(pad, sh)

    def mask_shared(self, sh: Shared, hiding_bound: int, out_len: int) -> Shared:
        """Add Z_H * (shared random poly) - the mask is itself shared so
        neither party learns it (prover.rs:463 masking, MPC flavor)."""
        fab = self.fabric
        spec = self.spec
        sh = self.pad_shared(sh, out_len)
        rand = fab.random_shared_scalars(hiding_bound + 1)

        def expand(x):
            return P.mul_by_vanishing(spec, x, self.n)[:, :out_len]

        masked = fab.map_local(expand, rand)
        # pad masked to out_len (mul_by_vanishing yields n+hiding+1 len)
        masked = self.pad_shared(masked, out_len)
        return fab.add(sh, masked)

    def commit_shared(self, ck, sh: Shared):
        return commit_shared(self.fabric, ck, sh)

    def eval_shared(self, sh: Shared, z_dev) -> Shared:
        """Share-local polynomial evaluation at a public point."""
        return self.fabric.map_local_b(
            lambda x: P.eval_at(self.spec, x, z_dev)[..., None], sh)

    # -- rounds ------------------------------------------------------------
    def wire_polys_round(self, ck, wire_shares, mask: bool):
        """Round 1: shared iNTT + shared masking + authenticated commits."""
        out_len = self.n + 3
        polys = []
        for w in wire_shares:
            coeffs = self.intt_shared(w)
            if mask:
                coeffs = self.mask_shared(coeffs, 1, out_len)
            else:
                coeffs = self.pad_shared(coeffs, out_len)
            polys.append(coeffs)
        comms = commit_shared_batch(self.fabric, ck, polys)  # ONE round
        return comms, polys

    def grand_product_round(self, ck, wire_shares, id_evals, sigma_evals,
                            beta: int, gamma: int, mask: bool):
        """Round 2 over shares (constraint_system.rs:881-930 MPC analog)."""
        fab = self.fabric
        spec = self.spec
        bg = upload(spec, [beta, gamma])
        beta_d, gamma_d = bg[:, :1], bg[:, 1:2]

        num = None
        den = None
        for w, idp, sg in zip(wire_shares, id_evals, sigma_evals):
            t = fab.add_public(w, gamma_d)
            a = fab.add_public(t, F.mul(spec, beta_d, idp))
            b = fab.add_public(t, F.mul(spec, beta_d, sg))
            if num is None:
                num, den = a, b
            else:                                           # one Beaver round
                num, den = fab.mul_batch([(num, a), (den, b)])
        ratio = fab.mul(num, fab.inv(den))                  # masked inversion
        prod = fab.cumprod(ratio)
        one = fab.one_authenticated()
        z_share = jnp.concatenate([one.share, prod.share[:, :, :self.n - 1]],
                                  axis=2)
        z_mac = jnp.concatenate([one.mac, prod.mac[:, :, :self.n - 1]], axis=2)
        z = Shared(z_share, z_mac)
        coeffs = self.intt_shared(z)
        if mask:
            coeffs = self.mask_shared(coeffs, 2, self.n + 3)
        else:
            coeffs = self.pad_shared(coeffs, self.n + 3)
        comm = self.commit_shared(ck, coeffs)
        return comm, coeffs

    def _quotient_core_fused(self, pk, consts_dev, w_fft, z_fft, pi_fft,
                             sel_fft, sigma_fft):
        """Whole gate-equation + copy-constraint DAG as ONE jitted program
        (mock fabric only): Beaver maskings, the party-sum openings and the
        z = c + db + ea + de reconstructions are pure tensor ops in the
        in-process fabric, so the entire round traces into a single XLA
        executable — the ark-mpc lazy-graph equivalent (SURVEY §2.7;
        the reference consumes the graph at prover.rs:330-419).  The
        eager composition dispatched ~2000 primitives per prove
        (prof_collab2.log).  Triples are drawn host-side in exactly the
        order the unfused path draws them, so preloaded pools and proof
        bytes are unchanged."""
        fab = self.fabric
        spec = self.spec
        base = self.base
        m = base.m
        # 26 triples, [L, 2, m] each, in the unfused consumption order:
        # lvl1 (6), lvl2 (5), lvl3 (5), copy rounds j=0..4 (2 each)
        trips = []
        for _ in range(6 + 5 + 5 + 2 * self.num_wire_types):
            a, b, c = fab._beaver_triples((m,))
            trips.append(tuple(
                t.reshape((spec.num_limbs, 2, m)) for t in
                (a.share, a.mac, b.share, b.mac, c.share, c.mac)))
        fab.n_openings += 3 + self.num_wire_types   # one per Beaver round
        ws = tuple(w.share for w in w_fft)
        wm = tuple(w.mac for w in w_fft)
        qs, qm = _quot_fused_jit(
            spec, self.num_wire_types, base.size_ratio, ws, wm,
            z_fft.share, z_fft.mac, sel_fft, sigma_fft, pi_fft, consts_dev,
            base.coset_elements, base.zh_inv_coset, base.inv_n_x_minus_1,
            tuple(trips), fab._alpha_shares.reshape(spec.num_limbs, 2, 1))
        return Shared(qs, qm)

    def quotient_round(self, ck, pk, challenges: Challenges, wire_polys,
                       z_poly, pi_poly_pub, mask: bool, rng):
        """Round 3: plaintext coset FFT of selectors/sigmas; SHARED coset FFT
        of wires/z; batched Beaver products for the gate/copy terms
        (multiprover prover.rs:330-419)."""
        fab = self.fabric
        spec = self.spec
        base = self.base
        p = spec.p
        ch = challenges
        W = self.num_wire_types

        consts = upload(spec, [ch.alpha, ch.beta, ch.gamma,
                               ch.alpha * ch.alpha % p] + list(pk.vk.k))
        alpha = consts[:, 0:1]
        beta = consts[:, 1:2]
        gamma = consts[:, 2:3]
        alpha2 = consts[:, 3:4]
        ks = [consts[:, 4 + j:5 + j] for j in range(W)]

        # selector/sigma coset FFTs are challenge-independent and public:
        # computed once per proving key (the single-prover quotient round
        # caches the same tables on its pk)
        cached = getattr(pk, "_mpc_coset_ffts", None)
        if cached is None:
            cached = ([base.coset_fft(s) for s in pk.selectors],
                      [base.coset_fft(s) for s in pk.sigmas])
            try:
                pk._mpc_coset_ffts = cached
            except Exception:
                pass
        sel_fft, sigma_fft = cached
        w_fft = [self.coset_fft_shared(wp) for wp in wire_polys]
        z_fft = self.coset_fft_shared(z_poly)
        pi_fft = base.coset_fft(pi_poly_pub)

        if (type(fab) is MockFabric and W == 5
                and w_fft[0].share.shape[1] == 2):
            # in-process fabric: whole gate+copy DAG in ONE program
            stacks = getattr(pk, '_mpc_sel_stack', None)
            if stacks is None:
                stacks = (jnp.stack(sel_fft, axis=1),
                          jnp.stack(sigma_fft, axis=1))
                try:
                    pk._mpc_sel_stack = stacks
                except Exception:
                    pass
            quot = self._quotient_core_fused(
                pk, consts, w_fft, z_fft, pi_fft, stacks[0], stacks[1])
        else:
            q_lc = sel_fft[0:4]
            q_mul = sel_fft[4:6]
            q_hash = sel_fft[6:10]
            q_o, q_c, q_ecc = sel_fft[10], sel_fft[11], sel_fft[12]

            # gate equation over shares
            t_circ = fab.mul_public(w_fft[0], q_lc[0])
            for j in range(1, 4):
                t_circ = fab.add(t_circ, fab.mul_public(w_fft[j], q_lc[j]))
            # level 1: w0*w1, w2*w3, wj^2 (x4) — ONE Beaver round
            lvl1 = fab.mul_batch([(w_fft[0], w_fft[1]), (w_fft[2], w_fft[3])]
                                 + [(w_fft[j], w_fft[j]) for j in range(4)])
            w01, w23, w2s = lvl1[0], lvl1[1], lvl1[2:]
            t_circ = fab.add(t_circ, fab.mul_public(w01, q_mul[0]))
            t_circ = fab.add(t_circ, fab.mul_public(w23, q_mul[1]))
            # level 2: (w0w1)(w2w3), wj^4 — ONE round
            lvl2 = fab.mul_batch([(w01, w23)] + [(w2, w2) for w2 in w2s])
            w0123, w4s = lvl2[0], lvl2[1:]
            # level 3: prod_w, wj^5 — ONE round
            lvl3 = fab.mul_batch([(w0123, w_fft[4])]
                                 + [(w4, w_fft[j]) for j, w4 in enumerate(w4s)])
            prod_w, w5s = lvl3[0], lvl3[1:]
            t_circ = fab.add(t_circ, fab.mul_public(prod_w, q_ecc))
            for j in range(4):
                t_circ = fab.add(t_circ, fab.mul_public(w5s[j], q_hash[j]))
            t_circ = fab.sub(t_circ, fab.mul_public(w_fft[4], q_o))
            t_circ = fab.add_public(t_circ, F.add(spec, q_c, pi_fft))

            # copy constraints
            x = base.coset_elements
            z_next = fab.map_local_b(
                lambda t: jnp.roll(t, -base.size_ratio, axis=-1), z_fft)
            term1 = fab.mul_public(z_fft, alpha)
            term2 = fab.mul_public(z_next, alpha)
            for j in range(W):
                aj = fab.add_public(w_fft[j], F.add(
                    spec, gamma, F.mul(spec, F.mul(spec, beta, ks[j]), x)))
                bj = fab.add_public(w_fft[j], F.add(
                    spec, gamma, F.mul(spec, beta, sigma_fft[j])))
                term1, term2 = fab.mul_batch([(term1, aj), (term2, bj)])
            t_perm_1 = fab.sub(term1, term2)

            one = F.ones(spec, (1,))
            zm1 = fab.add_public(z_fft, F.neg(spec, one))
            t_perm_2 = fab.mul_public(
                fab.mul_public(zm1, base.inv_n_x_minus_1), alpha2)

            t1 = fab.add(t_circ, t_perm_1)
            quot = fab.add(fab.mul_public(t1, base.zh_inv_coset), t_perm_2)

        # shared coset iNTT + split + shared masking + commits
        quot_coeffs = fab.map_local_b(
            lambda t: N.coset_intt(base.quot_domain, t, base.coset), quot)
        n = self.n
        expected_len = W * (n + 1) + 3
        chunk = n + 2
        polys = []
        for i in range(W):
            end = (i + 1) * chunk if i < W - 1 else expected_len
            piece = fab.map_local_b(lambda t, s=i * chunk, e=end: t[..., s:e],
                                    quot_coeffs)
            piece = self.pad_shared(piece, n + 3)
            polys.append(piece)
        if mask:
            bs = fab.random_shared_scalars(W - 1)
            for i in range(W - 1):
                bi = Shared(bs.share[:, :, i:i + 1], bs.mac[:, :, i:i + 1])
                prev = (Shared(bs.share[:, :, i - 1:i], bs.mac[:, :, i - 1:i])
                        if i > 0 else None)
                lo = polys[i]
                delta_share = jnp.zeros_like(lo.share)
                delta_mac = jnp.zeros_like(lo.mac)
                delta_share = delta_share.at[:, :, n + 2:n + 3].set(bi.share)
                delta_mac = delta_mac.at[:, :, n + 2:n + 3].set(bi.mac)
                if prev is not None:
                    delta_share = delta_share.at[:, :, 0:1].set(
                        F.neg(spec, prev.share))
                    delta_mac = delta_mac.at[:, :, 0:1].set(
                        F.neg(spec, prev.mac))
                polys[i] = Shared(F.add(spec, lo.share, delta_share),
                                  F.add(spec, lo.mac, delta_mac))
            last = Shared(bs.share[:, :, W - 2:W - 1], bs.mac[:, :, W - 2:W - 1])
            lo = polys[W - 1]
            polys[W - 1] = Shared(
                lo.share.at[:, :, 0:1].set(
                    F.sub(spec, lo.share[:, :, 0:1], last.share)),
                lo.mac.at[:, :, 0:1].set(
                    F.sub(spec, lo.mac[:, :, 0:1], last.mac)))
        comms = commit_shared_batch(self.fabric, ck, polys)  # ONE round
        return comms, polys

    def evaluations_round(self, pk, challenges: Challenges, wire_polys, z_poly):
        """Round 4: share-local evals, opened for the transcript."""
        fab = self.fabric
        spec = self.spec
        p = spec.p
        pts = upload(spec, [challenges.zeta,
                            challenges.zeta * self.base.domain.w % p])
        zeta, zeta_w = pts[:, 0], pts[:, 1]
        opened = fab.open_batch(
            [self.eval_shared(wp, zeta) for wp in wire_polys]
            + [self.eval_shared(z_poly, zeta_w)])          # ONE round
        wires_evals = [spec.from_device(v)[0] for v in opened[:-1]]
        sigma_evals = [
            spec.from_device(P.eval_at(spec, s, zeta).reshape(spec.num_limbs, 1))[0]
            for s in pk.sigmas[:self.num_wire_types - 1]]
        perm_next = spec.from_device(opened[-1])[0]
        return ProofEvaluations(wires_evals, sigma_evals, perm_next)

    def opening_round(self, ck, pk, challenges: Challenges, wire_polys, z_poly,
                      split_quot_polys, poly_evals: ProofEvaluations):
        """Round 5 + linearization: all coefficients are public (from opened
        evals), so the linearization poly and witness-quotient divisions are
        share-local; two authenticated MSMs finish the proof."""
        fab = self.fabric
        spec = self.spec
        p = spec.p
        ch = challenges
        n = self.n
        n3 = n + 3
        W = self.num_wire_types

        # public coefficients (same math as the plaintext prover)
        vanish = (pow(ch.zeta, n, p) - 1) % p
        z_np2 = pow(ch.zeta, n + 2, p)
        w = poly_evals.wires_evals

        quot_coeffs = []
        coeff = (p - vanish) % p
        for _ in split_quot_polys:
            quot_coeffs.append(coeff)
            coeff = coeff * z_np2 % p
        sel_coeffs = [w[0], w[1], w[2], w[3], w[0] * w[1] % p, w[2] * w[3] % p,
                      pow(w[0], 5, p), pow(w[1], 5, p), pow(w[2], 5, p),
                      pow(w[3], 5, p), (p - w[4]) % p, 1,
                      w[0] * w[1] % p * w[2] % p * w[3] % p * w[4] % p]
        lagrange_1 = vanish * pow(n * (ch.zeta - 1) % p, -1, p) % p
        coeff_z = ch.alpha
        for j in range(W):
            coeff_z = coeff_z * (w[j] + ch.beta * pk.vk.k[j] % p * ch.zeta
                                 + ch.gamma) % p
        coeff_z = (coeff_z + ch.alpha * ch.alpha % p * lagrange_1) % p
        coeff_s = ch.alpha * ch.beta % p * poly_evals.perm_next_eval % p
        for j in range(W - 1):
            coeff_s = coeff_s * (w[j] + ch.beta * poly_evals.wire_sigma_evals[j]
                                 + ch.gamma) % p

        cd = upload(spec, quot_coeffs + sel_coeffs
                    + [coeff_z, (p - coeff_s) % p])

        # shared part: quotient polys + z poly (shared); public part:
        # selectors + sigma_last (plaintext)
        lin_shared = None
        for i, poly in enumerate(split_quot_polys):
            t = fab.mul_public(poly, cd[:, i:i + 1])
            lin_shared = t if lin_shared is None else fab.add(lin_shared, t)
        zc = fab.mul_public(self.pad_shared(z_poly, n3),
                            cd[:, len(quot_coeffs) + 13:len(quot_coeffs) + 14])
        lin_shared = fab.add(lin_shared, zc)
        lin_pub = None
        for i, poly in enumerate(pk.selectors):
            t = F.mul(spec, poly, cd[:, len(quot_coeffs) + i:len(quot_coeffs) + i + 1])
            lin_pub = t if lin_pub is None else P.add_padded(spec, lin_pub, t)
        t = F.mul(spec, pk.sigmas[W - 1],
                  cd[:, len(quot_coeffs) + 14:len(quot_coeffs) + 15])
        lin_pub = P.add_padded(spec, lin_pub, t)
        lin = fab.add_public(self.pad_shared(lin_shared, n3),
                             jnp.concatenate(
                                 [lin_pub,
                                  F.zeros(spec, (n3 - lin_pub.shape[1],))],
                                 axis=1))

        # batched witness polys (public v-powers)
        vpow = []
        cur = 1
        polys = [lin] + [self.pad_shared(wp, n3) for wp in wire_polys]
        for s in pk.sigmas[:-1]:
            pub = jnp.concatenate([s, F.zeros(spec, (n3 - s.shape[1],))], axis=1)
            polys.append(("pub", pub))
        for _ in polys:
            vpow.append(cur)
            cur = cur * ch.v % p
        vd = upload(spec, vpow)
        batch = None
        for i, poly in enumerate(polys):
            if isinstance(poly, tuple):
                contrib_pub = F.mul(spec, poly[1], vd[:, i:i + 1])
                batch = (fab.add_public(batch, contrib_pub)
                         if batch is not None else None)
                if batch is None:
                    raise AssertionError("lin poly comes first")
            else:
                t = fab.mul_public(poly, vd[:, i:i + 1])
                batch = t if batch is None else fab.add(batch, t)

        pts = upload(spec, [ch.zeta, ch.zeta * self.base.domain.w % p])
        q1 = fab.map_local_b(
            lambda t: P.divide_by_linear(spec, t, pts[:, 0])[0], batch)
        q2 = fab.map_local_b(
            lambda t: P.divide_by_linear(spec, t, pts[:, 1])[0],
            self.pad_shared(z_poly, n3))
        opening, shifted = commit_shared_batch(self.fabric, ck, [q1, q2])
        return opening, shifted
