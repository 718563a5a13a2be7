"""Plonk IOP prover - device compute path.

Mirror of `plonk/src/proof_system/prover.rs` re-designed for TPU dataflow:
every round is a jitted JAX program over limb tensors; only commitments,
challenges and evaluations cross the host boundary (for the Fiat-Shamir
transcript).

Hot path (SURVEY.md §3.1): round 1 = W iNTTs + W MSMs; round 2 = grand
product (batched Fermat inverse + log-depth cumprod) + iNTT + MSM; round 3 =
~25 coset NTTs on the 8n quotient domain + pointwise constraint evaluation +
coset iNTT + W MSMs; round 5 = two linear-division openings + MSMs.

Per-domain constants (1/(n(x-1)) etc. on the coset) are cached on the Prover
- they are proof-independent (computed once with a batched inverse).
"""

from __future__ import annotations

import functools
import random

import jax
import jax.numpy as jnp

from ..ops import field as F
from ..ops import ntt as N
from ..ops import poly as P
from ..ops.field import FieldSpec
from ..pcs import kzg
from .structs import Challenges, Oracles, ProofEvaluations

GATE_WIDTH = 4


def _const(spec: FieldSpec, x: int):
    """Host int -> [L, 1] Montgomery device constant."""
    return spec.to_device([x])


class Prover:
    """Domain-bound prover state (mirror of prover.rs `Prover`)."""

    def __init__(self, spec: FieldSpec, domain_size: int, num_wire_types: int):
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
        self._cached = {}

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
    def _mask_poly(self, coeffs, hiding_bound: int, rng, mask: bool, out_len: int):
        """poly + Z_H * rand(deg=hiding_bound), padded to out_len
        (reference prover.rs:463-486)."""
        spec = self.spec
        L, cur = coeffs.shape
        if cur < out_len:
            coeffs = jnp.concatenate([coeffs, F.zeros(spec, (out_len - cur,))], axis=1)
        if not mask:
            return coeffs
        mask_coeffs = [rng.randrange(spec.p) for _ in range(hiding_bound + 1)]
        masked = P.mul_by_vanishing(spec, spec.to_device(mask_coeffs), self.n)
        return P.add_padded(spec, coeffs, masked)[:, :out_len]

    def coset_fft(self, coeffs):
        """Pad to m and evaluate on the coset of the quotient domain."""
        spec = self.spec
        L, cur = coeffs.shape
        if cur < self.m:
            coeffs = jnp.concatenate([coeffs, F.zeros(spec, (self.m - cur,))], axis=1)
        return N.coset_ntt(self.quot_domain, coeffs, self.coset)

    # -- round 1 ----------------------------------------------------------
    def run_1st_round(self, ck, wire_values, rng, mask: bool):
        """wire_values: list of [L, n] eval tensors.  Returns (comms, polys)."""
        out_len = self.n + 3
        polys, comms = [], []
        for wv in wire_values:
            coeffs = N.intt(self.domain, wv)
            coeffs = self._mask_poly(coeffs, 1, rng, mask, out_len)
            polys.append(coeffs)
            comms.append(kzg.commit(ck, coeffs))
        return comms, polys

    def pub_input_poly(self, pi_values):
        return N.intt(self.domain, pi_values)

    # -- round 2: permutation grand product -------------------------------
    def run_2nd_round(self, ck, wire_values, id_evals, sigma_evals, beta, gamma,
                      rng, mask: bool):
        """Grand product z(X) (reference constraint_system.rs:1197-1223).

        wire_values/id_evals/sigma_evals: lists of [L, n] eval tensors.
        """
        spec = self.spec
        beta_d = _const(spec, beta)
        gamma_d = _const(spec, gamma)
        num = F.ones(spec, (self.n,))
        den = F.ones(spec, (self.n,))
        for w, idp, sg in zip(wire_values, id_evals, sigma_evals):
            t = F.add(spec, w, gamma_d)
            num = F.mul(spec, num, F.add(spec, t, F.mul(spec, beta_d, idp)))
            den = F.mul(spec, den, F.add(spec, t, F.mul(spec, beta_d, sg)))
        ratio = F.mul(spec, num, F.inv(spec, den))
        prod = F.cumprod(spec, ratio, axis=1)
        # z = [1, prod_0, prod_0*r_1, ...] (exclusive shift)
        z_evals = jnp.concatenate([F.ones(spec, (1,)), prod[:, :self.n - 1]], axis=1)
        coeffs = N.intt(self.domain, z_evals)
        coeffs = self._mask_poly(coeffs, 2, rng, mask, self.n + 3)
        comm = kzg.commit(ck, coeffs)
        return comm, coeffs

    # -- round 3: quotient -------------------------------------------------
    def compute_quotient_coset_evals(self, pk, challenges: Challenges, oracles: Oracles):
        """Coset evaluations of the (single-instance) quotient contribution
        (t1 * zh_inv + t2).  Mirror of prover.rs:512-675 minus the
        multi-instance alpha aggregation (done by the caller)."""
        spec = self.spec
        m = self.m
        W = self.num_wire_types

        sel_fft = [self.coset_fft(s) for s in pk.selectors]
        sigma_fft = [self.coset_fft(s) for s in pk.sigmas]
        wire_fft = [self.coset_fft(w) for w in oracles.wire_polys]
        z_fft = self.coset_fft(oracles.prod_perm_poly)
        pi_fft = self.coset_fft(oracles.pub_inp_poly)

        alpha = _const(spec, challenges.alpha)
        beta = _const(spec, challenges.beta)
        gamma = _const(spec, challenges.gamma)
        alpha2 = _const(spec, challenges.alpha * challenges.alpha % spec.p)

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
        x = self.coset_elements
        z_next = jnp.roll(z_fft, -self.size_ratio, axis=1)
        term1 = F.mul(spec, alpha, z_fft)
        term2 = F.mul(spec, alpha, z_next)
        for j in range(W):
            kj = _const(spec, pk.vk.k[j])
            a = F.add(spec, F.add(spec, w[j], gamma),
                      F.mul(spec, F.mul(spec, beta, kj), x))
            term1 = F.mul(spec, term1, a)
            b = F.add(spec, F.add(spec, w[j], gamma),
                      F.mul(spec, beta, sigma_fft[j]))
            term2 = F.mul(spec, term2, b)
        t_perm_1 = F.sub(spec, term1, term2)

        one = F.ones(spec, (1,))
        t_perm_2 = F.mul(spec, alpha2,
                         F.mul(spec, F.sub(spec, z_fft, one), self.inv_n_x_minus_1))

        t1 = F.add(spec, t_circ, t_perm_1)
        quot = F.add(spec, F.mul(spec, t1, self.zh_inv_coset), t_perm_2)
        return quot

    def quotient_evals_to_split_polys(self, quot_evals, rng, mask: bool):
        """Coset iNTT + split into W chunks of n+2 coeffs (prover.rs:890-959)."""
        spec = self.spec
        W = self.num_wire_types
        n = self.n
        coeffs = N.coset_intt(self.quot_domain, quot_evals, self.coset)
        expected_len = W * (n + 1) + 3   # degree W*(n+1)+2 (prover.rs:1126)
        chunk = n + 2
        polys = []
        for i in range(W):
            end = (i + 1) * chunk if i < W - 1 else expected_len
            piece = coeffs[:, i * chunk:end]
            # pad to n+3 for stable shapes
            pad = n + 3 - piece.shape[1]
            if pad > 0:
                piece = jnp.concatenate([piece, F.zeros(spec, (pad,))], axis=1)
            polys.append(piece)
        if mask:
            # t_i(X) = t'_i(X) - b_{i-1} + b_i X^{n+2}
            last = 0
            for i in range(W - 1):
                b = rng.randrange(spec.p)
                polys[i] = polys[i].at[:, 0].set(
                    F.sub(spec, polys[i][:, :1], _const(spec, last))[:, 0])
                polys[i] = polys[i].at[:, n + 2].set(
                    F.add(spec, polys[i][:, n + 2:n + 3], _const(spec, b))[:, 0])
                last = b
            polys[W - 1] = polys[W - 1].at[:, 0].set(
                F.sub(spec, polys[W - 1][:, :1], _const(spec, last))[:, 0])
        return polys

    def run_3rd_round(self, ck, quot_evals_sum, rng, mask: bool):
        polys = self.quotient_evals_to_split_polys(quot_evals_sum, rng, mask)
        comms = [kzg.commit(ck, c) for c in polys]
        return comms, polys

    # -- round 4: evaluations ---------------------------------------------
    def compute_evaluations(self, pk, challenges: Challenges, oracles: Oracles):
        """Evaluate wires at zeta, sigmas (all but last) at zeta, z at zeta*w
        (prover.rs:216-235)."""
        spec = self.spec
        zeta = _const(spec, challenges.zeta)[:, 0]
        zeta_w = _const(spec, challenges.zeta * self.domain.w % spec.p)[:, 0]
        wires_evals = [spec.from_device(P.eval_at(spec, c, zeta).reshape(spec.num_limbs, 1))[0]
                       for c in oracles.wire_polys]
        sigma_evals = [spec.from_device(P.eval_at(spec, c, zeta).reshape(spec.num_limbs, 1))[0]
                       for c in pk.sigmas[:self.num_wire_types - 1]]
        perm_next = spec.from_device(
            P.eval_at(spec, oracles.prod_perm_poly, zeta_w).reshape(spec.num_limbs, 1))[0]
        return ProofEvaluations(wires_evals, sigma_evals, perm_next)

    # -- linearization poly ------------------------------------------------
    def compute_quotient_component_for_lin_poly(self, zeta: int, quot_polys):
        """-Z_H(zeta) * sum zeta^{i(n+2)} t_i(X)  (prover.rs:343-358)."""
        spec = self.spec
        p = spec.p
        vanish = (pow(zeta, self.n, p) - 1) % p
        z_np2 = pow(zeta, self.n + 2, p)
        acc = None
        coeff = (p - vanish) % p
        for i, poly in enumerate(quot_polys):
            c = _const(spec, coeff)
            term = F.mul(spec, poly, c)
            acc = term if acc is None else P.add_padded(spec, acc, term)
            coeff = coeff * z_np2 % p
        return acc

    def compute_non_quotient_component_for_lin_poly(
            self, alpha_base: int, pk, challenges: Challenges, oracles: Oracles,
            evals: ProofEvaluations):
        """r_circ + r_perm, scaled by alpha_base (prover.rs:302-337,962-1034)."""
        spec = self.spec
        p = spec.p
        w = evals.wires_evals
        ch = challenges

        # r_circ scalar coefficients for the 13 selector polys
        coeffs = [w[0], w[1], w[2], w[3],
                  w[0] * w[1] % p, w[2] * w[3] % p,
                  pow(w[0], 5, p), pow(w[1], 5, p), pow(w[2], 5, p), pow(w[3], 5, p),
                  (p - w[4]) % p, 1,
                  w[0] * w[1] % p * w[2] % p * w[3] % p * w[4] % p]
        acc = None
        for c, poly in zip(coeffs, pk.selectors):
            term = F.mul(spec, poly, _const(spec, c * alpha_base % p))
            acc = term if acc is None else P.add_padded(spec, acc, term)

        # r_perm: coeff_z * z(X) - coeff_sigma * sigma_last(X)
        vanish = (pow(ch.zeta, self.n, p) - 1) % p
        lagrange_1 = vanish * pow(self.n * (ch.zeta - 1) % p, -1, p) % p
        coeff_z = ch.alpha
        for j in range(self.num_wire_types):
            coeff_z = coeff_z * (w[j] + ch.beta * pk.vk.k[j] % p * ch.zeta + ch.gamma) % p
        coeff_z = (coeff_z + ch.alpha * ch.alpha % p * lagrange_1) % p
        term = F.mul(spec, oracles.prod_perm_poly,
                     _const(spec, coeff_z * alpha_base % p))
        acc = P.add_padded(spec, acc, term)

        coeff_s = ch.alpha * ch.beta % p * evals.perm_next_eval % p
        for j in range(self.num_wire_types - 1):
            coeff_s = coeff_s * (w[j] + ch.beta * evals.wire_sigma_evals[j] + ch.gamma) % p
        coeff_s = (p - coeff_s * alpha_base) % p
        term = F.mul(spec, pk.sigmas[self.num_wire_types - 1], _const(spec, coeff_s))
        acc = P.add_padded(spec, acc, term)
        return acc

    # -- round 5: opening proofs ------------------------------------------
    def compute_opening_proofs(self, ck, pks, zeta: int, v: int, oracles_list,
                               lin_poly):
        """Batched witness polynomial commitments (prover.rs:362-419)."""
        spec = self.spec
        p = spec.p

        # polys opened at zeta: [lin_poly, wires..., sigmas[:-1]...] per instance
        polys = [lin_poly]
        for pk, oracles in zip(pks, oracles_list):
            polys += list(oracles.wire_polys)
            polys += list(pk.sigmas[:-1])
        batch = None
        coeff = 1
        for poly in polys:
            term = F.mul(spec, poly, _const(spec, coeff))
            batch = term if batch is None else P.add_padded(spec, batch, term)
            coeff = coeff * v % p
        q, _ = P.divide_by_linear(spec, batch, _const(spec, zeta)[:, 0])
        opening = kzg.commit(ck, q)

        # polys opened at zeta*w: prod_perm per instance
        batch = None
        coeff = 1
        for pk, oracles in zip(pks, oracles_list):
            term = F.mul(spec, oracles.prod_perm_poly, _const(spec, coeff))
            batch = term if batch is None else P.add_padded(spec, batch, term)
            coeff = coeff * v % p
        zeta_w = zeta * self.domain.w % p
        q2, _ = P.divide_by_linear(spec, batch, _const(spec, zeta_w)[:, 0])
        shifted = kzg.commit(ck, q2)
        return opening, shifted
