"""Plonk verifier (host-side).

Mirror of `plonk/src/proof_system/verifier.rs`: recompute Fiat-Shamir
challenges, build the aggregated commitment (scalars-and-bases), aggregate
evaluations, and run the single 2-pairing product check.

Verification is milliseconds-scale host work (a ~30-term MSM + 2 pairings);
it intentionally stays off the device.  `ScalarsAndBases` mirrors
structs.rs:850-891.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..curves import CurveSpec
from ..utils.ec_host import AffinePoint, ec_msm_fast, ec_neg
from .. import pairing as PR
from .structs import BatchProof, Challenges, VerifyingKey
from .structs import eval_merged_lookup_witness, eval_merged_table
from .transcript import SolidityTranscript, EXTRA_TRANSCRIPT_MSG_LABEL

GATE_WIDTH = 4


class ScalarsAndBases:
    """Deferred MSM accumulator (reference structs.rs:850)."""

    def __init__(self):
        self.pairs: list = []

    def push(self, scalar: int, base: AffinePoint):
        self.pairs.append((scalar, base))

    def merge(self, scale: int, other: "ScalarsAndBases", p: int):
        for (s, b) in other.pairs:
            self.pairs.append((s * scale % p, b))

    def multi_scalar_mul(self, fq_p: int, fr_p: int) -> AffinePoint:
        # Merge repeated bases first (scalar adds are ~free next to point
        # adds): across a verification batch the vk/SRS bases recur once per
        # proof, so this shrinks the MSM by the sharing factor.
        acc: dict = {}
        for s, b in self.pairs:
            key = (b.x, b.y, b.inf)
            if key in acc:
                acc[key][0] = (acc[key][0] + s) % fr_p
            else:
                acc[key] = [s % fr_p, b]
        scalars = [v[0] for v in acc.values()]
        bases = [v[1] for v in acc.values()]
        return ec_msm_fast(fq_p, bases, scalars, order=fr_p)


class _SegmentRecorder(SolidityTranscript):
    """Transcript stand-in that records the byte segments appended between
    challenge squeezes instead of hashing.  Running the regular
    ``compute_challenges`` body over it yields the exact per-challenge
    segments for the native keccak chain (``native.challenge_chain``)."""

    def __init__(self, curve, memo=None):
        super().__init__(curve)
        self._segments = []
        self._mark = 0
        # per-batch point-bytes memo: batches that repeat commitment objects
        # (shared vk, replicated proofs) serialize each point once.  Keyed by
        # id() — safe because the caller holds the jobs alive for the call.
        self._memo = memo if memo is not None else {}

    def append_commitment(self, label: bytes, comm):
        hit = self._memo.get(id(comm))
        if hit is None:
            from ..utils.serialize import g1_to_bytes
            # store the point alongside its bytes: the dict reference pins
            # the object, so id() reuse by a temporary is impossible
            hit = (comm, g1_to_bytes(self.curve, comm))
            self._memo[id(comm)] = hit
        self.append_message(label, hit[1])

    def get_and_append_challenge(self, label: bytes) -> int:
        t = bytes(self.transcript)
        self._segments.append(t[self._mark:])
        self._mark = len(t)
        return 0  # placeholder — real challenges come from the native chain

    def take_segments(self):
        return self._segments


class _LayoutRecorder(SolidityTranscript):
    """Transcript stand-in that records WHERE proof-dependent bytes land in
    the transcript: running ``compute_challenges`` over a tagged dummy
    proof yields (template bytes, segment ends, patch list) for the native
    ``bv_assemble`` assembler.  Patches: (t_off, kind, src, 32) with
    kind 0 = proof-blob copy, 1 = public-input copy, 2 = compressed point
    (src = blob point index)."""

    def __init__(self, curve):
        super().__init__(curve)
        self.patches = []
        self.seg_ends = []

    def append_commitment(self, label: bytes, comm):
        if isinstance(comm, _TaggedPoint):
            self.patches.append((len(self.transcript), 2, comm.tag, 32))
        super().append_commitment(label, comm)

    def append_field(self, label: bytes, v: int):
        if isinstance(v, _TaggedEval):
            self.patches.append(
                (len(self.transcript), 0, _BV_PTS_LEN + v.tag * 32, 32))
        super().append_field(label, v)

    def append_vk_and_pub_input(self, vk, pub_input):
        super().append_vk_and_pub_input(vk, [])
        from ..utils.serialize import field_to_bytes
        for i in range(len(pub_input)):
            self.patches.append((len(self.transcript), 1, 32 * i, 32))
            self.append_message(b"public input",
                                field_to_bytes(self.curve.fr, 0))

    def get_and_append_challenge(self, label: bytes) -> int:
        self.seg_ends.append(len(self.transcript))
        return 0


class _TaggedPoint:
    """Placeholder commitment carrying a proof-blob point index; used only
    to record the transcript layout (values are never hashed for real)."""
    __slots__ = ("x", "y", "inf", "tag")

    def __init__(self, tag):
        self.x, self.y, self.inf, self.tag = 1, 1, False, tag


class _TaggedEval(int):
    """Placeholder evaluation carrying a proof-blob eval index."""
    def __new__(cls, tag):
        o = super().__new__(cls, 1)
        o.tag = tag
        return o


# proof-blob layout for the fused native batch verifier (bv_assemble):
# 13 points x 65B (x|y|inf) in batch_opening_msm base order
# [z, q0..q4, w0..w4, open, shifted], then 10 evals x 32B LE
# [w0..w4, s0..s3, perm_next].
_BV_NPT = 13
_BV_PTS_LEN = _BV_NPT * 65
_BV_BLOB_LEN = _BV_PTS_LEN + 10 * 32


def proof_bv_blob(curve, proof) -> bytes:
    """Canonical raw-byte image of a TurboPlonk proof for the fused native
    batch verifier — the moral equivalent of the reference's in-memory limb
    representation (a Rust Proof struct IS its limbs; our Python ints need
    one explicit conversion, cached on the proof object and produced at
    prove()/deserialize time)."""
    b = getattr(proof, "_bv_blob", None)
    if b is not None:
        return b

    def pt65(pt):
        if pt.inf:
            return b"\x00" * 64 + b"\x01"
        return (int(pt.x).to_bytes(32, "little")
                + int(pt.y).to_bytes(32, "little") + b"\x00")

    p = curve.fr.p
    ev = proof.poly_evals
    parts = [pt65(proof.prod_perm_poly_comm)]
    parts += [pt65(c) for c in proof.split_quot_poly_comms]
    parts += [pt65(c) for c in proof.wires_poly_comms]
    parts.append(pt65(proof.opening_proof))
    parts.append(pt65(proof.shifted_opening_proof))
    for v in [*ev.wires_evals, *ev.wire_sigma_evals, ev.perm_next_eval]:
        parts.append((int(v) % p).to_bytes(32, "little"))
    blob = b"".join(parts)
    try:
        proof._bv_blob = blob
    except Exception:
        pass
    return blob


@dataclass
class PcsInfo:
    """Reference verifier.rs:40-48."""
    u: int
    eval_point: int
    next_eval_point: int
    eval: int
    comm_scalars_and_bases: ScalarsAndBases
    opening_proof: AffinePoint
    shifted_opening_proof: AffinePoint


class Verifier:
    """Mirror of verifier.rs `Verifier`."""

    def __init__(self, curve: CurveSpec, domain_size: int,
                 transcript_cls=SolidityTranscript):
        from ..ops.ntt import Domain
        self.transcript_cls = transcript_cls
        self.curve = curve
        self.p = curve.fr.p
        self.n = domain_size
        dom = Domain(curve.fr, domain_size)
        self.group_gen = dom.w
        self.group_gen_inv = dom.w_inv

    # -- challenges (verifier.rs:256-321) --------------------------------
    def compute_challenges(self, vks, public_inputs, batch_proof: BatchProof,
                           extra_transcript_init_msg=None,
                           _transcript=None) -> Challenges:
        t = _transcript if _transcript is not None \
            else self.transcript_cls(self.curve)
        if extra_transcript_init_msg is not None:
            t.append_message(EXTRA_TRANSCRIPT_MSG_LABEL, extra_transcript_init_msg)
        for vk, pi in zip(vks, public_inputs):
            t.append_vk_and_pub_input(vk, pi)
        for comms in batch_proof.wires_poly_comms_vec:
            t.append_commitments(b"witness_poly_comms", comms)
        tau = t.get_and_append_challenge(b"tau")
        for plookup_proof in batch_proof.plookup_proofs_vec:
            if plookup_proof is not None:
                t.append_commitments(b"h_poly_comms", plookup_proof.h_poly_comms)
        beta = t.get_and_append_challenge(b"beta")
        gamma = t.get_and_append_challenge(b"gamma")
        for comm in batch_proof.prod_perm_poly_comms_vec:
            t.append_commitment(b"perm_poly_comms", comm)
        for plookup_proof in batch_proof.plookup_proofs_vec:
            if plookup_proof is not None:
                t.append_commitment(b"plookup_poly_comms",
                                    plookup_proof.prod_lookup_poly_comm)
        alpha = t.get_and_append_challenge(b"alpha")
        t.append_commitments(b"quot_poly_comms", batch_proof.split_quot_poly_comms)
        zeta = t.get_and_append_challenge(b"zeta")
        for evals in batch_proof.poly_evals_vec:
            t.append_proof_evaluations(evals)
        for plookup_proof in batch_proof.plookup_proofs_vec:
            if plookup_proof is not None:
                t.append_plookup_evaluations(plookup_proof.poly_evals)
        v = t.get_and_append_challenge(b"v")
        t.append_commitment(b"open_proof", batch_proof.opening_proof)
        t.append_commitment(b"shifted_open_proof", batch_proof.shifted_opening_proof)
        u = t.get_and_append_challenge(b"u")
        return Challenges(tau=tau, alpha=alpha, beta=beta, gamma=gamma,
                          zeta=zeta, v=v, u=u)

    def compute_challenges_batch(self, jobs) -> list:
        """Challenges for many (vks, public_inputs, batch_proof, extra)
        jobs at once.  For the Solidity transcript the per-proof keccak
        chains are independent, so they run in the native C runtime,
        pthread-parallel with the GIL released; byte-parity is guaranteed
        by recording the segments through the same ``compute_challenges``
        body that the hashing path uses."""
        from ..utils import native
        if self.transcript_cls is not SolidityTranscript:
            return [self.compute_challenges(*job) for job in jobs]
        seg_batches = []
        memo = {}
        for job in jobs:
            rec = _SegmentRecorder(self.curve, memo)
            self.compute_challenges(*job, _transcript=rec)
            seg_batches.append(rec.take_segments())
        states = native.challenge_chain(seg_batches)
        if states is None:
            return [self.compute_challenges(*job) for job in jobs]
        p = self.p
        out = []
        for st in states:
            tau, beta, gamma, alpha, zeta, v, u = (
                int.from_bytes(s[:48], "little") % p for s in st)
            out.append(Challenges(tau=tau, alpha=alpha, beta=beta,
                                  gamma=gamma, zeta=zeta, v=v, u=u))
        return out

    # -- helpers ----------------------------------------------------------
    def evaluate_vanishing_poly(self, zeta: int) -> int:
        return (pow(zeta, self.n, self.p) - 1) % self.p

    def evaluate_lagrange_1_and_n(self, zeta: int, vanish_eval: int):
        p = self.p
        l1 = vanish_eval * pow(self.n * (zeta - 1) % p, -1, p) % p
        ln = (vanish_eval * self.group_gen_inv % p
              * pow(self.n * (zeta - self.group_gen_inv) % p, -1, p) % p)
        return l1, ln

    def evaluate_pi_poly(self, pub_input, z: int, vanish_eval: int,
                         circuit_is_merged: bool) -> int:
        """verifier.rs:845-880."""
        p = self.p
        if vanish_eval == 0:
            return 0
        length = len(pub_input) // 2 if circuit_is_merged else len(pub_input)
        vanish_div_n = pow(self.n, -1, p) * vanish_eval % p
        result = 0
        elem = 1
        for i in range(length):
            lag = vanish_div_n * elem % p * pow((z - elem) % p, -1, p) % p
            result = (result + lag * pub_input[i]) % p
            elem = elem * self.group_gen % p
        if circuit_is_merged:
            gi = pow(self.group_gen, self.n - 1, p)
            for i in range(length):
                lag = vanish_div_n * gi % p * pow((z - gi) % p, -1, p) % p
                result = (result + lag * pub_input[length + i]) % p
                gi = gi * self.group_gen_inv % p
        return result

    # -- lin poly constant (verifier.rs:340-414) ---------------------------
    def compute_lin_poly_constant_term(self, challenges, vks, public_inputs,
                                       batch_proof, vanish_eval, l1, ln,
                                       alpha_powers, alpha_bases) -> int:
        p = self.p
        ch = challenges
        result = 0
        for poly_evals, plookup_proof, pi, vk, ab in zip(
                batch_proof.poly_evals_vec, batch_proof.plookup_proofs_vec,
                public_inputs, vks, alpha_bases):
            tmp = (self.evaluate_pi_poly(pi, ch.zeta, vanish_eval, vk.is_merged)
                   - alpha_powers[0] * l1) % p
            num_wire_types = GATE_WIDTH + 1 + (1 if plookup_proof is not None else 0)
            w = poly_evals.wires_evals
            acc = ch.alpha * poly_evals.perm_next_eval % p * (ch.gamma + w[num_wire_types - 1]) % p
            for we, se in zip(w[:num_wire_types - 1], poly_evals.wire_sigma_evals):
                acc = acc * (ch.gamma + we + ch.beta * se) % p
            tmp = (tmp - acc) % p
            if plookup_proof is not None:
                ev = plookup_proof.poly_evals
                gb1 = ch.gamma * (1 + ch.beta) % p
                plookup_constant = (
                    ln * (ev.h_1_eval - ev.h_2_next_eval - alpha_powers[0]) % p
                    - ch.alpha * l1
                    - alpha_powers[1] * (ch.zeta - self.group_gen_inv) % p
                    * ev.prod_next_eval % p
                    * (gb1 + ev.h_1_eval + ch.beta * ev.h_1_next_eval) % p
                    * (gb1 + ch.beta * ev.h_2_next_eval) % p
                ) % p
                tmp = (tmp + alpha_powers[1] * plookup_constant) % p
            result = (result + ab * tmp) % p
        return result

    # -- linearization scalars and bases (verifier.rs:513-668) -------------
    def linearization_scalars_and_bases(self, vks, challenges, vanish_eval,
                                        l1, ln, batch_proof, alpha_powers,
                                        alpha_bases) -> ScalarsAndBases:
        p = self.p
        ch = challenges
        sb = ScalarsAndBases()
        beta_plus_one = (1 + ch.beta) % p
        gb1 = beta_plus_one * ch.gamma % p

        for i, (vk, ab) in enumerate(zip(vks, alpha_bases)):
            w = batch_proof.poly_evals_vec[i].wires_evals
            # permutation product commitment coeff
            coeff = alpha_powers[0] * l1 % p
            acc = ch.alpha
            for we, k in zip(w, vk.k):
                acc = acc * (ch.beta * k % p * ch.zeta + ch.gamma + we) % p
            coeff = (coeff + acc) * ab % p
            sb.push(coeff, batch_proof.prod_perm_poly_comms_vec[i])

            # last sigma commitment coeff
            num_wire_types = len(batch_proof.wires_poly_comms_vec[i])
            sigma_evals = batch_proof.poly_evals_vec[i].wire_sigma_evals
            acc = ch.alpha * ch.beta % p * batch_proof.poly_evals_vec[i].perm_next_eval % p
            for we, se in zip(w[:num_wire_types - 1], sigma_evals):
                acc = acc * (ch.beta * se + ch.gamma + we) % p
            sb.push((p - acc * ab % p) % p, vk.sigma_comms[-1])

            # selector commitments; order: q_lc x4, q_mul x2, q_hash x4, q_o, q_c, q_ecc
            q_scalars = [w[0], w[1], w[2], w[3],
                         w[0] * w[1] % p, w[2] * w[3] % p,
                         pow(w[0], 5, p), pow(w[1], 5, p), pow(w[2], 5, p), pow(w[3], 5, p),
                         (p - w[4]) % p, 1,
                         w[0] * w[1] % p * w[2] % p * w[3] % p * w[4] % p]
            for s, comm in zip(q_scalars, vk.selector_comms):
                sb.push(s * ab % p, comm)

            # Plookup terms
            lookup_proof = batch_proof.plookup_proofs_vec[i]
            if lookup_proof is not None:
                ev = lookup_proof.poly_evals
                merged_lookup_x = eval_merged_lookup_witness(
                    p, ch.tau, w[5], w[0], w[1], w[2],
                    ev.q_lookup_eval, ev.q_dom_sep_eval)
                merged_table_x = eval_merged_table(
                    p, ch.tau, ev.range_table_eval, ev.key_table_eval,
                    ev.q_lookup_eval, w[3], w[4], ev.table_dom_sep_eval)
                merged_table_xw = eval_merged_table(
                    p, ch.tau, ev.range_table_next_eval, ev.key_table_next_eval,
                    ev.q_lookup_next_eval, ev.w_3_next_eval, ev.w_4_next_eval,
                    ev.table_dom_sep_next_eval)
                coeff = (alpha_powers[2] * l1
                         + alpha_powers[3] * ln
                         + alpha_powers[4] * (ch.zeta - self.group_gen_inv)
                         * beta_plus_one % p
                         * (ch.gamma + merged_lookup_x) % p
                         * (gb1 + merged_table_x + ch.beta * merged_table_xw)) % p
                sb.push(coeff * ab % p, lookup_proof.prod_lookup_poly_comm)

                coeff = (ab * alpha_powers[4] % p
                         * (self.group_gen_inv - ch.zeta) % p
                         * ev.prod_next_eval % p
                         * (gb1 + ev.h_1_eval + ch.beta * ev.h_1_next_eval)) % p
                sb.push(coeff, lookup_proof.h_poly_comms[1])

        # split quotient commitments
        zeta_np2 = (1 + vanish_eval) * pow(ch.zeta, 2, p) % p
        coeff = (p - vanish_eval) % p
        sb.push(coeff, batch_proof.split_quot_poly_comms[0])
        for comm in batch_proof.split_quot_poly_comms[1:]:
            coeff = coeff * zeta_np2 % p
            sb.push(coeff, comm)
        return sb

    # -- aggregation (verifier.rs:421-507, 673-733) ------------------------
    def aggregate_poly_commitments(self, vks, challenges, vanish_eval, l1, ln,
                                   batch_proof, alpha_powers, alpha_bases):
        p = self.p
        ch = challenges
        sb = self.linearization_scalars_and_bases(
            vks, challenges, vanish_eval, l1, ln, batch_proof, alpha_powers,
            alpha_bases)
        v_base = ch.v
        uv_base = ch.u
        buffer_v_and_uv_basis = []
        for i, vk in enumerate(vks):
            for comm in batch_proof.wires_poly_comms_vec[i]:
                buffer_v_and_uv_basis.append(v_base)
                sb.push(v_base, comm)
                v_base = v_base * ch.v % p
            num_wire_types = len(batch_proof.wires_poly_comms_vec[i])
            for comm in vk.sigma_comms[:num_wire_types - 1]:
                buffer_v_and_uv_basis.append(v_base)
                sb.push(v_base, comm)
                v_base = v_base * ch.v % p
            buffer_v_and_uv_basis.append(uv_base)
            sb.push(uv_base, batch_proof.prod_perm_poly_comms_vec[i])
            uv_base = uv_base * ch.v % p

            lookup_proof = batch_proof.plookup_proofs_vec[i]
            if lookup_proof is not None:
                plookup_comms = [
                    vk.plookup_vk.range_table_comm, vk.plookup_vk.key_table_comm,
                    lookup_proof.h_poly_comms[0], vk.q_lookup_comm(),
                    vk.plookup_vk.table_dom_sep_comm, vk.plookup_vk.q_dom_sep_comm,
                ]
                for comm in plookup_comms:
                    buffer_v_and_uv_basis.append(v_base)
                    sb.push(v_base, comm)
                    v_base = v_base * ch.v % p
                shifted = [
                    lookup_proof.prod_lookup_poly_comm,
                    vk.plookup_vk.range_table_comm, vk.plookup_vk.key_table_comm,
                    lookup_proof.h_poly_comms[0], lookup_proof.h_poly_comms[1],
                    vk.q_lookup_comm(),
                    batch_proof.wires_poly_comms_vec[i][3],
                    batch_proof.wires_poly_comms_vec[i][4],
                    vk.plookup_vk.table_dom_sep_comm,
                ]
                for comm in shifted:
                    buffer_v_and_uv_basis.append(uv_base)
                    sb.push(uv_base, comm)
                    uv_base = uv_base * ch.v % p
        return sb, buffer_v_and_uv_basis

    def aggregate_evaluations(self, lin_poly_constant, poly_evals_vec,
                              plookup_proofs_vec, buffer_v_and_uv_basis) -> int:
        p = self.p
        result = (p - lin_poly_constant) % p
        it = iter(buffer_v_and_uv_basis)
        for poly_evals, plookup_proof in zip(poly_evals_vec, plookup_proofs_vec):
            for we in poly_evals.wires_evals:
                result = (result + next(it) * we) % p
            for se in poly_evals.wire_sigma_evals:
                result = (result + next(it) * se) % p
            result = (result + next(it) * poly_evals.perm_next_eval) % p
            if plookup_proof is not None:
                ev = plookup_proof.poly_evals
                for e in ev.evals_vec():
                    result = (result + next(it) * e) % p
                for e in ev.next_evals_vec():
                    result = (result + next(it) * e) % p
        try:
            next(it)
            raise ValueError("buffer not fully consumed")
        except StopIteration:
            pass
        return result

    # -- full preparation (verifier.rs:68-184) ------------------------------
    def prepare_pcs_info(self, vks, public_inputs, batch_proof,
                         extra_transcript_init_msg=None) -> PcsInfo:
        challenges = self.compute_challenges(
            vks, public_inputs, batch_proof, extra_transcript_init_msg)
        return self.pcs_info_with_challenges(
            challenges, vks, public_inputs, batch_proof)

    def pcs_info_with_challenges(self, challenges, vks, public_inputs,
                                 batch_proof) -> PcsInfo:
        """prepare_pcs_info with the Fiat-Shamir challenges already computed
        (batch verification derives them for all proofs at once)."""
        p = self.p
        alpha = challenges.alpha
        alpha_powers = [pow(alpha, i, p) for i in range(2, 7)]
        alpha_bases = [1]
        tmp = pow(alpha, 7 if vks[0].plookup_vk is not None else 3, p)
        if len(vks) > 1:
            cur = tmp
            for _ in range(len(vks) - 1):
                alpha_bases.append(cur)
                cur = cur * tmp % p
        vanish_eval = self.evaluate_vanishing_poly(challenges.zeta)
        l1, ln = self.evaluate_lagrange_1_and_n(challenges.zeta, vanish_eval)
        lin_const = self.compute_lin_poly_constant_term(
            challenges, vks, public_inputs, batch_proof, vanish_eval, l1, ln,
            alpha_powers, alpha_bases)
        sb, buffer = self.aggregate_poly_commitments(
            vks, challenges, vanish_eval, l1, ln, batch_proof, alpha_powers,
            alpha_bases)
        eval_ = self.aggregate_evaluations(
            lin_const, batch_proof.poly_evals_vec, batch_proof.plookup_proofs_vec,
            buffer)
        return PcsInfo(
            u=challenges.u,
            eval_point=challenges.zeta,
            next_eval_point=challenges.zeta * self.group_gen % p,
            eval=eval_,
            comm_scalars_and_bases=sb,
            opening_proof=batch_proof.opening_proof,
            shifted_opening_proof=batch_proof.shifted_opening_proof,
        )

    def _fast_path_npi(self, jobs):
        """Eligibility of the native TurboPlonk single-vk fast path;
        returns the public-input count, or None when ineligible."""
        if not jobs:
            return None
        # the C runtime works on 32-byte LE field elements: curves with
        # Fr or Fq wider than 256 bits (BW6-761) must use the Python path
        # (matches the _get_fr_ctx scope check in utils/native.py)
        if self.p.bit_length() > 256 or self.curve.fq.p.bit_length() > 256:
            return None
        vk0 = jobs[0][0][0]
        npi = len(jobs[0][1][0])
        for (vks_i, pis_i, bp, _x) in jobs:
            if len(vks_i) != 1 or len(pis_i) != 1:
                return None
            vk = vks_i[0]
            if (vk.plookup_vk is not None or getattr(vk, "is_merged", False)
                    or vk.domain_size != self.n
                    or list(vk.k) != list(vk0.k)
                    or len(vk.selector_comms) != 13
                    or bp.plookup_proofs_vec[0] is not None
                    or len(bp.wires_poly_comms_vec[0]) != 5
                    or len(bp.poly_evals_vec[0].wire_sigma_evals) != 4
                    or len(bp.split_quot_poly_comms) != 5
                    or len(pis_i[0]) != npi):
                return None
        return npi

    def _fast_scalar_rows(self, challenges_list, jobs, npi):
        """Raw 30x32B-per-proof verifier scalar rows from the C runtime,
        or None without a native runtime."""
        from ..utils import native
        p = self.p
        buf = bytearray()
        for ch, (vks_i, pis_i, bp, _x) in zip(challenges_list, jobs):
            ev = bp.poly_evals_vec[0]
            vals = [ch.tau, ch.beta, ch.gamma, ch.alpha, ch.zeta, ch.v, ch.u]
            vals += list(ev.wires_evals) + list(ev.wire_sigma_evals)
            vals.append(ev.perm_next_eval)
            vals += [int(x) % p for x in pis_i[0]]
            for v_ in vals:
                buf += int(v_).to_bytes(32, "little")
        return native.pcs_scalars_batch_raw(
            p, jobs[0][0][0].k, self.n.bit_length() - 1, self.group_gen, npi,
            bytes(buf))

    def _bv_layout(self, vk, npi):
        """(template, seg_ends, patches) for bv_assemble, cached on the vk
        (layout depends only on the vk bytes and the public-input count)."""
        cached = getattr(vk, "_bv_layout", None)
        if cached is not None and cached[0] == npi:
            return cached[1:]
        from .structs import ProofEvaluations as PE
        rec = _LayoutRecorder(self.curve)
        bp = BatchProof(
            wires_poly_comms_vec=[[_TaggedPoint(6 + i) for i in range(5)]],
            prod_perm_poly_comms_vec=[_TaggedPoint(0)],
            poly_evals_vec=[PE(
                wires_evals=[_TaggedEval(i) for i in range(5)],
                wire_sigma_evals=[_TaggedEval(5 + i) for i in range(4)],
                perm_next_eval=_TaggedEval(9))],
            plookup_proofs_vec=[None],
            split_quot_poly_comms=[_TaggedPoint(1 + i) for i in range(5)],
            opening_proof=_TaggedPoint(11),
            shifted_opening_proof=_TaggedPoint(12),
        )
        self.compute_challenges([vk], [[0] * npi], bp, None, _transcript=rec)
        import struct as _struct
        tmpl = bytes(rec.transcript)
        ends = b"".join(_struct.pack("<Q", e) for e in rec.seg_ends)
        patches = b"".join(_struct.pack("<4I", *p) for p in rec.patches)
        try:
            vk._bv_layout = (npi, tmpl, ends, patches)
        except Exception:
            pass
        return tmpl, ends, patches

    def batch_verify_fused(self, vks, public_inputs, proofs, open_key):
        """Fully-fused native batch verification: ONE bv_assemble call
        builds every proof's transcript, runs the keccak chains (AVX-512
        8-way), reduces challenges and packs the scalar/extras/bases rows;
        pcs_scalars_batch + batch_opening_msm + the 2-pairing check finish
        the job (verifier.rs:195-252).  Operates on raw Proof objects
        (shared-vk TurboPlonk shape); returns True/False, or None when
        ineligible (caller falls back)."""
        from ..utils import native
        if self.transcript_cls is not SolidityTranscript:
            return None
        if (self.p.bit_length() > 256
                or self.curve.fq.p.bit_length() > 256):
            return None
        mod = native._load()
        if (mod is None or not hasattr(mod, "bv_assemble")
                or not native.has_batch_opening_msm(self.p, self.curve.fq.p)):
            return None
        vk0 = vks[0]
        if (vk0.plookup_vk is not None or getattr(vk0, "is_merged", False)
                or vk0.domain_size != self.n
                or len(vk0.selector_comms) != 13):
            return None
        npi = len(public_inputs[0])
        for vk, pf, pi in zip(vks, proofs, public_inputs):
            if (vk is not vk0 or pf.plookup_proof is not None
                    or len(pf.wires_poly_comms) != 5
                    or len(pf.split_quot_poly_comms) != 5
                    or len(pf.poly_evals.wire_sigma_evals) != 4
                    or len(pi) != npi):
                return None
        got = native._get_fr_ctx(self.p)
        if got is None:
            return None
        tmpl, ends, patches = self._bv_layout(vk0, npi)
        p = self.p
        blobs = [proof_bv_blob(self.curve, pf) for pf in proofs]
        pib = b"".join((int(x) % p).to_bytes(32, "little")
                       for pi in public_inputs for x in pi)
        gen_b = self.group_gen.to_bytes(32, "little")
        two256 = ((1 << 256) % p).to_bytes(32, "little")
        halfq = ((self.curve.fq.p - 1) // 2).to_bytes(32, "little")
        jobs_b, extras, bases = mod.bv_assemble(
            got[1], tmpl, ends, patches, blobs, pib, gen_b, two256,
            halfq, npi)
        k = len(proofs)
        jrow = (17 + npi) * 32
        if k == 1:
            r = 1
        else:
            # r-combiner transcript (labels dropped): T = u_1 || .. || u_k
            from ..utils.keccak import keccak256
            base = (b"\x00" * 64) + b"".join(
                jobs_b[i * jrow + 192:i * jrow + 224] for i in range(k))
            st = keccak256(base + b"\x00") + keccak256(base + b"\x01")
            r = int.from_bytes(st[:48], "little") % p
        rows = native.pcs_scalars_batch_raw(
            p, vk0.k, self.n.bit_length() - 1, self.group_gen, npi, jobs_b)
        if rows is None:
            return None
        vk_bases = getattr(vk0, "_bv_vk_bases", None)
        if vk_bases is None:
            def _pt65c(pt):
                if pt.inf:
                    return b"\x00" * 64 + b"\x01"
                return (pt.x.to_bytes(32, "little")
                        + pt.y.to_bytes(32, "little") + b"\x00")
            vk_bases = b"".join(_pt65c(pt) for pt in
                                [vk0.sigma_comms[-1], *vk0.selector_comms,
                                 *vk0.sigma_comms[:4], open_key.g])
            try:
                vk0._bv_vk_bases = vk_bases
            except Exception:
                pass
        res = native.batch_opening_msm(
            p, self.curve.fq.p, rows, extras, r, vk_bases, bases)
        if res is None:
            return None
        a, b = res
        return PR.pairing_check(
            self.curve, [a, ec_neg(self.curve.fq.p, b)],
            [open_key.beta_h, open_key.h])

    def batch_verify_native(self, challenges_list, jobs, open_key):
        """Fully-native batch verification tail: scalar rows, r^i combiner
        scaling, base dedup and the A/B MSMs all run in C
        (native.batch_opening_msm); Python keeps only the transcript for r
        and the final 2-pairing check.  Requires one shared vk across the
        batch (the reference bench shape).  Returns True/False, or None
        when ineligible — pinned against the Python path in
        tests/test_serialize.py::test_native_batch_verify_parity."""
        from ..utils import native
        npi = self._fast_path_npi(jobs)
        if npi is None:
            return None
        vk0 = jobs[0][0][0]
        for (vks_i, _pi, _bp, _x) in jobs:
            if vks_i[0] is not vk0:
                return None
        # check the fused-MSM entry point exists BEFORE computing scalar
        # rows: otherwise the fallback (pcs_infos_with_challenges_batch)
        # recomputes the same rows, doubling the native work
        if not native.has_batch_opening_msm(self.p, self.curve.fq.p):
            return None
        rows = self._fast_scalar_rows(challenges_list, jobs, npi)
        if rows is None:
            return None
        p = self.p
        if len(jobs) == 1:
            r = 1
        else:
            t = SolidityTranscript(self.curve, b"batch verify")
            for ch in challenges_list:
                t.append_field(b"u", ch.u)
            r = t.get_and_append_challenge(b"r")
        gen = self.group_gen
        ex = bytearray()
        for ch in challenges_list:
            ex += ch.u.to_bytes(32, "little")
            ex += ch.zeta.to_bytes(32, "little")
            ex += (ch.zeta * gen % p).to_bytes(32, "little")

        def _pt65(pt):
            if pt.inf:
                return b"\x00" * 64 + b"\x01"
            return (pt.x.to_bytes(32, "little")
                    + pt.y.to_bytes(32, "little") + b"\x00")

        vk_bases = b"".join(_pt65(pt) for pt in
                            [vk0.sigma_comms[-1], *vk0.selector_comms,
                             *vk0.sigma_comms[:4], open_key.g])
        memo = {}

        def _pb(pt):
            hit = memo.get(id(pt))
            if hit is not None:
                return hit[1]
            v = _pt65(pt)
            # store the point itself too: the dict reference keeps it alive,
            # so a freed id() can never be reused by a different point
            memo[id(pt)] = (pt, v)
            return v

        parts = []
        for (_vks, _pi, bp, _x) in jobs:
            parts.append(_pb(bp.prod_perm_poly_comms_vec[0]))
            for c_ in bp.split_quot_poly_comms:
                parts.append(_pb(c_))
            for c_ in bp.wires_poly_comms_vec[0]:
                parts.append(_pb(c_))
            parts.append(_pb(bp.opening_proof))
            parts.append(_pb(bp.shifted_opening_proof))
        res = native.batch_opening_msm(
            p, self.curve.fq.p, rows, bytes(ex), r, vk_bases,
            b"".join(parts))
        if res is None:
            return None
        a, b = res
        return PR.pairing_check(
            self.curve, [a, ec_neg(self.curve.fq.p, b)],
            [open_key.beta_h, open_key.h])

    def pcs_infos_with_challenges_batch(self, challenges_list, jobs):
        """Batched pcs_info via the C runtime (native pcs_scalars_batch):
        the per-proof verifier field math of pcs_info_with_challenges for
        the TurboPlonk single-vk case, with one shared Montgomery batch
        inversion across all proofs.  Returns None when ineligible (plookup,
        merged circuits, heterogeneous vks/domains, no native runtime) —
        the caller falls back to the per-proof Python path, which this path
        is pinned against in tests/test_serialize.py::test_native_pcs_scalars_parity."""
        from ..utils import native
        if not jobs:
            return []
        npi = self._fast_path_npi(jobs)
        if npi is None:
            return None
        vk0 = jobs[0][0][0]
        p = self.p
        buf = bytearray()
        for ch, (vks_i, pis_i, bp, _x) in zip(challenges_list, jobs):
            ev = bp.poly_evals_vec[0]
            vals = [ch.tau, ch.beta, ch.gamma, ch.alpha, ch.zeta, ch.v, ch.u]
            vals += list(ev.wires_evals) + list(ev.wire_sigma_evals)
            vals.append(ev.perm_next_eval)
            vals += [int(x) % p for x in pis_i[0]]
            for v_ in vals:
                buf += int(v_).to_bytes(32, "little")
        rows = native.pcs_scalars_batch(
            p, vk0.k, self.n.bit_length() - 1, self.group_gen, npi,
            bytes(buf))
        if rows is None:
            return None
        infos = []
        for row, ch, (vks_i, pis_i, bp, _x) in zip(rows, challenges_list,
                                                   jobs):
            vk = vks_i[0]
            sb = ScalarsAndBases()
            sb.push(row[0], bp.prod_perm_poly_comms_vec[0])
            sb.push(row[1], vk.sigma_comms[-1])
            for sc, comm in zip(row[2:15], vk.selector_comms):
                sb.push(sc, comm)
            for sc, comm in zip(row[15:20], bp.split_quot_poly_comms):
                sb.push(sc, comm)
            for sc, comm in zip(row[20:25], bp.wires_poly_comms_vec[0]):
                sb.push(sc, comm)
            for sc, comm in zip(row[25:29], vk.sigma_comms[:4]):
                sb.push(sc, comm)
            sb.push(ch.u, bp.prod_perm_poly_comms_vec[0])
            infos.append(PcsInfo(
                u=ch.u,
                eval_point=ch.zeta,
                next_eval_point=ch.zeta * self.group_gen % p,
                eval=row[29],
                comm_scalars_and_bases=sb,
                opening_proof=bp.opening_proof,
                shifted_opening_proof=bp.shifted_opening_proof,
            ))
        return infos

    @staticmethod
    def batch_verify_opening_proofs(curve: CurveSpec, open_key, pcs_infos) -> bool:
        """verifier.rs:195-251."""
        p = curve.fr.p
        fq_p = curve.fq.p
        if len(pcs_infos) == 1:
            r = 1
        else:
            t = SolidityTranscript(curve, b"batch verify")
            for info in pcs_infos:
                t.append_field(b"u", info.u)
            r = t.get_and_append_challenge(b"r")
        # A = sum r^i (W_i + u_i W'_i)
        inners = ScalarsAndBases()
        r_base = 1
        for info in pcs_infos:
            inners.push(r_base, info.opening_proof)
            inners.push(r_base * info.u % p, info.shifted_opening_proof)
            r_base = r_base * r % p
        a = inners.multi_scalar_mul(fq_p, p)
        # B = sum r^i (C_i + z_i W_i + u_i z_i' W'_i - eval_i G)
        inners = ScalarsAndBases()
        r_base = 1
        sum_evals = 0
        for info in pcs_infos:
            inners.merge(r_base, info.comm_scalars_and_bases, p)
            inners.push(r_base * info.eval_point % p, info.opening_proof)
            inners.push(r_base * info.u % p * info.next_eval_point % p,
                        info.shifted_opening_proof)
            sum_evals = (sum_evals + r_base * info.eval) % p
            r_base = r_base * r % p
        inners.push((p - sum_evals) % p, open_key.g)
        b = inners.multi_scalar_mul(fq_p, p)
        # e(A, [x]2) == e(B, [1]2)
        return PR.pairing_check(
            curve, [a, ec_neg(fq_p, b)], [open_key.beta_h, open_key.h])
