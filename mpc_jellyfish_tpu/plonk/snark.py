"""PlonkKzgSnark: universal setup / preprocess / prove / verify.

Mirror of `plonk/src/proof_system/snark.rs` (UniversalSNARK impl), driving
the device prover (`prover.py`) with a host-side Solidity transcript, and the
host verifier (`verifier.py`).  The 5.5-round schedule and transcript message
order follow `batch_prove_internal` (snark.rs:201-469) exactly.
"""

from __future__ import annotations

import os
import random
import sys
import time

_TRACE = os.environ.get("MPC_JELLYFISH_TPU_TRACE", "") == "1"


def _tr(label, t0):
    if _TRACE:
        import jax
        print(f"    [prove] {label}: {time.time() - t0:.2f}s",
              file=sys.stderr, flush=True)
    return time.time()

from ..curves import CurveSpec
from ..ops import field as F
from ..ops import ntt as N
from ..pcs import kzg
from .prover import Prover, _const
from .structs import (BatchProof, Challenges, LinkingHint, Oracles, Proof,
                      ProvingKey, VerifyingKey)
from .transcript import SolidityTranscript, EXTRA_TRANSCRIPT_MSG_LABEL
from .verifier import Verifier

GATE_WIDTH = 4


class PlonkError(Exception):
    pass


class WrongProof(PlonkError):
    pass


class PlonkKzgSnark:
    """TurboPlonk SNARK over a KZG PCS (UltraPlonk arrives with Plookup)."""

    def __init__(self, curve: CurveSpec, transcript_cls=SolidityTranscript,
                 backend=None):
        """`backend`: prover kernel backend (parallel/backend.py);
        None = single-chip, ShardedBackend(mesh) = mesh-parallel."""
        self.curve = curve
        self.spec = curve.fr
        self.transcript_cls = transcript_cls
        self.backend = backend

    # -- setup / preprocess ----------------------------------------------
    def universal_setup_for_testing(self, max_degree: int, seed: int = 0):
        return kzg.universal_setup_for_testing(self.curve, max_degree, seed)

    def preprocess(self, srs, circuit):
        """Compute ProvingKey/VerifyingKey (snark.rs:529-617)."""
        spec = self.spec
        circuit.finalize_for_arithmetization()
        n = circuit.eval_domain_size()
        if srs.max_degree < circuit.srs_size():
            raise PlonkError("SRS too small for circuit")
        domain = N.Domain(spec, n)

        t0 = time.time()
        ck, open_key = srs.trim(circuit.srs_size())
        t0 = _tr("preprocess: trim", t0)

        selector_polys = []
        for col in circuit.all_selectors():
            evals = spec.to_device(col)
            selector_polys.append(N.intt(domain, evals))
        sigma_evals_host = circuit.extended_permutation()
        sigma_polys = []
        sigma_evals_dev = []
        for col in sigma_evals_host:
            evals = spec.to_device(col)
            sigma_evals_dev.append(evals)
            sigma_polys.append(N.intt(domain, evals))
        t0 = _tr("preprocess: selector/sigma iNTTs", t0)

        all_comms = kzg.commit_batch(ck, selector_polys + sigma_polys)
        t0 = _tr("preprocess: commits", t0)
        selector_comms = all_comms[:len(selector_polys)]
        sigma_comms = all_comms[len(selector_polys):]

        plookup_pk = None
        plookup_vk = None
        if circuit.support_lookup():
            from .structs import PlookupProvingKey, PlookupVerifyingKey
            import jax.numpy as jnp
            tbl_evals = [
                spec.to_device(circuit.range_table_vector()),
                spec.to_device(circuit.key_table_vector()),
                spec.to_device(circuit.table_dom_sep_vector()),
                spec.to_device(circuit.q_dom_sep_vector()),
            ]
            tbl_polys = [N.intt(domain, e) for e in tbl_evals]
            tbl_comms = kzg.commit_batch(ck, tbl_polys)
            # static eval columns for the device-side round-1.5 merge;
            # q_lookup is the last selector column by construction
            q_lookup_evals = spec.to_device(circuit.all_selectors()[-1])
            plookup_pk = PlookupProvingKey(
                range_table_poly=tbl_polys[0], key_table_poly=tbl_polys[1],
                table_dom_sep_poly=tbl_polys[2], q_dom_sep_poly=tbl_polys[3],
                eval_tables=jnp.stack(
                    tbl_evals + [q_lookup_evals], axis=1))
            plookup_vk = PlookupVerifyingKey(
                range_table_comm=tbl_comms[0], key_table_comm=tbl_comms[1],
                table_dom_sep_comm=tbl_comms[2], q_dom_sep_comm=tbl_comms[3])

        vk = VerifyingKey(
            domain_size=n,
            num_inputs=circuit.num_inputs(),
            selector_comms=selector_comms,
            sigma_comms=sigma_comms,
            k=list(circuit.k),
            open_key=open_key,
            plookup_vk=plookup_vk,
            is_merged=False,
        )
        pk = ProvingKey(sigmas=sigma_polys, selectors=selector_polys,
                        commit_key=ck, vk=vk, plookup_pk=plookup_pk)
        # device-side eval-domain data for the grand product (round 2)
        pk.sigma_evals = sigma_evals_dev
        id_host = circuit.extended_id_permutation
        pk.id_evals = [spec.to_device(id_host[i * n:(i + 1) * n])
                       for i in range(circuit.num_wire_types)]
        _tr("preprocess: tail (vk/id-evals)", t0)
        return pk, vk

    # -- prove -------------------------------------------------------------
    def prove(self, circuit, pk: ProvingKey, rng=None, mask: bool = True,
              extra_transcript_init_msg: bytes | None = None) -> Proof:
        batch_proof, _, _ = self.batch_prove_internal(
            [circuit], [pk], rng, mask, extra_transcript_init_msg)
        return Proof(
            wires_poly_comms=batch_proof.wires_poly_comms_vec[0],
            prod_perm_poly_comm=batch_proof.prod_perm_poly_comms_vec[0],
            split_quot_poly_comms=batch_proof.split_quot_poly_comms,
            opening_proof=batch_proof.opening_proof,
            shifted_opening_proof=batch_proof.shifted_opening_proof,
            poly_evals=batch_proof.poly_evals_vec[0],
            plookup_proof=batch_proof.plookup_proofs_vec[0],
        )

    def prove_with_link_hint(self, circuit, pk: ProvingKey, rng=None,
                             mask: bool = True):
        """snark.rs:81-114; link wire is wire PROOF_LINK_WIRE_IDX = 4."""
        from ..relation.proof_linking import PROOF_LINK_WIRE_IDX
        batch_proof, oracles, _ = self.batch_prove_internal(
            [circuit], [pk], rng, mask, None)
        hint = LinkingHint(
            linking_wire_poly=oracles[0].wire_polys[PROOF_LINK_WIRE_IDX],
            linking_wire_comm=batch_proof.wires_poly_comms_vec[0][PROOF_LINK_WIRE_IDX],
        )
        proof = Proof(
            wires_poly_comms=batch_proof.wires_poly_comms_vec[0],
            prod_perm_poly_comm=batch_proof.prod_perm_poly_comms_vec[0],
            split_quot_poly_comms=batch_proof.split_quot_poly_comms,
            opening_proof=batch_proof.opening_proof,
            shifted_opening_proof=batch_proof.shifted_opening_proof,
            poly_evals=batch_proof.poly_evals_vec[0],
            plookup_proof=batch_proof.plookup_proofs_vec[0],
        )
        return proof, hint

    def batch_prove(self, circuits, pks, rng=None, mask: bool = True) -> BatchProof:
        bp, _, _ = self.batch_prove_internal(circuits, pks, rng, mask, None)
        return bp

    def _device_fs_eligible(self, circuits, pks) -> bool:
        """Device-resident Fiat-Shamir: single-circuit TurboPlonk proves on
        the TPU keep the whole round chain (keccak transcript included) on
        device — zero host synchronization until the final proof fetch
        (~30ms x 5 rounds of device->host latency through the remote
        tunnel otherwise).  Env override MPC_JELLYFISH_TPU_DEVICE_FS=0/1."""
        # Default ON for TPU backends since round 5: the round-4 loss
        # (16.5s/prove, bench_r4_16.log) was EAGER transcript dispatch —
        # hundreds of per-op tunnel round trips.  With the fused lazy
        # transcript (one cached-jit program per squeeze) the same path
        # measures 0.24s at 2^14 (vs 0.53s host-FS) and 0.73s at 2^16
        # (vs ~1.05s): bench_r5_14dfs.log / bench_r5_16dfs.log.
        # MPC_JELLYFISH_TPU_DEVICE_FS=0 forces the host transcript,
        # =1 forces device-FS on any backend (tests use this on CPU).
        env = os.environ.get("MPC_JELLYFISH_TPU_DEVICE_FS", "")
        if env == "0":
            return False
        if len(circuits) != 1 or circuits[0].support_lookup():
            return False
        if self.transcript_cls is not SolidityTranscript:
            return False
        if self.backend is not None:
            return False
        fr, fq = self.curve.fr, self.curve.fq
        if 2 * fr.num_limbs != 32 or 2 * fq.num_limbs != \
                (fq.p.bit_length() + 7) // 8:
            return False
        if env == "1":
            return True
        import jax
        try:
            return jax.default_backend() == "tpu"
        except Exception:  # pragma: no cover
            return False

    def batch_prove_internal(self, circuits, pks, rng=None, mask: bool = True,
                             extra_transcript_init_msg: bytes | None = None):
        """The 5.5-round protocol (snark.rs:201-469), TurboPlonk path."""
        if not circuits or len(circuits) != len(pks):
            raise PlonkError("inconsistent circuits/pks")
        if rng is None:
            rng = random.Random(0)
        if self._device_fs_eligible(circuits, pks):
            prover = self._get_prover(circuits[0])
            if prover._fusable:
                return self._prove_device_fs(
                    circuits[0], pks[0], prover, rng, mask,
                    extra_transcript_init_msg)
        spec = self.spec
        p = spec.p
        n = circuits[0].eval_domain_size()
        num_wire_types = circuits[0].num_wire_types
        for c, pk in zip(circuits, pks):
            if c.eval_domain_size() != n or pk.domain_size() != n:
                raise PlonkError("domain size mismatch")
            if c.num_inputs() != pk.vk.num_inputs:
                raise PlonkError("num_inputs mismatch")
            if c.num_wire_types != num_wire_types:
                raise PlonkError("wire type mismatch")

        t0 = time.time()
        transcript = self.transcript_cls(self.curve)
        if extra_transcript_init_msg is not None:
            transcript.append_message(EXTRA_TRANSCRIPT_MSG_LABEL,
                                      extra_transcript_init_msg)
        for pk, c in zip(pks, circuits):
            transcript.append_vk_and_pub_input(pk.vk, c.public_input())
        t0 = _tr("transcript init", t0)

        challenges = Challenges()
        oracles_list = [Oracles() for _ in circuits]
        # one Prover per (n, W): keeps its cached per-domain coset constants
        # (device tensors) alive across repeated proves
        cache = getattr(self, "_prover_cache", None)
        if cache is None:
            cache = self._prover_cache = {}
        prover = cache.get((n, num_wire_types))
        if prover is None:
            prover = Prover(spec, n, num_wire_types, backend=self.backend)
            cache[(n, num_wire_types)] = prover

        # Round 1
        wires_poly_comms_vec = []
        wire_values_list = []
        for i, c in enumerate(circuits):
            # one upload for all wire columns + the public-input vector;
            # cached on the circuit for repeated proving of the same witness
            cache = getattr(c, "_device_cache", None)
            if cache is None:
                W = c.num_wire_types
                cols = c.wire_values()
                flat = [v for col in cols for v in col] + c.pub_input_vector()
                all_dev = spec.to_device(flat)
                wv = all_dev[:, :W * n].reshape(spec.num_limbs, W, n)
                pi = all_dev[:, W * n:]
                cache = (wv, pi)
                c._device_cache = cache
            wv, pi = cache
            t0 = _tr("r1: witness cache/upload", t0)
            wire_values = [wv[:, j] for j in range(c.num_wire_types)]
            wire_values_list.append(wire_values)
            comms, polys = prover.run_1st_round(pks[i].commit_key, wv, rng, mask)
            t0 = _tr("r1: round body", t0)
            oracles_list[i].pub_inp_poly = prover.pub_input_poly(pi)
            oracles_list[i].wire_polys = polys
            t0 = _tr("r1: pi poly", t0)
            transcript.append_commitments(b"witness_poly_comms", comms)
            wires_poly_comms_vec.append(comms)
        t0 = _tr("round 1 (wires)", t0)

        # Round 1.5: Plookup sorted vectors (snark.rs:291-316)
        challenges.tau = transcript.get_and_append_challenge(b"tau")
        h_poly_comms_vec = [None] * len(circuits)
        merged_table_list = [None] * len(circuits)
        sorted_dev_list = [None] * len(circuits)
        lookup_wire_list = [None] * len(circuits)
        for i, c in enumerate(circuits):
            if c.support_lookup():
                from .structs import PlookupOracles
                import jax.numpy as jnp
                # merged table/wire values AND the sort order on DEVICE
                # (round-3 pulled both vectors to the host and dict-walked
                # them per prove — the UltraPlonk margin); the sorted
                # vector is a device gather of the merged table
                mt_dev, ml_dev = prover.plookup_merge(
                    pks[i], wire_values_list[i], challenges.tau)
                idx_dev, ok = prover.plookup_sorted_indices_dev(
                    mt_dev, ml_dev)
                if not bool(ok):
                    from ..relation.circuit import CircuitError
                    raise CircuitError(
                        "lookup variable outside the table "
                        "(sorted vector length mismatch)")
                sorted_dev = jnp.take(mt_dev, idx_dev, axis=1)
                comms, h_polys = prover.run_plookup_1st_round(
                    pks[i].commit_key, sorted_dev, rng, mask)
                oracles_list[i].plookup_oracles = PlookupOracles(h_polys=h_polys)
                transcript.append_commitments(b"h_poly_comms", comms)
                h_poly_comms_vec[i] = comms
                merged_table_list[i] = mt_dev
                sorted_dev_list[i] = sorted_dev
                lookup_wire_list[i] = ml_dev

        # Round 2
        challenges.beta = transcript.get_and_append_challenge(b"beta")
        challenges.gamma = transcript.get_and_append_challenge(b"gamma")
        prod_perm_poly_comms_vec = []
        for i, c in enumerate(circuits):
            comm, poly = prover.run_2nd_round(
                pks[i].commit_key, wire_values_list[i], pks[i].id_evals,
                pks[i].sigma_evals, challenges.beta, challenges.gamma, rng, mask)
            oracles_list[i].prod_perm_poly = poly
            transcript.append_commitment(b"perm_poly_comms", comm)
            prod_perm_poly_comms_vec.append(comm)
        t0 = _tr("round 2 (grand product)", t0)

        # Round 2.5: Plookup grand product (snark.rs:335-356)
        prod_lookup_poly_comms_vec = [None] * len(circuits)
        for i, c in enumerate(circuits):
            if c.support_lookup():
                comm, poly = prover.run_plookup_2nd_round(
                    pks[i].commit_key, challenges, merged_table_list[i],
                    sorted_dev_list[i], lookup_wire_list[i], rng, mask)
                oracles_list[i].plookup_oracles.prod_lookup_poly = poly
                transcript.append_commitment(b"plookup_poly_comms", comm)
                prod_lookup_poly_comms_vec[i] = comm

        # Round 3
        challenges.alpha = transcript.get_and_append_challenge(b"alpha")
        alpha3 = pow(challenges.alpha, 3, p)
        alpha7 = pow(challenges.alpha, 7, p)
        quot_sum = None
        alpha_base = 1
        alpha_bases = []
        for i, c in enumerate(circuits):
            alpha_bases.append(alpha_base)
            quot = prover.compute_quotient_coset_evals(pks[i], challenges,
                                                       oracles_list[i])
            if quot_sum is None:
                quot_sum = quot
            else:
                quot_sum = F.add(spec, quot_sum,
                                 F.mul(spec, quot, _const(spec, alpha_base)))
            alpha_base = alpha_base * (alpha7 if c.support_lookup() else alpha3) % p
        t0 = _tr("round 3a (quotient evals)", t0)
        split_quot_poly_comms, split_quot_polys = prover.run_3rd_round(
            pks[0].commit_key, quot_sum, rng, mask)
        transcript.append_commitments(b"quot_poly_comms", split_quot_poly_comms)
        t0 = _tr("round 3b (split+commit)", t0)

        # Round 4
        challenges.zeta = transcript.get_and_append_challenge(b"zeta")
        poly_evals_vec = []
        for i in range(len(circuits)):
            evals = prover.compute_evaluations(pks[i], challenges, oracles_list[i])
            transcript.append_proof_evaluations(evals)
            poly_evals_vec.append(evals)
        t0 = _tr("round 4 (evals)", t0)

        # Round 4.5: Plookup evaluations
        plookup_evals_vec = [None] * len(circuits)
        for i, c in enumerate(circuits):
            if c.support_lookup():
                pevals = prover.compute_plookup_evaluations(
                    pks[i], challenges, oracles_list[i])
                transcript.append_plookup_evaluations(pevals)
                plookup_evals_vec[i] = pevals

        lin_poly = prover.compute_lin_poly(
            alpha_bases, pks, challenges, oracles_list, poly_evals_vec,
            split_quot_polys, plookup_evals_vec)
        t0 = _tr("lin poly", t0)

        # Round 5
        challenges.v = transcript.get_and_append_challenge(b"v")
        opening_proof, shifted_opening_proof = prover.compute_opening_proofs(
            pks[0].commit_key, pks, challenges.zeta, challenges.v, oracles_list,
            lin_poly)
        t0 = _tr("round 5 (openings)", t0)

        plookup_proofs_vec = []
        for i, c in enumerate(circuits):
            if c.support_lookup():
                from .structs import PlookupProof
                plookup_proofs_vec.append(PlookupProof(
                    h_poly_comms=h_poly_comms_vec[i],
                    prod_lookup_poly_comm=prod_lookup_poly_comms_vec[i],
                    poly_evals=plookup_evals_vec[i],
                ))
            else:
                plookup_proofs_vec.append(None)

        return (
            BatchProof(
                wires_poly_comms_vec=wires_poly_comms_vec,
                prod_perm_poly_comms_vec=prod_perm_poly_comms_vec,
                poly_evals_vec=poly_evals_vec,
                plookup_proofs_vec=plookup_proofs_vec,
                split_quot_poly_comms=split_quot_poly_comms,
                opening_proof=opening_proof,
                shifted_opening_proof=shifted_opening_proof,
            ),
            oracles_list,
            challenges,
        )

    def _get_prover(self, circuit):
        n = circuit.eval_domain_size()
        W = circuit.num_wire_types
        cache = getattr(self, "_prover_cache", None)
        if cache is None:
            cache = self._prover_cache = {}
        prover = cache.get((n, W))
        if prover is None:
            prover = Prover(self.spec, n, W, backend=self.backend)
            cache[(n, W)] = prover
        return prover

    def _prove_device_fs(self, circuit, pk, prover, rng, mask,
                         extra_transcript_init_msg):
        """Single-circuit TurboPlonk prove with the Fiat-Shamir chain ON
        DEVICE (see _device_fs_eligible).  Byte-identical proofs to the
        host-transcript path: same serialization, same challenge math,
        same rng draw order — only the synchronization points move."""
        from .device_transcript import DeviceSolidityTranscript
        import jax
        import jax.numpy as jnp
        spec = self.spec
        n = circuit.eval_domain_size()
        W = circuit.num_wire_types
        n3 = n + 3
        t0 = time.time()

        # host-known byte prefix (vk + public inputs), serialized exactly
        # as the host transcript would
        ht = self.transcript_cls(self.curve)
        if extra_transcript_init_msg is not None:
            ht.append_message(EXTRA_TRANSCRIPT_MSG_LABEL,
                              extra_transcript_init_msg)
        ht.append_vk_and_pub_input(pk.vk, circuit.public_input())
        dtr = DeviceSolidityTranscript(self.curve)
        dtr.append_host_bytes(bytes(ht.transcript))
        t0 = _tr("dfs: transcript init", t0)

        cache = getattr(circuit, "_device_cache", None)
        if cache is None:
            cols = circuit.wire_values()
            flat = [v for col in cols for v in col] \
                + circuit.pub_input_vector()
            all_dev = spec.to_device(flat)
            wv = all_dev[:, :W * n].reshape(spec.num_limbs, W, n)
            pi = all_dev[:, W * n:]
            circuit._device_cache = cache = (wv, pi)
        wv, pi = cache
        oracles = Oracles()

        def comm_i(batch, i):
            x, y, inf = batch
            return (x[:, i:i + 1], y[:, i:i + 1], inf[i:i + 1])

        # round 1
        comms1, polys = prover.run_1st_round(pk.commit_key, wv, rng, mask,
                                             dev_comms=True)
        oracles.pub_inp_poly = prover.pub_input_poly(pi)
        oracles.wire_polys = polys
        dtr.append_commitments_dev(comms1)
        _ = dtr.get_and_append_challenge_dev()      # tau (unused in Turbo)
        t0 = _tr("dfs: round 1", t0)

        # round 2
        beta = dtr.get_and_append_challenge_dev()
        gamma = dtr.get_and_append_challenge_dev()
        comms2, z_poly = prover.run_2nd_round(
            pk.commit_key, [wv[:, j] for j in range(W)], pk.id_evals,
            pk.sigma_evals, beta, gamma, rng, mask, dev_comms=True)
        oracles.prod_perm_poly = z_poly
        dtr.append_commitments_dev(comms2)     # k=1: the grand-product comm
        t0 = _tr("dfs: round 2", t0)

        # round 3
        alpha = dtr.get_and_append_challenge_dev()
        consts = prover.quotient_consts_dev(pk, alpha, beta, gamma)
        quot = prover.compute_quotient_coset_evals(pk, None, oracles,
                                                   consts=consts)
        comms3, split_polys = prover.run_3rd_round(pk.commit_key, quot, rng,
                                                   mask, dev_comms=True)
        dtr.append_commitments_dev(comms3)
        t0 = _tr("dfs: round 3", t0)

        # round 4
        zeta = dtr.get_and_append_challenge_dev()
        allv = prover.compute_evaluations_dev(pk, zeta, oracles)
        dtr.append_fields_dev(allv)
        lin_coeffs = prover.lin_coeffs_dev(pk, alpha, beta, gamma, zeta,
                                           allv)
        lin_polys = (list(split_polys) + list(pk.selectors)
                     + [oracles.prod_perm_poly, pk.sigmas[W - 1]])
        lin_poly = prover._scale_sum(lin_polys, lin_coeffs, n3)
        t0 = _tr("dfs: round 4 + lin", t0)

        # round 5
        v = dtr.get_and_append_challenge_dev()
        comms5, _ = prover.compute_opening_proofs(
            pk.commit_key, [pk], zeta, v, [oracles], lin_poly,
            dev_comms=True)
        t0 = _tr("dfs: round 5 (openings)", t0)

        # ONE synchronization: fetch commitments + evaluations together
        fetched = jax.device_get((comms1, comms2, comms3, comms5, allv))
        h1, h2, h3, h5, av = fetched

        def to_points(batch):
            from ..utils.ec_host import AffinePoint
            x, y, inf = batch
            import numpy as np
            k = x.shape[1]
            out = []
            for i in range(k):
                if bool(inf[i]):
                    out.append(AffinePoint.infinity())
                else:
                    out.append(AffinePoint(
                        spec_int(self.curve.fq, x[:, i]),
                        spec_int(self.curve.fq, y[:, i])))
            return out

        def spec_int(fq, limbs):
            # canonical int from MONTGOMERY limbs (host-side demont)
            R_inv = pow(1 << (16 * fq.num_limbs), -1, fq.p)
            v_ = 0
            for j in range(fq.num_limbs - 1, -1, -1):
                v_ = (v_ << 16) | int(limbs[j])
            return v_ * R_inv % fq.p

        wires_comms = to_points(h1)
        z_comm = to_points(h2)[0]
        split_comms = to_points(h3)
        open_comms = to_points(h5)
        r_inv = pow(1 << (16 * spec.num_limbs), -1, spec.p)

        def fr_int(col):
            v_ = 0
            for j in range(spec.num_limbs - 1, -1, -1):
                v_ = (v_ << 16) | int(col[j])
            return v_ * r_inv % spec.p

        from .structs import ProofEvaluations as PE
        host_evals = [fr_int(av[:, i]) for i in range(2 * W)]
        pe = PE(wires_evals=host_evals[:W],
                wire_sigma_evals=host_evals[W:2 * W - 1],
                perm_next_eval=host_evals[2 * W - 1])
        t0 = _tr("dfs: final fetch", t0)

        bp = BatchProof(
            wires_poly_comms_vec=[wires_comms],
            prod_perm_poly_comms_vec=[z_comm],
            poly_evals_vec=[pe],
            plookup_proofs_vec=[None],
            split_quot_poly_comms=split_comms,
            opening_proof=open_comms[0],
            shifted_opening_proof=open_comms[1],
        )
        return bp, [oracles], Challenges()

    # -- verify ------------------------------------------------------------
    def verify(self, vk: VerifyingKey, public_input, proof: Proof,
               extra_transcript_init_msg: bytes | None = None):
        """Raises WrongProof on failure; returns True on success."""
        return self.batch_verify([vk], [public_input], [proof],
                                 [extra_transcript_init_msg])

    def batch_verify(self, vks, public_inputs, proofs,
                     extra_transcript_init_msgs=None):
        """snark.rs:141-190."""
        if extra_transcript_init_msgs is None:
            extra_transcript_init_msgs = [None] * len(proofs)
        if not (len(vks) == len(proofs) == len(public_inputs)
                == len(extra_transcript_init_msgs)):
            raise PlonkError("inconsistent verify inputs")
        if not vks:
            raise PlonkError("empty verify batch")
        # Optional dedup of identical (vk, public_input, proof, extra)
        # instances: their Fiat-Shamir transcripts — hence challenges,
        # scalars and pairing checks — are bit-identical, so verifying the
        # distinct set verifies the whole batch.  OFF by default: the
        # reference (snark.rs:141-190) does full per-instance work, so any
        # benchmark comparison must too.  Opt in for real duplicate-heavy
        # workloads (e.g. relays deduplicating gossip) with
        # MPCJF_BATCH_VERIFY_DEDUP=1.
        uniq = list(zip(vks, proofs, public_inputs,
                        extra_transcript_init_msgs))
        if os.environ.get("MPCJF_BATCH_VERIFY_DEDUP", "0") == "1":
            seen = {}
            for vk, proof, pi, extra in uniq:
                try:
                    key = (id(vk), id(proof),
                           tuple(int(x) for x in pi), extra)
                except (TypeError, ValueError):
                    key = (id(vk), id(proof), id(pi), extra)
                if key not in seen:
                    seen[key] = (vk, proof, pi, extra)
            uniq = list(seen.values())
        # fully-fused native path (one bv_assemble call for transcripts +
        # challenges + scalar rows; shared-vk TurboPlonk, no extra msgs)
        if all(x[3] is None for x in uniq):
            v0 = Verifier(self.curve, uniq[0][0].domain_size,
                          self.transcript_cls)
            fused = v0.batch_verify_fused(
                [x[0] for x in uniq], [x[2] for x in uniq],
                [x[1] for x in uniq], uniq[0][0].open_key)
            if fused is not None:
                if not fused:
                    raise WrongProof("proof verification failed")
                return True
        verifiers, jobs = [], []
        for vk, proof, pi, extra in uniq:
            verifiers.append(
                Verifier(self.curve, vk.domain_size, self.transcript_cls))
            jobs.append(([vk], [pi], BatchProof.from_proof(proof), extra))
        # Fiat-Shamir chains for the whole batch at once (native keccak,
        # pthread-parallel); falls back to per-proof hashing without C.
        challenges_list = verifiers[0].compute_challenges_batch(jobs)
        # fully-native tail (scalars + combiner + dedup + MSMs in C) for the
        # shared-vk TurboPlonk shape; ineligible batches fall through
        fast = verifiers[0].batch_verify_native(
            challenges_list, jobs, vks[0].open_key)
        if fast is not None:
            if not fast:
                raise WrongProof("proof verification failed")
            return True
        # batched native scalar path (Turbo single-vk); per-proof fallback
        pcs_infos = verifiers[0].pcs_infos_with_challenges_batch(
            challenges_list, jobs)
        if pcs_infos is None:
            pcs_infos = [
                verifier.pcs_info_with_challenges(ch, vks_i, pis_i, bp)
                for verifier, ch, (vks_i, pis_i, bp, _) in zip(
                    verifiers, challenges_list, jobs)]
        if not Verifier.batch_verify_opening_proofs(
                self.curve, vks[0].open_key, pcs_infos):
            raise WrongProof("proof verification failed")
        return True

    def verify_batch_proof(self, vks, public_inputs, batch_proof: BatchProof):
        """snark.rs:117-138 (one aggregated proof, many instances)."""
        verifier = Verifier(self.curve, vks[0].domain_size, self.transcript_cls)
        pcs_info = verifier.prepare_pcs_info(vks, public_inputs, batch_proof, None)
        if not Verifier.batch_verify_opening_proofs(
                self.curve, vks[0].open_key, [pcs_info]):
            raise WrongProof("batch proof verification failed")
        return True
