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

    def batch_prove_internal(self, circuits, pks, rng=None, mask: bool = True,
                             extra_transcript_init_msg: bytes | None = None):
        """The 5.5-round protocol (snark.rs:201-469), TurboPlonk path."""
        if not circuits or len(circuits) != len(pks):
            raise PlonkError("inconsistent circuits/pks")
        if rng is None:
            rng = random.Random(0)
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
        verifiers, jobs = [], []
        for vk, proof, pi, extra in zip(vks, proofs, public_inputs,
                                        extra_transcript_init_msgs):
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
