"""Proof serialization round-trips (CanonicalSerialize layout + tagged-b64).

Reference: utilities/src/serialize.rs (CanonicalBytes, tagged-base64 blobs),
plonk/src/proof_system/structs.rs:59 (#[tagged(tag::PROOF)]).
"""

import random

import pytest

from mpc_jellyfish_tpu.curves import BN254
from mpc_jellyfish_tpu.utils import serialize as S
from mpc_jellyfish_tpu.utils import ec_host as E


def _rand_proof(rng, lookup=False):
    from mpc_jellyfish_tpu.plonk.structs import (
        Proof, ProofEvaluations, PlookupProof, PlookupEvaluations)
    p, r = BN254.fq.p, BN254.fr.p
    g = E.AffinePoint(*BN254.g1_gen)
    pt = lambda: E.ec_mul(p, g, rng.randrange(2, 1 << 40))
    f = lambda: rng.randrange(r)
    pl = None
    if lookup:
        pl = PlookupProof(h_poly_comms=[pt(), pt()],
                          prod_lookup_poly_comm=pt(),
                          poly_evals=PlookupEvaluations(
                              *[f() for _ in range(15)]))
    return Proof(
        wires_poly_comms=[pt() for _ in range(5)],
        prod_perm_poly_comm=pt(),
        split_quot_poly_comms=[pt() for _ in range(5)],
        opening_proof=pt(),
        shifted_opening_proof=E.AffinePoint.infinity(),
        poly_evals=ProofEvaluations(
            wires_evals=[f() for _ in range(5)],
            wire_sigma_evals=[f() for _ in range(4)],
            perm_next_eval=f()),
        plookup_proof=pl)


class TestProofSerialization:
    @pytest.mark.parametrize("lookup", [False, True])
    def test_round_trip(self, lookup):
        rng = random.Random(41)
        proof = _rand_proof(rng, lookup)
        data = S.proof_to_bytes(BN254, proof)
        back = S.proof_from_bytes(BN254, data)
        assert back == proof
        assert S.proof_to_bytes(BN254, back) == data

    def test_tagged_b64(self):
        rng = random.Random(42)
        proof = _rand_proof(rng, True)
        s = S.proof_to_tagged_b64(BN254, proof)
        assert s.startswith("PROOF~")
        assert S.proof_from_tagged_b64(BN254, s) == proof
        # flipped char -> checksum/parse failure
        mid = len(s) // 2
        bad = s[:mid] + ("A" if s[mid] != "A" else "B") + s[mid + 1:]
        with pytest.raises(Exception):
            S.proof_from_tagged_b64(BN254, bad)

    def test_tagged_b64_raw(self):
        tag, data = S.tagged_base64_decode(
            S.tagged_base64_encode("VERKEY", b"\x01\x02\xff"))
        assert (tag, data) == ("VERKEY", b"\x01\x02\xff")


def test_native_pcs_scalars_parity():
    """The C pcs_scalars_batch path must produce the same PcsInfo
    (scalar/base multiset and aggregated eval) as the per-proof Python
    verifier math it replaces (plonk/verifier.py pcs_info_with_challenges)."""
    import random
    from mpc_jellyfish_tpu.curves import BN254
    from mpc_jellyfish_tpu.plonk.snark import PlonkKzgSnark
    from mpc_jellyfish_tpu.plonk.verifier import Verifier, BatchProof
    from mpc_jellyfish_tpu.pcs import kzg
    from mpc_jellyfish_tpu.relation.circuit import PlonkCircuit

    spec = BN254.fr
    rng = random.Random(3)
    cs = PlonkCircuit(spec)
    vals = [cs.create_variable(rng.randrange(spec.p)) for _ in range(4)]
    acc = vals[0]
    while cs.num_gates() < 40:
        acc = cs.mul(acc, vals[cs.num_gates() % 4])
    out = cs.create_public_variable(cs.witness_of(acc))
    cs.enforce_equal(acc, out)
    cs.finalize_for_arithmetization()
    snark = PlonkKzgSnark(BN254)
    srs = kzg.universal_setup_for_testing(BN254, cs.srs_size(), seed=9)
    pk, vk = snark.preprocess(srs, cs)
    proofs = [snark.prove(cs, pk, rng=random.Random(i), mask=True)
              for i in range(3)]

    verifier = Verifier(BN254, vk.domain_size)
    jobs = [([vk], [cs.public_input()], BatchProof.from_proof(pf), None)
            for pf in proofs]
    chs = verifier.compute_challenges_batch(jobs)
    fast = verifier.pcs_infos_with_challenges_batch(chs, jobs)
    if fast is None:
        import pytest
        pytest.skip("native runtime unavailable")
    for ch, (vks_i, pis_i, bp, _), fi in zip(chs, jobs, fast):
        ref = verifier.pcs_info_with_challenges(ch, vks_i, pis_i, bp)
        assert fi.eval == ref.eval
        assert fi.u == ref.u and fi.eval_point == ref.eval_point
        assert fi.next_eval_point == ref.next_eval_point

        def as_map(sb):
            m = {}
            for s, b in sb.pairs:
                key = (b.x, b.y, b.inf)
                m[key] = (m.get(key, 0) + s) % spec.p
            return m
        assert as_map(fi.comm_scalars_and_bases) == as_map(
            ref.comm_scalars_and_bases)


def test_native_batch_verify_parity():
    """The fully-native batch-verify tail (batch_opening_msm: r^i scaling,
    base dedup, A/B MSMs in C) must agree with the Python
    ScalarsAndBases/batch_verify_opening_proofs path on accept AND reject,
    for distinct proofs sharing one vk (reference verifier.rs:195-251)."""
    import copy
    import random
    import pytest
    from mpc_jellyfish_tpu.curves import BN254
    from mpc_jellyfish_tpu.plonk.snark import PlonkKzgSnark, WrongProof
    from mpc_jellyfish_tpu.plonk.structs import BatchProof
    from mpc_jellyfish_tpu.plonk.verifier import Verifier
    from mpc_jellyfish_tpu.pcs import kzg
    from mpc_jellyfish_tpu.relation.circuit import PlonkCircuit

    spec = BN254.fr
    rng = random.Random(5)
    cs = PlonkCircuit(spec)
    vals = [cs.create_variable(rng.randrange(spec.p)) for _ in range(4)]
    acc = vals[0]
    while cs.num_gates() < 40:
        acc = cs.mul(acc, vals[cs.num_gates() % 4])
    out = cs.create_public_variable(cs.witness_of(acc))
    cs.enforce_equal(acc, out)
    cs.finalize_for_arithmetization()
    snark = PlonkKzgSnark(BN254)
    srs = kzg.universal_setup_for_testing(BN254, cs.srs_size(), seed=11)
    pk, vk = snark.preprocess(srs, cs)
    proofs = [snark.prove(cs, pk, rng=random.Random(i), mask=True)
              for i in range(3)]

    verifier = Verifier(BN254, vk.domain_size)
    jobs = [([vk], [cs.public_input()], BatchProof.from_proof(pf), None)
            for pf in proofs]
    chs = verifier.compute_challenges_batch(jobs)
    fast = verifier.batch_verify_native(chs, jobs, vk.open_key)
    if fast is None:
        pytest.skip("native runtime unavailable")
    assert fast is True
    # python-path oracle agrees
    infos = [verifier.pcs_info_with_challenges(ch, vks_i, pis_i, bp)
             for ch, (vks_i, pis_i, bp, _) in zip(chs, jobs)]
    assert Verifier.batch_verify_opening_proofs(BN254, vk.open_key, infos)
    # corrupted proof rejected by BOTH paths identically
    bad = copy.deepcopy(proofs[1])
    bad.wires_poly_comms[0] = proofs[2].wires_poly_comms[1]
    bad_jobs = [([vk], [cs.public_input()], BatchProof.from_proof(pf), None)
                for pf in (proofs[0], bad, proofs[2])]
    bad_chs = verifier.compute_challenges_batch(bad_jobs)
    assert verifier.batch_verify_native(bad_chs, bad_jobs, vk.open_key) is False
    bad_infos = [verifier.pcs_info_with_challenges(ch, vks_i, pis_i, bp)
                 for ch, (vks_i, pis_i, bp, _) in zip(bad_chs, bad_jobs)]
    assert not Verifier.batch_verify_opening_proofs(BN254, vk.open_key,
                                                    bad_infos)
    # end-to-end snark API raises on the bad batch, accepts the good one
    assert snark.batch_verify([vk] * 3, [cs.public_input()] * 3, proofs)
    try:
        snark.batch_verify([vk] * 3, [cs.public_input()] * 3,
                           [proofs[0], bad, proofs[2]])
        assert False, "corrupt proof accepted"
    except WrongProof:
        pass


def test_batch_verify_fused_parity():
    """The one-call fused path (bv_assemble: template-patched transcripts,
    AVX-512 keccak chains, challenge reduction, packed scalar rows) must
    agree bit-for-bit with compute_challenges_batch + batch_verify_native
    on accept AND reject (reference verifier.rs:195-252)."""
    import copy
    import random
    import pytest
    from mpc_jellyfish_tpu.curves import BN254
    from mpc_jellyfish_tpu.plonk.snark import PlonkKzgSnark, WrongProof
    from mpc_jellyfish_tpu.plonk.structs import BatchProof
    from mpc_jellyfish_tpu.plonk.verifier import Verifier, proof_bv_blob
    from mpc_jellyfish_tpu.pcs import kzg
    from mpc_jellyfish_tpu.relation.circuit import PlonkCircuit
    from mpc_jellyfish_tpu.utils import native

    if native._load() is None or not hasattr(native._load(), "bv_assemble"):
        pytest.skip("native runtime unavailable")

    spec = BN254.fr
    rng = random.Random(7)
    cs = PlonkCircuit(spec)
    vals = [cs.create_variable(rng.randrange(spec.p)) for _ in range(4)]
    acc = vals[0]
    while cs.num_gates() < 40:
        acc = cs.mul(acc, vals[cs.num_gates() % 4])
    out = cs.create_public_variable(cs.witness_of(acc))
    cs.enforce_equal(acc, out)
    cs.finalize_for_arithmetization()
    snark = PlonkKzgSnark(BN254)
    srs = kzg.universal_setup_for_testing(BN254, cs.srs_size(), seed=12)
    pk, vk = snark.preprocess(srs, cs)
    proofs = [snark.prove(cs, pk, rng=random.Random(i), mask=True)
              for i in range(3)]
    pis = [list(cs.public_input()) for _ in range(3)]

    verifier = Verifier(BN254, vk.domain_size)
    fused = verifier.batch_verify_fused([vk] * 3, pis, proofs, vk.open_key)
    assert fused is True
    # challenge parity: bv_assemble's challenges equal the recorder+chain
    # path's (pins template/patch layout + the 48B mod-r reduction)
    jobs = [([vk], [pi], BatchProof.from_proof(pf), None)
            for pf, pi in zip(proofs, pis)]
    chs = verifier.compute_challenges_batch(jobs)
    tmpl, ends, patches = verifier._bv_layout(vk, 1)
    blobs = [proof_bv_blob(BN254, pf) for pf in proofs]
    p = spec.p
    pib = b"".join((int(x) % p).to_bytes(32, "little")
                   for pi in pis for x in pi)
    mod = native._load()
    jobs_b, extras, bases = mod.bv_assemble(
        native._get_fr_ctx(p)[1], tmpl, ends, patches, blobs, pib,
        verifier.group_gen.to_bytes(32, "little"),
        ((1 << 256) % p).to_bytes(32, "little"),
        ((BN254.fq.p - 1) // 2).to_bytes(32, "little"), 1)
    jrow = 18 * 32
    for i, ch in enumerate(chs):
        row = jobs_b[i * jrow:(i + 1) * jrow]
        got = [int.from_bytes(row[j * 32:(j + 1) * 32], "little")
               for j in range(7)]
        assert got == [ch.tau, ch.beta, ch.gamma, ch.alpha, ch.zeta,
                       ch.v, ch.u]
    # reject: corrupted eval, corrupted point, wrong pi — and a STALE
    # cached blob must not let a mutated proof slip through (the blob is
    # rebuilt only when absent, so mutation helpers drop it)
    bad = copy.deepcopy(proofs[1])
    del bad._bv_blob
    bad.poly_evals.wires_evals[0] = (bad.poly_evals.wires_evals[0] + 1) % p
    assert verifier.batch_verify_fused(
        [vk] * 3, pis, [proofs[0], bad, proofs[2]], vk.open_key) is False
    bad2 = copy.deepcopy(proofs[2])
    del bad2._bv_blob
    bad2.opening_proof = proofs[0].opening_proof
    assert verifier.batch_verify_fused(
        [vk] * 3, pis, [proofs[0], proofs[1], bad2], vk.open_key) is False
    wrong_pi = [pis[0], [(pis[1][0] + 1) % p], pis[2]]
    assert verifier.batch_verify_fused(
        [vk] * 3, wrong_pi, proofs, vk.open_key) is False
    # end-to-end API routes through the fused path and still raises
    try:
        snark.batch_verify([vk] * 3, wrong_pi, proofs)
        assert False, "wrong pi accepted"
    except WrongProof:
        pass
    assert snark.batch_verify([vk] * 3, pis, proofs)
