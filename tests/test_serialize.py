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
