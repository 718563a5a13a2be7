"""Signature schemes: Schnorr (TE curve + Rescue) and BLS over BN254.

Mirror of `primitives/src/signatures/` (SURVEY.md §2.3):
* `SchnorrSignatureScheme` (schnorr.rs:39-226): R = r*G with a deterministic
  Rescue-derived nonce, c = RescueCRHF(csid, vk, R, msg) mapped into the
  scalar field, s = c*sk + r; restrictive cofactorless verification
  s*G - c*vk == R.
* `BLSOverBN254` (bls_over_bn254.rs:72-267): min-sig BLS - signatures in G1
  via try-and-increment hash-to-curve, keys in G2, pairing verification;
  aggregation supported (`AggregateableSignatureSchemes`).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..curves import BN254
from ..utils.te_curve import BABY_JUBJUB, TECurve
from ..utils.conversion import (fq_to_fr, fq_to_fr_with_mask, fr_to_fq,
                                hash_to_field)

# reference primitives/src/constants.rs:10,30
CS_ID_SCHNORR = b"SCHNORR_WITH_RESCUE_HASH_v01"
from ..utils import ec_host as H
from .. import pairing as PR
from .rescue import RescueCRHF


# ---------------------------------------------------------------------------
# Schnorr over Baby Jubjub
# ---------------------------------------------------------------------------

@dataclass
class SchnorrSignature:
    s: int          # scalar
    R: tuple        # TE point


class SchnorrSignatureScheme:
    """Schnorr over a TE curve embedded in BN254's scalar field."""

    def __init__(self, curve: TECurve = BABY_JUBJUB):
        self.curve = curve
        self.crhf = RescueCRHF(BN254.fr)   # Rescue over the TE base field

    def key_gen(self, rng):
        sk = rng.randrange(1, self.curve.order)
        vk = self.curve.mul(self.curve.gen, sk)
        return sk, vk

    def _csid_field(self, csid: bytes) -> int:
        """instance_description = F::from_be_bytes_mod_order(csid)
        (schnorr.rs:293,:383)."""
        return int.from_bytes(csid, "big") % self.curve.q

    def _challenge(self, vk, R, msg: list, csid: bytes) -> int:
        """248-bit masked Rescue challenge (schnorr.rs:379-397)."""
        csid_f = self._csid_field(csid)
        digest = self.crhf.sponge_with_bit_padding(
            [csid_f, vk[0], vk[1], R[0], R[1]] + list(msg), 1)[0]
        return fq_to_fr_with_mask(self.curve.order, digest)

    def sign(self, sk: int, msg: list,
             csid: bytes = CS_ID_SCHNORR) -> SchnorrSignature:
        """Deterministic nonce from Rescue of (csid, sk, msg) (schnorr.rs:294)."""
        csid_f = self._csid_field(csid)
        nonce_input = [csid_f, fr_to_fq(self.curve.q, sk)] + list(msg)
        r = fq_to_fr(self.curve.order,
                     self.crhf.sponge_with_bit_padding(nonce_input, 1)[0])
        R = self.curve.mul(self.curve.gen, r)
        vk = self.curve.mul(self.curve.gen, sk)
        c = self._challenge(vk, R, msg, csid)
        s = (c * sk + r) % self.curve.order
        return SchnorrSignature(s=s, R=R)

    def verify(self, vk, msg: list, sig: SchnorrSignature,
               csid: bytes = CS_ID_SCHNORR) -> bool:
        cur = self.curve
        if not cur.is_on_curve(vk) or not cur.is_on_curve(sig.R):
            return False
        # reject small-order public keys (schnorr.rs:344)
        if cur.is_identity(cur.mul(vk, cur.cofactor)):
            return False
        c = self._challenge(vk, sig.R, msg, csid)
        lhs = cur.mul(cur.gen, sig.s)
        rhs = cur.add(sig.R, cur.mul(vk, c))
        return lhs == rhs


# ---------------------------------------------------------------------------
# BLS over BN254 (min-sig: signatures in G1, keys in G2)
# ---------------------------------------------------------------------------

class BLSOverBN254:
    """Mirror of bls_over_bn254.rs: hash-and-pray hash-to-G1, pairing verify."""

    CSID = b"BLS_SIG_BN254G1_XMD:KECCAK_NCTH_NUL_"

    def __init__(self):
        self.curve = BN254

    def key_gen(self, rng):
        sk = rng.randrange(1, self.curve.fr.p)
        vk = PR.g2_mul(self.curve, PR.g2_generator(self.curve), sk)
        return sk, vk

    def hash_to_g1(self, msg: bytes) -> H.AffinePoint:
        """Try-and-increment (bls_over_bn254.rs `hash_to_curve`)."""
        p = self.curve.fq.p
        ctr = 0
        while True:
            x = hash_to_field(p, msg + ctr.to_bytes(8, "little"), self.CSID)
            y2 = (x * x * x + self.curve.b) % p
            if pow(y2, (p - 1) // 2, p) == 1:
                y = pow(y2, (p + 1) // 4, p) if p % 4 == 3 else None
                if y is None:
                    from ..utils.serialize import _sqrt_mod
                    y = _sqrt_mod(y2, p)
                if y % 2:
                    y = p - y
                pt = H.AffinePoint(x, y)
                # clear nothing: BN254 G1 has cofactor 1
                return pt
            ctr += 1

    def sign(self, sk: int, msg: bytes) -> H.AffinePoint:
        return H.ec_mul(self.curve.fq.p, self.hash_to_g1(msg), sk)

    def verify(self, vk, msg: bytes, sig: H.AffinePoint) -> bool:
        """e(sig, g2) == e(H(m), vk)."""
        hm = self.hash_to_g1(msg)
        g2 = PR.g2_generator(self.curve)
        return PR.pairing_check(
            self.curve,
            [sig, H.ec_neg(self.curve.fq.p, hm)],
            [g2, vk],
        )

    # -- aggregation (AggregateableSignatureSchemes, signatures/mod.rs:97) --
    def aggregate(self, sigs: list) -> H.AffinePoint:
        acc = H.AffinePoint.infinity()
        for s in sigs:
            acc = H.ec_add(self.curve.fq.p, acc, s)
        return acc

    def aggregate_verify(self, vks: list, msgs: list, agg_sig) -> bool:
        """e(agg, g2) == prod e(H(m_i), vk_i)."""
        g2 = PR.g2_generator(self.curve)
        g1s = [agg_sig] + [H.ec_neg(self.curve.fq.p, self.hash_to_g1(m))
                           for m in msgs]
        g2s = [g2] + list(vks)
        return PR.pairing_check(self.curve, g1s, g2s)

    def multi_sig_verify(self, vks: list, msg: bytes, agg_sig) -> bool:
        """Same message signed by all: aggregate the keys."""
        agg_vk = vks[0]
        for vk in vks[1:]:
            agg_vk = PR.g2_add(self.curve, agg_vk, vk)
        return self.verify(agg_vk, msg, agg_sig)


class BLSOverBLS12381(BLSOverBN254):
    """Min-sig BLS over BLS12-381 (signatures in G1, keys in G2).

    Mirror of `signatures/src/bls_over_bls12381.rs:99-387` (the reference
    delegates to the `blst` C library with ciphersuite CS_ID_BLS_MIN_SIG).
    Functional parity: same scheme, key/signature groups, and aggregation
    API; hash-to-G1 here is try-and-increment with cofactor clearing rather
    than blst's SSWU map (self-consistent; not byte-compatible with blst).
    """

    CSID = b"BLS_SIG_BLS12381G1_XMD:SHA-256_SSWU_RO_NUL_"
    # G1 cofactor h1 = (x-1)^2 / 3
    _H1 = 0x396C8C005555E1568C00AAAB0000AAAB

    def __init__(self):
        from ..curves import BLS12_381
        self.curve = BLS12_381

    def hash_to_g1(self, msg: bytes) -> H.AffinePoint:
        p = self.curve.fq.p
        ctr = 0
        while True:
            x = hash_to_field(p, msg + ctr.to_bytes(8, "little"), self.CSID)
            y2 = (x * x * x + self.curve.b) % p
            if pow(y2, (p - 1) // 2, p) == 1:
                from ..utils.serialize import _sqrt_mod
                y = _sqrt_mod(y2, p)
                if y % 2:
                    y = p - y
                pt = H.ec_mul(p, H.AffinePoint(x, y), self._H1)
                if not pt.inf:
                    return pt
            ctr += 1
