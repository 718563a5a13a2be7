"""Canonical serialization (arkworks-0.4 compatible layout).

Field elements: little-endian canonical bytes, width = limb-aligned byte size
(32 bytes for 254/255-bit fields, 48 for 381-bit).  G1 affine compressed:
x bytes with flag bits in the top bits of the last byte
(0x40 = infinity, 0x80 = "negative" y i.e. y > (p-1)/2).

Used by transcripts (`jf_utils::to_bytes!` call sites in
`plonk/src/transcript/mod.rs`) and proof (de)serialization.
"""

from __future__ import annotations

from ..curves import CurveSpec
from ..ops.field import FieldSpec
from .ec_host import AffinePoint


def field_byte_len(spec: FieldSpec) -> int:
    return (spec.p.bit_length() + 7) // 8


def field_to_bytes(spec: FieldSpec, v: int) -> bytes:
    return (v % spec.p).to_bytes(field_byte_len(spec), "little")


def field_from_bytes(spec: FieldSpec, b: bytes) -> int:
    return int.from_bytes(b, "little") % spec.p


def g1_to_bytes(curve: CurveSpec, pt: AffinePoint) -> bytes:
    """Compressed short-Weierstrass affine (arkworks-0.4 flag layout)."""
    n = field_byte_len(curve.fq)
    if pt.inf:
        out = bytearray(n)
        out[-1] |= 0x40
        return bytes(out)
    out = bytearray(pt.x.to_bytes(n, "little"))
    if pt.y > (curve.fq.p - 1) // 2:
        out[-1] |= 0x80
    return bytes(out)


def g1_from_bytes(curve: CurveSpec, b: bytes) -> AffinePoint:
    """Deserialize + validate (mirrors arkworks CanonicalDeserialize with
    Validate::Yes): rejects non-canonical x >= p and, on curves with
    cofactor != 1 (e.g. BLS12-381 G1), points outside the prime-order
    subgroup — an attacker-crafted blob must not decode to a rogue point."""
    p = curve.fq.p
    buf = bytearray(b)
    flags = buf[-1] & 0xC0
    buf[-1] &= 0x3F
    if flags & 0x40:
        return AffinePoint.infinity()
    x = int.from_bytes(bytes(buf), "little")
    if x >= p:
        raise ValueError("non-canonical x coordinate (>= field modulus)")
    y2 = (x * x * x + curve.b) % p
    y = pow(y2, (p + 1) // 4, p) if p % 4 == 3 else _sqrt_mod(y2, p)
    if (y * y - y2) % p != 0:
        raise ValueError("not on curve")
    if (y > (p - 1) // 2) != bool(flags & 0x80):
        y = (-y) % p
    pt = AffinePoint(x, y)
    if _g1_cofactor(curve) != 1:
        from .ec_host import ec_mul
        if not ec_mul(p, pt, curve.fr.p).inf:
            raise ValueError("point not in the prime-order subgroup")
    return pt


def _g1_cofactor(curve: CurveSpec) -> int:
    """1 if |E(Fq)| == r (prime-order G1, e.g. BN254); else the cofactor
    is nontrivial and subgroup membership needs an explicit check.  The
    Hasse bound makes |E| == r decidable from q and r alone when the
    cofactor could only be 1."""
    import math
    q, r = curve.fq.p, curve.fr.p
    # cofactor == 1 iff |E| = r is forced by the Hasse bound: any multiple
    # 2r would exceed q + 1 + 2*sqrt(q).  r ~ q => cofactor 1 (BN254);
    # r << q => cofactor > 1 (BLS12-381/377, BW6-761).
    return 1 if 2 * r > q + 1 + 2 * math.isqrt(q) + 2 else 0


def _sqrt_mod(a: int, p: int) -> int:
    """Tonelli-Shanks (p odd prime)."""
    if a == 0:
        return 0
    if pow(a, (p - 1) // 2, p) != 1:
        raise ValueError("not a QR")
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
    while t != 1:
        i, tt = 0, t
        while tt != 1:
            tt = tt * tt % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c = i, b * b % p
        t, r = t * c % p, r * b % p
    return r


def usize_to_bytes(v: int) -> bytes:
    return v.to_bytes(8, "little")


def u32_to_bytes(v: int) -> bytes:
    return v.to_bytes(4, "little")


# ---------------------------------------------------------------------------
# arkworks CanonicalSerialize (compressed) layout for proofs
# (reference proof_system/structs.rs:56-100 derive; vectors carry a u64-LE
# length prefix, Option<T> a single presence byte)
# ---------------------------------------------------------------------------

def _ser_vec(items, ser_one) -> bytes:
    out = usize_to_bytes(len(items))
    for it in items:
        out += ser_one(it)
    return out


def proof_to_bytes(curve: CurveSpec, proof) -> bytes:
    """CanonicalSerialize-compressed layout of `Proof`
    (proof_system/structs.rs:59-100)."""
    fr = curve.fr
    g1 = lambda pt: g1_to_bytes(curve, pt)
    f = lambda v: field_to_bytes(fr, v)
    ev = proof.poly_evals
    out = _ser_vec(proof.wires_poly_comms, g1)
    out += g1(proof.prod_perm_poly_comm)
    out += _ser_vec(proof.split_quot_poly_comms, g1)
    out += g1(proof.opening_proof)
    out += g1(proof.shifted_opening_proof)
    out += _ser_vec(ev.wires_evals, f)
    out += _ser_vec(ev.wire_sigma_evals, f)
    out += f(ev.perm_next_eval)
    if proof.plookup_proof is None:
        out += b"\x00"
    else:
        pl = proof.plookup_proof
        out += b"\x01"
        out += _ser_vec(pl.h_poly_comms, g1)
        out += g1(pl.prod_lookup_poly_comm)
        pe = pl.poly_evals
        out += b"".join(f(v) for v in (
            pe.range_table_eval, pe.key_table_eval, pe.h_1_eval,
            pe.q_lookup_eval, pe.prod_next_eval, pe.table_dom_sep_eval,
            pe.q_dom_sep_eval, pe.range_table_next_eval,
            pe.key_table_next_eval, pe.h_1_next_eval, pe.h_2_next_eval,
            pe.q_lookup_next_eval, pe.w_3_next_eval, pe.w_4_next_eval,
            pe.table_dom_sep_next_eval))
    return out


def proof_from_bytes(curve: CurveSpec, b: bytes):
    """Inverse of `proof_to_bytes`."""
    from ..plonk.structs import (Proof, ProofEvaluations, PlookupProof,
                                 PlookupEvaluations)
    fr = curve.fr
    flen = field_byte_len(fr)
    g1len = field_byte_len(curve.fq)
    pos = [0]

    def take(k):
        s = b[pos[0]:pos[0] + k]
        pos[0] += k
        return s

    def rd_len():
        return int.from_bytes(take(8), "little")

    def rd_g1():
        return g1_from_bytes(curve, take(g1len))

    def rd_f():
        return field_from_bytes(fr, take(flen))

    def rd_vec(rd):
        return [rd() for _ in range(rd_len())]

    wires = rd_vec(rd_g1)
    prod = rd_g1()
    quot = rd_vec(rd_g1)
    opening = rd_g1()
    shifted = rd_g1()
    we = rd_vec(rd_f)
    wse = rd_vec(rd_f)
    pne = rd_f()
    plookup = None
    if take(1) == b"\x01":
        h_comms = rd_vec(rd_g1)
        prod_lookup = rd_g1()
        vals = [rd_f() for _ in range(15)]
        plookup = PlookupProof(
            h_poly_comms=h_comms, prod_lookup_poly_comm=prod_lookup,
            poly_evals=PlookupEvaluations(*vals))
    return Proof(wires_poly_comms=wires, prod_perm_poly_comm=prod,
                 split_quot_poly_comms=quot, opening_proof=opening,
                 shifted_opening_proof=shifted,
                 poly_evals=ProofEvaluations(
                     wires_evals=we, wire_sigma_evals=wse,
                     perm_next_eval=pne),
                 plookup_proof=plookup)


# ---------------------------------------------------------------------------
# tagged-base64 blobs (reference #[tagged(tag::PROOF)] etc., structs.rs:59;
# format of the espresso tagged-base64 crate: TAG~base64url(data||checksum),
# checksum = bitwise-NOT of (sum of tag and data bytes) mod 256)
# ---------------------------------------------------------------------------

TAG_PROOF = "PROOF"
TAG_BATCHPROOF = "BATCHPROOF"
TAG_VERKEY = "VERKEY"

_B64_ALPHABET = ("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
                 "0123456789-_")


def _tb64_checksum(tag: str, data: bytes) -> int:
    return (~(sum(tag.encode()) + sum(data)) + 0x100) & 0xFF


def tagged_base64_encode(tag: str, data: bytes) -> str:
    import base64
    if any(c not in _B64_ALPHABET for c in tag):
        raise ValueError(f"invalid tagged-base64 tag: {tag!r}")
    payload = data + bytes([_tb64_checksum(tag, data)])
    enc = base64.urlsafe_b64encode(payload).rstrip(b"=").decode()
    return f"{tag}~{enc}"


def tagged_base64_decode(s: str, expect_tag: str | None = None):
    import base64
    tag, _, enc = s.partition("~")
    if not _:
        raise ValueError("missing ~ separator")
    if expect_tag is not None and tag != expect_tag:
        raise ValueError(f"tag mismatch: {tag!r} != {expect_tag!r}")
    pad = "=" * (-len(enc) % 4)
    payload = base64.urlsafe_b64decode(enc + pad)
    data, cksum = payload[:-1], payload[-1]
    if cksum != _tb64_checksum(tag, data):
        raise ValueError("tagged-base64 checksum mismatch")
    return tag, data


def proof_to_tagged_b64(curve: CurveSpec, proof) -> str:
    return tagged_base64_encode(TAG_PROOF, proof_to_bytes(curve, proof))


def proof_from_tagged_b64(curve: CurveSpec, s: str):
    _, data = tagged_base64_decode(s, TAG_PROOF)
    return proof_from_bytes(curve, data)
