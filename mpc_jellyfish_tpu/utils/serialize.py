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
    p = curve.fq.p
    buf = bytearray(b)
    flags = buf[-1] & 0xC0
    buf[-1] &= 0x3F
    if flags & 0x40:
        return AffinePoint.infinity()
    x = int.from_bytes(bytes(buf), "little")
    y2 = (x * x * x + curve.b) % p
    y = pow(y2, (p + 1) // 4, p) if p % 4 == 3 else _sqrt_mod(y2, p)
    if (y * y - y2) % p != 0:
        raise ValueError("not on curve")
    if (y > (p - 1) // 2) != bool(flags & 0x80):
        y = (-y) % p
    return AffinePoint(x, y)


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
