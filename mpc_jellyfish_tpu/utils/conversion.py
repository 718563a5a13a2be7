"""Cross-field scalar conversions and byte<->field codecs.

Mirror of `utilities/src/conversion.rs` (jf-utils): `fr_to_fq`, `fq_to_fr`,
`fq_to_fr_with_mask`, `field_switching`, `hash_to_field`,
`bytes_to_field_elements`, `bytes_from_field_elements`, and the streaming
`bytes_to_field` / `field_to_bytes` used by VID.
"""

from __future__ import annotations

from .keccak import keccak256


def fr_to_fq(fq_p: int, fr_val: int) -> int:
    """Lift a scalar-field element into the (larger) base field
    (conversion.rs:22: value-preserving)."""
    assert fr_val < fq_p, "scalar does not fit in target field"
    return fr_val


def fq_to_fr(fr_p: int, fq_val: int) -> int:
    """Base-field -> scalar-field by modular reduction (conversion.rs:43)."""
    return fq_val % fr_p


def fq_to_fr_with_mask(fr_p: int, fq_val: int) -> int:
    """Value-preserving Fq -> Fr by truncating to the low
    (bit_len(fr) >> 3) bytes (conversion.rs:54-63: keeps
    `T::MODULUS_BIT_SIZE >> 3` LE bytes, 248 bits for 251-bit fields)."""
    nbytes = fr_p.bit_length() >> 3
    return fq_val & ((1 << (8 * nbytes)) - 1)


def field_switching(dst_p: int, val: int) -> int:
    """Generic value-preserving-when-possible switch (conversion.rs:69)."""
    return val % dst_p


def hash_to_field(p: int, data: bytes, dst: bytes = b"mpc-jellyfish-tpu") -> int:
    """Hash bytes to a field element (conversion.rs:87); keccak-based
    expand with oversampling for negligible bias."""
    nbytes = (p.bit_length() + 7) // 8 + 16
    out = b""
    ctr = 0
    while len(out) < nbytes:
        out += keccak256(dst + ctr.to_bytes(8, "little") + data)
        ctr += 1
    return int.from_bytes(out[:nbytes], "little") % p


def bytes_to_field_elements(p: int, data: bytes) -> list:
    """Deterministic, invertible bytes -> field elements encoding
    (conversion.rs:130): length-prefixed, chunked below the modulus size."""
    if not data:
        return []          # conversion.rs:137
    chunk = (p.bit_length() - 1) // 8
    out = [len(data)]  # length prefix element
    for off in range(0, len(data), chunk):
        out.append(int.from_bytes(data[off:off + chunk], "little"))
    return out


def bytes_from_field_elements(p: int, elems: list) -> bytes:
    """Inverse of `bytes_to_field_elements` (conversion.rs:183)."""
    chunk = (p.bit_length() - 1) // 8
    length = elems[0]
    out = b"".join(int(e).to_bytes(chunk, "little") for e in elems[1:])
    return out[:length]


def bytes_to_field(p: int, data: bytes) -> list:
    """Streaming variant without length prefix (conversion.rs:317)."""
    chunk = (p.bit_length() - 1) // 8
    return [int.from_bytes(data[off:off + chunk], "little")
            for off in range(0, len(data), chunk)]


def field_to_bytes(p: int, elems: list) -> bytes:
    """Streaming inverse (conversion.rs:333)."""
    chunk = (p.bit_length() - 1) // 8
    return b"".join(int(e).to_bytes(chunk, "little") for e in elems)
