"""Host-side big-integer <-> limb-tensor conversion utilities.

The device representation of a (batch of) prime-field element(s) is a
``uint32[L, *batch]`` tensor of 16-bit little-endian limbs (limb-major so that
the batch dimension rides the TPU vector lanes).  These helpers convert
between Python ints / numpy object arrays and that layout.

Reference parity: plays the role of arkworks ``BigInteger`` plumbing used
throughout the reference (e.g. `relation/src/constraint_system.rs`,
`primitives/src/pcs/univariate_kzg/mod.rs`), re-designed for a tensor layout.
"""

from __future__ import annotations

import numpy as np

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def int_to_limbs(x: int, num_limbs: int) -> np.ndarray:
    """Convert a non-negative Python int to uint32[num_limbs] (16-bit limbs, LE)."""
    if x < 0:
        raise ValueError("negative")
    out = np.zeros(num_limbs, dtype=np.uint32)
    for i in range(num_limbs):
        out[i] = x & LIMB_MASK
        x >>= LIMB_BITS
    if x != 0:
        raise ValueError("int too large for limb count")
    return out


def limbs_to_int(limbs) -> int:
    """Convert uint32[L] limb vector back to a Python int."""
    x = 0
    for i in reversed(range(len(limbs))):
        x = (x << LIMB_BITS) | int(limbs[i])
    return x


def ints_to_limbs(xs, num_limbs: int) -> np.ndarray:
    """Convert a sequence of ints to uint32[L, N] (limb-major batch).

    Fast path: serialize each int with int.to_bytes (C speed) and reinterpret
    the buffer as little-endian uint16 limbs.
    """
    nbytes = 2 * num_limbs
    buf = b"".join(x.to_bytes(nbytes, "little") for x in xs)  # raises if too big/neg
    arr = np.frombuffer(buf, dtype="<u2").reshape(len(xs), num_limbs)
    # single fused strided copy: ascontiguousarray(arr.T).astype() pays a
    # 170x-slower two-pass buffer-protocol copy (measured 2-4.6s vs 12ms at
    # 393k elements)
    return arr.T.astype(np.uint32, order="C")


def limbs_to_ints(limbs) -> list:
    """Convert uint32[L, *batch] to a flat list of ints (C-order batch)."""
    arr = np.asarray(limbs)
    L = arr.shape[0]
    flat = arr.reshape(L, -1).T.astype("<u2")  # [N, L] uint16
    buf = flat.tobytes()
    nbytes = 2 * L
    return [int.from_bytes(buf[j * nbytes:(j + 1) * nbytes], "little")
            for j in range(flat.shape[0])]
