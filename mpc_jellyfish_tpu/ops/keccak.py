"""Device-side keccak-256 (XLA, u32-pair lanes).

Runs the Solidity transcript's Fiat-Shamir chain ON the device so the
prover never synchronizes with the host between rounds: the reference
transcript (`plonk/src/transcript/solidity.rs:53-77`) re-hashes
state || transcript || suffix per challenge, and doing that host-side
costs one device->host round trip per round (~30ms each through a
remote-attached chip; 5 rounds is ~0.15s of a ~1s 2^16 prove).

Layout: a keccak state is [25, 2] uint32 (lo, hi words of each u64 lane);
messages are uint8 vectors.  The 24-round permutation is unrolled (pure
elementwise xor/shift/per-lane static gathers -> one XLA fusion); the
absorb loops over rate blocks with `lax.scan` so the compiled size is
independent of message length.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

U32 = jnp.uint32
U8 = jnp.uint8

RATE = 136          # keccak-256 rate in bytes
_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
# rotation offset per flat lane i = x + 5y
_ROT = [0, 1, 62, 28, 27, 36, 44, 6, 55, 20, 3, 10, 43, 25, 39, 41, 45,
        15, 21, 8, 18, 2, 61, 56, 14]
# pi: out lane (y + 5*((2x+3y)%5)) takes src lane (x+5y); _PI_SRC[out] = src
_PI_SRC = [0] * 25
for _x in range(5):
    for _y in range(5):
        _PI_SRC[_y + 5 * ((2 * _x + 3 * _y) % 5)] = _x + 5 * _y


# vectorized rho+pi constants: out lane i takes src lane _PI_SRC[i]
# rotated by _ROT[_PI_SRC[i]]
_PI_SRC_V = np.array(_PI_SRC, dtype=np.int32)
_ROT_V = np.array([_ROT[s] for s in _PI_SRC], dtype=np.uint32) % 64
_ROT_SWAP = (_ROT_V % 64) >= 32              # rotate-by->=32: swap halves
_ROT_R0 = (_ROT_V % 32).astype(np.uint32)
_RC_LO = np.array([rc & 0xFFFFFFFF for rc in _RC], dtype=np.uint32)
_RC_HI = np.array([rc >> 32 for rc in _RC], dtype=np.uint32)


def _rotl_vec(lo, hi, swap, r0):
    """Per-lane 64-bit rotate-left on u32 half vectors.
    swap: bool mask (effective r >= 32); r0: u32 residual shift < 32."""
    l = jnp.where(swap, hi, lo)
    h = jnp.where(swap, lo, hi)
    z = r0 == 0
    # (h >> (32 - r0)) is junk where r0 == 0; masked by the select
    nl = jnp.where(z, l, (l << r0) | (h >> (32 - r0)))
    nh = jnp.where(z, h, (h << r0) | (l >> (32 - r0)))
    return nl, nh


def keccak_f(state):
    """keccak-f[1600] on a [25, 2] u32 array (lo, hi per lane).

    Fully vectorized over the 25 lanes (per-lane variable shifts, static
    gathers): ~12 vector ops per round.  The per-lane scalar formulation
    compiled into a 24x-deep scalar DAG that took XLA:CPU minutes."""
    lo = state[:, 0]
    hi = state[:, 1]
    src = jnp.asarray(_PI_SRC_V)
    swap = jnp.asarray(_ROT_SWAP)
    r0 = jnp.asarray(_ROT_R0)
    one_swap = jnp.zeros(5, dtype=bool)
    one_r0 = jnp.ones(5, dtype=U32)
    for i in range(24):
        # theta
        cl = lo.reshape(5, 5)
        ch = hi.reshape(5, 5)
        clo = cl[0] ^ cl[1] ^ cl[2] ^ cl[3] ^ cl[4]
        chi_ = ch[0] ^ ch[1] ^ ch[2] ^ ch[3] ^ ch[4]
        rl, rh = _rotl_vec(jnp.roll(clo, -1), jnp.roll(chi_, -1),
                           one_swap, one_r0)
        dlo = jnp.roll(clo, 1) ^ rl
        dhi = jnp.roll(chi_, 1) ^ rh
        lo = (cl ^ dlo[None, :]).reshape(25)
        hi = (ch ^ dhi[None, :]).reshape(25)
        # rho + pi (gather + per-lane rotate)
        blo, bhi = _rotl_vec(lo[src], hi[src], swap, r0)
        # chi (row-wise)
        b5l = blo.reshape(5, 5)
        b5h = bhi.reshape(5, 5)
        lo = (b5l ^ (~jnp.roll(b5l, -1, axis=1)
                     & jnp.roll(b5l, -2, axis=1))).reshape(25)
        hi = (b5h ^ (~jnp.roll(b5h, -1, axis=1)
                     & jnp.roll(b5h, -2, axis=1))).reshape(25)
        # iota
        lo = lo.at[0].set(lo[0] ^ np.uint32(_RC_LO[i]))
        hi = hi.at[0].set(hi[0] ^ np.uint32(_RC_HI[i]))
    return jnp.stack([lo, hi], axis=1)


def _bytes_to_blocks(msg, nb):
    """uint8 [nb*RATE] (already padded) -> u32 lane blocks [nb, 34]."""
    w = msg.reshape(nb, RATE // 4, 4).astype(U32)
    words = (w[..., 0] | (w[..., 1] << 8) | (w[..., 2] << 16)
             | (w[..., 3] << 24))                        # [nb, 34] LE words
    return words


def _absorb(state, blocks):
    """XOR-absorb [nb, 34] word blocks into state with keccak_f between."""
    lane_w = RATE // 8                                    # 17 u64 lanes

    def body(st, blk):
        lo_x = blk[0::2]
        hi_x = blk[1::2]
        pad_lo = jnp.concatenate([lo_x, jnp.zeros(25 - lane_w, U32)])
        pad_hi = jnp.concatenate([hi_x, jnp.zeros(25 - lane_w, U32)])
        st = st ^ jnp.stack([pad_lo, pad_hi], axis=1)
        return keccak_f(st), None

    state, _ = jax.lax.scan(body, state, blocks)
    return state


def _pad_message(msg_u8, extra_suffix=None):
    """Keccak (0x01 .. 0x80) padding; msg is a static-length u8 vector.
    extra_suffix: optional single byte (device scalar or int) appended
    BEFORE padding (the transcript's 0/1 squeeze domain byte)."""
    n = msg_u8.shape[0] + (1 if extra_suffix is not None else 0)
    nb = n // RATE + 1
    pad = jnp.zeros(nb * RATE - n, dtype=U8)
    pad = pad.at[0].set(0x01)
    pad = pad.at[-1].set(pad[-1] | 0x80)
    parts = [msg_u8]
    if extra_suffix is not None:
        parts.append(jnp.asarray(extra_suffix, dtype=U8).reshape(1))
    parts.append(pad)
    return jnp.concatenate(parts), nb


def keccak256_dev(msg_u8, extra_suffix=None):
    """keccak-256 of a static-length uint8 vector -> [32] uint8."""
    padded, nb = _pad_message(msg_u8, extra_suffix)
    state = jnp.zeros((25, 2), dtype=U32)
    state = _absorb(state, _bytes_to_blocks(padded, nb))
    return _squeeze32(state)


def _squeeze32(state):
    words = state[:4]                                     # [4, 2]
    w = jnp.stack([words[:, 0], words[:, 1]], axis=1).reshape(-1)  # lo,hi x4
    b = jnp.stack([(w >> (8 * i)) & 0xFF for i in range(4)],
                  axis=1).reshape(-1)
    return b.astype(U8)                                   # [32]


def transcript_squeeze(msg_u8):
    """The Solidity transcript squeeze: given base = state || transcript,
    returns new_state[64] u8 = H(base||0) || H(base||1).

    The two hashes share every full-rate block of `base`; the shared
    prefix is absorbed once (reference solidity.rs:53-77 hashes the whole
    transcript twice)."""
    n = msg_u8.shape[0]
    shared = n // RATE              # full blocks fully inside msg for both
    shared_bytes = shared * RATE
    state = jnp.zeros((25, 2), dtype=U32)
    if shared:
        state = _absorb(state, _bytes_to_blocks(msg_u8[:shared_bytes],
                                                shared))
    tail = msg_u8[shared_bytes:]
    outs = []
    for suffix in (0, 1):
        padded, nb = _pad_message(tail, suffix)
        st = _absorb(state, _bytes_to_blocks(padded, nb))
        outs.append(_squeeze32(st))
    return jnp.concatenate(outs)                          # [64] u8
