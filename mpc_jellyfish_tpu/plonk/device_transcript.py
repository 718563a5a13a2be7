"""Device-resident Solidity (keccak256) Fiat-Shamir transcript.

Byte-identical to `transcript.SolidityTranscript` (reference
solidity.rs:31-77), but the byte log, squeeze state and challenges all
live ON the device: the prover's round chain then dispatches end-to-end
with no device->host synchronization (host FS costs one ~30ms fetch per
round through a remote-attached chip — the largest fixed cost of small
proves).

Everything here is shape-static: every append has a host-known byte
length, so each round's transcript program traces at fixed sizes and is
cached like any other kernel.

Challenges are returned as MONTGOMERY limb tensors [L, 1] (the form every
device round kernel consumes).  The proof's commitments/evaluations are
fetched once at the end of the prove.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..curves import CurveSpec
from ..ops import field as F
from ..ops import keccak as K
from ..ops.field import FieldSpec

U8 = jnp.uint8
U32 = jnp.uint32


def _le_bytes_dev(spec: FieldSpec, limbs_canonical):
    """[L] canonical 16-bit limbs -> [2L] u8 little-endian bytes."""
    x = limbs_canonical.reshape(-1).astype(U32)
    b = jnp.stack([x & 0xFF, x >> 8], axis=1).reshape(-1)
    return b.astype(U8)


def field_bytes_dev(spec: FieldSpec, v_mont):
    """Canonical LE byte serialization of a Montgomery limb scalar [L, 1]
    (mirrors serialize.field_to_bytes).  Only fields whose byte length is
    exactly 2*num_limbs are supported (BN254 fr/fq: 32 = 2*16)."""
    nbytes = (spec.p.bit_length() + 7) // 8
    assert nbytes == 2 * spec.num_limbs, "unsupported field byte length"
    canon = F.from_mont(spec, v_mont)[:, 0]
    return _le_bytes_dev(spec, canon)


def _limb_gt_const(x, const_limbs):
    """x [L] canonical u32 16-bit limbs > const (int limbs), lexicographic
    from the most-significant limb."""
    L = x.shape[0]
    gt = jnp.zeros((), dtype=jnp.bool_)
    for i in range(L):                       # low -> high: high wins
        ci = np.uint32(const_limbs[i])
        gt = jnp.where(x[i] > ci, True, jnp.where(x[i] < ci, False, gt))
    return gt


def g1_bytes_dev(curve: CurveSpec, comm_aff):
    """Compressed SW affine bytes (mirrors serialize.g1_to_bytes):
    x LE bytes, top-byte flags 0x80 when y > (p-1)/2, 0x40 for infinity.
    comm_aff: (x_mont [L,1], y_mont [L,1], inf [1] bool)."""
    fq = curve.fq
    x_m, y_m, inf = comm_aff
    xc = F.from_mont(fq, x_m)[:, 0]
    yc = F.from_mont(fq, y_m)[:, 0]
    xb = _le_bytes_dev(fq, xc)
    half = (fq.p - 1) // 2
    half_limbs = [(half >> (16 * i)) & 0xFFFF for i in range(fq.num_limbs)]
    neg = _limb_gt_const(yc, half_limbs)
    inf_b = inf.reshape(()).astype(jnp.bool_)
    xb = jnp.where(inf_b, jnp.zeros_like(xb), xb)
    flag = jnp.where(inf_b, np.uint8(0x40),
                     jnp.where(neg, np.uint8(0x80), np.uint8(0)))
    xb = xb.at[-1].set(xb[-1] | flag)
    return xb


def _fr_tables(spec: FieldSpec):
    """(R2 limbs, to_mont(2^256 mod r) limbs) device constants."""
    key = "_dev_transcript_consts"
    cached = getattr(spec, key, None)
    if cached is None:
        R = 1 << (16 * spec.num_limbs)
        r2 = (R * R) % spec.p
        c = ((1 << 256) % spec.p) * R % spec.p      # to_mont(2^256 mod r)
        def limbs(v):
            return jnp.asarray(
                [[(v >> (16 * i)) & 0xFFFF] for i in range(spec.num_limbs)],
                dtype=U32)
        cached = (limbs(r2), limbs(c))
        try:
            setattr(spec, key, cached)
        except AttributeError:
            pass
    return cached


def _raw_cond_sub_p(spec: FieldSpec, x):
    """One conditional plain subtract of p from canonical-ish limbs [L]."""
    L = spec.num_limbs
    p_limbs = [(spec.p >> (16 * i)) & 0xFFFF for i in range(L)]
    ge = ~_limb_gt_const_lt(x, p_limbs)      # x >= p
    borrow = jnp.zeros((), dtype=jnp.int32)
    out = []
    for i in range(L):
        d = x[i].astype(jnp.int32) - np.int32(p_limbs[i]) - borrow
        borrow = (d < 0).astype(jnp.int32)
        out.append((d + (borrow << 16)).astype(U32) & 0xFFFF)
    sub = jnp.stack(out)
    return jnp.where(ge, sub, x)


def _limb_gt_const_lt(x, const_limbs):
    """x < const, lexicographic."""
    L = x.shape[0]
    lt = jnp.zeros((), dtype=jnp.bool_)
    for i in range(L):
        ci = np.uint32(const_limbs[i])
        lt = jnp.where(x[i] < ci, True, jnp.where(x[i] > ci, False, lt))
    return lt


def fr_from_le48_dev(spec: FieldSpec, b48):
    """48 LE bytes -> Montgomery scalar [L, 1]: int.from_bytes(b, 'le') % r
    in Montgomery form (mirrors the host squeeze's sampling)."""
    L = spec.num_limbs
    assert 2 * L == 32, "48-byte sampling assumes a 256-bit limb layout"
    r2, c256 = _fr_tables(spec)
    b = b48.astype(U32)
    # x0 = bytes[0:32) as 16 limbs; x1 = bytes[32:48) as 8 limbs
    x0 = (b[0:32:2] | (b[1:32:2] << 8))
    x1 = jnp.concatenate([b[32::2] | (b[33::2] << 8),
                          jnp.zeros(L - 8, dtype=U32)])
    # canonicalize x0 (< 2^256 < ~4.6 r for BN254-sized r)
    for _ in range(5):
        x0 = _raw_cond_sub_p(spec, x0)
    m0 = F.mul(spec, x0[:, None], r2)            # to_mont(x0)
    m1 = F.mul(spec, F.mul(spec, x1[:, None], r2), c256)
    return F.add(spec, m0, m1)                   # [L, 1] Montgomery


class DeviceSolidityTranscript:
    """Drop-in device twin of SolidityTranscript for the PROVER side.

    LAZY + FUSED: appends only RECORD (kind, tensor); all serialization,
    concatenation, hashing and challenge reduction happen inside ONE
    cached-jit program per squeeze.  The round-4 version ran each append
    and squeeze as eager ops — on a remote-attached chip that is one
    tunnel dispatch per op, which made device-FS 14x SLOWER than host FS
    (bench_r4_16.log).  Fused, a full prove issues ~a dozen programs and
    exactly one device->host fetch.

    After each squeeze the serialized transcript prefix is carried forward
    as a single device u8 vector, so program arity stays small and the
    per-squeeze program is shape-stable across proves of one circuit."""

    def __init__(self, curve: CurveSpec):
        self.curve = curve
        self.parts: list = []        # ("host", bytes) | ("g1b", batch) |
                                     # ("frb", tensor [L, m])
        self.length = 0              # python-known total transcript length
        self.state = jnp.zeros(64, dtype=U8)
        self._buf = jnp.zeros(0, dtype=U8)   # serialized prefix (device)
        self._nsqueeze = 0

    # -- appends (record only; no device ops) ----------------------------
    def append_host_bytes(self, msg: bytes):
        if not msg:
            return
        self.parts.append(("host", bytes(msg)))
        self.length += len(msg)

    def append_commitment_dev(self, comm_aff):
        x, y, inf = comm_aff
        self.append_commitments_dev((x, y, inf))

    def append_commitments_dev(self, batch):
        """batch: (x [L,k], y [L,k], inf [k]) — k compressed points."""
        k = int(batch[0].shape[1])
        self.parts.append(("g1b", batch))
        self.length += k * ((self.curve.fq.p.bit_length() + 7) // 8)

    def append_field_dev(self, v_mont):
        self.parts.append(("frb", v_mont))
        self.length += int(v_mont.shape[1]) * (
            (self.curve.fr.p.bit_length() + 7) // 8)

    def append_fields_dev(self, v_mont):
        """v_mont: [L, m] — m field elements in column order."""
        self.append_field_dev(v_mont)

    # -- squeeze (one fused program) -------------------------------------
    def get_and_append_challenge_dev(self):
        from ..utils.aot_cache import cached_jit
        import hashlib
        curve, fr = self.curve, self.curve.fr
        spec_sig = []
        host_digest = hashlib.sha256()
        flat_args = [self.state, self._buf]
        consts = []
        for kind, payload in self.parts:
            if kind == "host":
                spec_sig.append(("host", len(payload)))
                host_digest.update(payload)
                consts.append(np.frombuffer(payload, np.uint8))
            elif kind == "g1b":
                spec_sig.append(("g1b", int(payload[0].shape[1])))
                flat_args.extend(payload)
            else:
                spec_sig.append(("frb", int(payload.shape[1])))
                flat_args.append(payload)
        sig = tuple(spec_sig)
        parts_spec = list(self.parts)
        const_arrays = list(consts)

        def fn(state, buf, *tensors):
            it = iter(tensors)
            cit = iter(const_arrays)
            pieces = [buf]
            for kind, _payload in parts_spec:
                if kind == "host":
                    pieces.append(jnp.asarray(next(cit)))
                elif kind == "g1b":
                    x = next(it); y = next(it); inf = next(it)
                    for i in range(x.shape[1]):
                        pieces.append(g1_bytes_dev(
                            curve, (x[:, i:i + 1], y[:, i:i + 1],
                                    inf[i:i + 1])))
                else:
                    v = next(it)
                    for i in range(v.shape[1]):
                        pieces.append(field_bytes_dev(fr, v[:, i:i + 1]))
            T = jnp.concatenate(pieces) if len(pieces) > 1 else pieces[0]
            base = jnp.concatenate([state, T])
            st = K.transcript_squeeze(base)
            ch = fr_from_le48_dev(fr, st[:48])
            return st, T, ch

        key = (f"fs-{curve.name}-sq{self._nsqueeze}-b{self._buf.shape[0]}"
               f"-{hashlib.sha256(repr(sig).encode()).hexdigest()[:12]}"
               f"-h{host_digest.hexdigest()[:12]}")
        call = cached_jit(key, fn, *flat_args, deps=("keccak",))
        st, buf, ch = call(*flat_args)
        self.state = st
        self._buf = buf
        self.parts = []
        self._nsqueeze += 1
        return ch
