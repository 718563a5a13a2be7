"""Fiat-Shamir transcripts.

Mirrors the reference `PlonkTranscript` trait (`plonk/src/transcript/mod.rs:40`)
with the Solidity/keccak256 instantiation (`solidity.rs:31-77`) as the
default.  The transcript is pure host-side work (hashes of a few KB per
proof); challenges cross to the device as Montgomery limb constants.

Message order is the cross-implementation compatibility linchpin - it follows
`append_vk_and_pub_input` (transcript/mod.rs:45-102) and the round schedule
in `snark.rs:262-431` exactly.
"""

from __future__ import annotations

from ..curves import CurveSpec
from ..utils.keccak import keccak256
from ..utils.serialize import (
    field_to_bytes, g1_to_bytes, usize_to_bytes, u32_to_bytes,
)

KECCAK256_STATE_SIZE = 64
EXTRA_TRANSCRIPT_MSG_LABEL = b"extra info"


class SolidityTranscript:
    """Keccak256 transcript (reference `solidity.rs`).

    state: 64 zero bytes initially.  append only accumulates bytes; a
    challenge squeezes  state = H(state|transcript|0) || H(state|transcript|1)
    and samples state[..48] mod r.  (Labels are dropped, as in the reference.)
    """

    def __init__(self, curve: CurveSpec, label: bytes = b"PlonkProof"):
        self.curve = curve
        self.transcript = bytearray()
        self.state = bytes(KECCAK256_STATE_SIZE)

    def append_message(self, label: bytes, msg: bytes):
        self.transcript += msg

    def append_field(self, label: bytes, v: int):
        self.append_message(label, field_to_bytes(self.curve.fr, v))

    def append_commitment(self, label: bytes, comm):
        self.append_message(label, g1_to_bytes(self.curve, comm))

    def append_commitments(self, label: bytes, comms):
        for c in comms:
            self.append_commitment(label, c)

    def append_vk_and_pub_input(self, vk, pub_input):
        """Reference transcript/mod.rs:45-102.

        The vk part is position-independent, so its serialization is cached
        on the vk object — batch verification appends the same vk once per
        proof and the bytes dominate the per-proof transcript cost."""
        cached = getattr(vk, "_solidity_vk_bytes", None)
        if cached is None:
            parts = [u32_to_bytes(self.curve.fr.p.bit_length()),
                     usize_to_bytes(vk.domain_size),
                     usize_to_bytes(vk.num_inputs)]
            parts += [field_to_bytes(self.curve.fr, ki) for ki in vk.k]
            parts += [g1_to_bytes(self.curve, c) for c in vk.selector_comms]
            parts += [g1_to_bytes(self.curve, c) for c in vk.sigma_comms]
            cached = b"".join(parts)
            try:
                vk._solidity_vk_bytes = cached
            except AttributeError:
                pass
        self.append_message(b"vk", cached)
        for x in pub_input:
            self.append_message(b"public input", field_to_bytes(self.curve.fr, x))

    def append_proof_evaluations(self, evals):
        """Reference transcript/mod.rs:149-168."""
        for w in evals.wires_evals:
            self.append_field(b"wire_evals", w)
        for s in evals.wire_sigma_evals:
            self.append_field(b"wire_sigma_evals", s)
        self.append_field(b"perm_next_eval", evals.perm_next_eval)

    def append_plookup_evaluations(self, evals):
        """Reference transcript/mod.rs:171-205."""
        self.append_field(b"lookup_table_eval", evals.range_table_eval)
        self.append_field(b"h_1_eval", evals.h_1_eval)
        self.append_field(b"prod_next_eval", evals.prod_next_eval)
        self.append_field(b"lookup_table_next_eval", evals.range_table_next_eval)
        self.append_field(b"h_1_next_eval", evals.h_1_next_eval)
        self.append_field(b"h_2_next_eval", evals.h_2_next_eval)

    def get_and_append_challenge(self, label: bytes) -> int:
        """Reference solidity.rs:53-77."""
        base = self.state + bytes(self.transcript)
        buf0 = keccak256(base + b"\x00")
        buf1 = keccak256(base + b"\x01")
        self.state = buf0 + buf1
        return int.from_bytes(self.state[:48], "little") % self.curve.fr.p


class RescueTranscript:
    """Rescue-sponge transcript over the curve's BASE field — exact mirror
    of `transcript/rescue.rs:26-190` (the recursion gadget replays it
    in-circuit, so structure is bit-parity-critical):

    - transcript: append-only list of Fq elements;
    - commitments absorbed as TE coordinates (SW->TE conversion);
    - vk absorption drops sizes/separators (rescue.rs:66-74);
    - challenge: tmp[0..4] = VariableLengthRescueCRHF(state ++ transcript),
      challenge = low-bytes mask of tmp[0] into Fr, state = tmp,
      transcript = [challenge].
    """

    def __init__(self, curve: CurveSpec, label: bytes = b"PlonkProof"):
        from ..primitives.rescue import RescueCRHF, STATE_SIZE
        self.curve = curve
        self._crhf = RescueCRHF(curve.fq)
        self.transcript: list = []
        self._state = [0] * STATE_SIZE

    def _sw_to_te(self, comm):
        from ..relation.gadgets.conversion import (BLS12_377_FQ_SW_TE,
                                                   convert_sw_to_te)
        fq = self.curve.fq
        if getattr(comm, "inf", False):
            return (0, 1)
        if self.curve.name == "bls12_377":
            return convert_sw_to_te(BLS12_377_FQ_SW_TE, comm.x, comm.y)
        # curves without a TE-form G1 (reference dummy impls,
        # conversion.rs:100-120): absorb the SW coordinates directly
        return (comm.x % fq.p, comm.y % fq.p)

    def append_message(self, label: bytes, msg: bytes):
        """rescue.rs:96-104 (labels dropped; bytes -> field elements)."""
        from ..utils.conversion import bytes_to_field_elements
        self.transcript.extend(bytes_to_field_elements(self.curve.fq.p, msg))

    def append_field(self, label: bytes, v: int):
        """field_switching of an Fr element into Fq (rescue.rs:130-136)."""
        self.transcript.append(v % self.curve.fq.p)

    def append_commitment(self, label: bytes, comm):
        ex, ey = self._sw_to_te(comm)
        self.transcript.append(ex)
        self.transcript.append(ey)

    def append_commitments(self, label: bytes, comms):
        for c in comms:
            self.append_commitment(label, c)

    def append_vk_and_pub_input(self, vk, pub_input):
        """rescue.rs:56-93: only selector comms, sigma comms, public input."""
        for c in vk.selector_comms:
            self.append_commitment(b"selector", c)
        for c in vk.sigma_comms:
            self.append_commitment(b"sigma", c)
        for e in pub_input:
            self.transcript.append(e % self.curve.fq.p)

    def append_proof_evaluations(self, evals):
        for w in evals.wires_evals:
            self.append_field(b"", w)
        for s in evals.wire_sigma_evals:
            self.append_field(b"", s)
        self.append_field(b"", evals.perm_next_eval)

    def append_plookup_evaluations(self, evals):
        """rescue.rs:154-166 (evals_vec then next_evals_vec)."""
        for e in evals.evals_vec():
            self.append_field(b"", e)
        for e in evals.next_evals_vec():
            self.append_field(b"", e)

    def get_and_append_challenge(self, label: bytes) -> int:
        """rescue.rs:168-190."""
        from ..utils.conversion import fq_to_fr_with_mask
        from ..primitives.rescue import STATE_SIZE
        tmp = self._crhf.sponge_with_bit_padding(
            self._state + self.transcript, STATE_SIZE)
        challenge = fq_to_fr_with_mask(self.curve.fr.p, tmp[0])
        self._state = list(tmp)
        self.transcript = [challenge % self.curve.fq.p]
        return challenge


# ---------------------------------------------------------------------------
# Merlin StandardTranscript (reference transcript/standard.rs:16-46)
# ---------------------------------------------------------------------------

class _Strobe128:
    """STROBE-128 over keccak-f[1600] — the duplex construction under
    Merlin (merlin::strobe::Strobe128; rate 166 bytes)."""

    R = 166
    _FLAG_I, _FLAG_A, _FLAG_C, _FLAG_T, _FLAG_M, _FLAG_K = 1, 2, 4, 8, 16, 32

    def __init__(self, protocol_label: bytes):
        st = bytearray(200)
        st[0:6] = bytes([1, self.R + 2, 1, 0, 1, 96])
        st[6:18] = b"STROBEv1.0.2"
        self.state = self._f(st)
        self.pos = 0
        self.pos_begin = 0
        self.cur_flags = 0
        self.meta_ad(protocol_label, False)

    @staticmethod
    def _f(st: bytearray) -> bytearray:
        from ..utils.keccak import _keccak_f
        lanes = [[int.from_bytes(st[8 * (5 * y + x):8 * (5 * y + x) + 8],
                                 "little") for y in range(5)]
                 for x in range(5)]
        _keccak_f(lanes)
        out = bytearray(200)
        for x in range(5):
            for y in range(5):
                out[8 * (5 * y + x):8 * (5 * y + x) + 8] = \
                    lanes[x][y].to_bytes(8, "little")
        return out

    def _run_f(self):
        self.state[self.pos] ^= self.pos_begin
        self.state[self.pos + 1] ^= 0x04
        self.state[self.R + 1] ^= 0x80
        self.state = self._f(self.state)
        self.pos = 0
        self.pos_begin = 0

    def _absorb(self, data: bytes):
        for b in data:
            self.state[self.pos] ^= b
            self.pos += 1
            if self.pos == self.R:
                self._run_f()

    def _squeeze(self, n: int) -> bytes:
        out = bytearray()
        for _ in range(n):
            out.append(self.state[self.pos])
            self.state[self.pos] = 0
            self.pos += 1
            if self.pos == self.R:
                self._run_f()
        return bytes(out)

    def _begin_op(self, flags: int, more: bool):
        if more:
            assert flags == self.cur_flags
            return
        assert not (flags & self._FLAG_T), "transport not supported"
        old_begin = self.pos_begin
        self.pos_begin = self.pos + 1
        self.cur_flags = flags
        self._absorb(bytes([old_begin, flags]))
        if (flags & (self._FLAG_C | self._FLAG_K)) and self.pos != 0:
            self._run_f()

    def meta_ad(self, data: bytes, more: bool):
        self._begin_op(self._FLAG_M | self._FLAG_A, more)
        self._absorb(data)

    def ad(self, data: bytes, more: bool):
        self._begin_op(self._FLAG_A, more)
        self._absorb(data)

    def prf(self, n: int, more: bool) -> bytes:
        self._begin_op(self._FLAG_I | self._FLAG_A | self._FLAG_C, more)
        return self._squeeze(n)


class StandardTranscript(SolidityTranscript):
    """Merlin transcript (reference `transcript/standard.rs:16-46`) — the
    reference API's default transcript.  Labels are significant here (unlike
    the Solidity transcript)."""

    def __init__(self, curve: CurveSpec, label: bytes = b"PlonkProof"):
        super().__init__(curve, label)
        self._strobe = _Strobe128(b"Merlin v1.0")
        self._merlin_append(b"dom-sep", label)

    def _merlin_append(self, label: bytes, msg: bytes):
        self._strobe.meta_ad(label, False)
        self._strobe.meta_ad(len(msg).to_bytes(4, "little"), True)
        self._strobe.ad(msg, False)

    def append_message(self, label: bytes, msg: bytes):
        self._merlin_append(label, msg)

    def get_and_append_challenge(self, label: bytes) -> int:
        """standard.rs:33-46: 64 challenge bytes -> Fr (LE mod order),
        then the serialized challenge is appended back."""
        self._strobe.meta_ad(label, False)
        self._strobe.meta_ad((64).to_bytes(4, "little"), True)
        buf = self._strobe.prf(64, False)
        challenge = int.from_bytes(buf, "little") % self.curve.fr.p
        self.append_message(label, field_to_bytes(self.curve.fr, challenge))
        return challenge
