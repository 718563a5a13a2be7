"""In-circuit Schnorr signature verification.

Mirror of `primitives/src/circuit/signature/schnorr.rs:30-193`: the
verification equation s*G == R + c*VK is checked over the embedded TE curve
with the challenge c recomputed in-circuit as the low 248 bits of
Rescue(csid, vk, R, msg) (`challenge_bits`, schnorr.rs:172-192;
`verify_sig_core`, schnorr.rs:136-152).
"""

from __future__ import annotations

from ...relation.circuit import PlonkCircuit, BoolVar
from ...relation.gadgets.ecc import (PointVariable, create_point_variable,
                                     ecc_add, enforce_point_equal,
                                     fixed_base_scalar_mul, is_point_equal,
                                     variable_base_binary_scalar_mul)
from ...utils.te_curve import TECurve
from ...utils.conversion import fr_to_fq
from ..signatures import CS_ID_SCHNORR, SchnorrSignature
from .rescue import rescue_sponge_with_padding


class VerKeyVar:
    """schnorr.rs:32."""

    __slots__ = ("point",)

    def __init__(self, point: PointVariable):
        self.point = point


class SignatureVar:
    """schnorr.rs:37-42."""

    __slots__ = ("s", "R")

    def __init__(self, s: int, R: PointVariable):
        self.s = s
        self.R = R


def create_signature_variable(cs: PlonkCircuit, curve: TECurve,
                              sig: SchnorrSignature) -> SignatureVar:
    """schnorr.rs:121-131 (s lifted into the base field via fr_to_fq)."""
    return SignatureVar(
        s=cs.create_variable(fr_to_fq(cs.p, sig.s)),
        R=create_point_variable(cs, sig.R))


def create_signature_vk_variable(cs: PlonkCircuit, vk) -> VerKeyVar:
    """schnorr.rs:133-136."""
    return VerKeyVar(create_point_variable(cs, vk))


def _challenge_bits(cs: PlonkCircuit, vk: VerKeyVar, sig_point: PointVariable,
                    msg, csid: bytes) -> list:
    """Low 248 challenge bits, little-endian (schnorr.rs:172-192)."""
    inst = int.from_bytes(csid, "big") % cs.p
    inst_var = cs.create_variable(inst)
    cs.enforce_constant(inst_var, inst)
    chal_input = [inst_var, vk.point.x, vk.point.y,
                  sig_point.x, sig_point.y] + list(msg)
    challenge = rescue_sponge_with_padding(cs, chal_input, 1)[0]
    field_bits = cs.p.bit_length()
    chal_bits = (((cs.p.bit_length() + 7) // 8) - 1) * 8
    return cs.unpack(challenge, field_bits)[:chal_bits]


def verify_sig_core(cs: PlonkCircuit, curve: TECurve, vk: VerKeyVar, msg,
                    sig: SignatureVar, csid: bytes = CS_ID_SCHNORR):
    """(p1, p2) = (s*G, R + c*VK) (schnorr.rs:136-152)."""
    c_bits_le = _challenge_bits(cs, vk, sig.R, msg, csid)
    p1 = fixed_base_scalar_mul(cs, curve, sig.s, curve.gen)
    z = variable_base_binary_scalar_mul(cs, curve, c_bits_le, vk.point)
    p2 = ecc_add(cs, curve, sig.R, z)
    return p1, p2


def verify_signature(cs: PlonkCircuit, curve: TECurve, vk: VerKeyVar, msg,
                     sig: SignatureVar, csid: bytes = CS_ID_SCHNORR):
    """Enforcing variant (schnorr.rs:98-109)."""
    p1, p2 = verify_sig_core(cs, curve, vk, msg, sig, csid)
    enforce_point_equal(cs, p1, p2)


def check_signature_validity(cs: PlonkCircuit, curve: TECurve, vk: VerKeyVar,
                             msg, sig: SignatureVar,
                             csid: bytes = CS_ID_SCHNORR) -> BoolVar:
    """Bool-returning variant (schnorr.rs:111-119)."""
    p1, p2 = verify_sig_core(cs, curve, vk, msg, sig, csid)
    return is_point_equal(cs, p1, p2)


for _f in (create_signature_variable, create_signature_vk_variable,
           verify_sig_core, verify_signature, check_signature_validity):
    setattr(PlonkCircuit, _f.__name__, _f)
