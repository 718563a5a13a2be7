"""Short-Weierstrass -> twisted-Edwards point conversion.

Mirror of `relation/src/gadgets/ecc/conversion.rs:30-110`.  Used to absorb
SW-form G1 commitments into Rescue-based transcripts / recursion circuits as
TE coordinates.  The conversion goes SW -> Montgomery -> TE:
    mx = s (px - alpha),  my = s py
    ex = beta mx / my,    ey = (mx - 1) / (mx + 1)
Constants (s, -alpha, beta) are per-base-field; BLS12-377's are published in
the reference, BN254 has a dummy impl there (its G1 has no TE form since the
group order is even only with cofactor 1... the reference simply never uses
it), which we mirror.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class SWToTEParams:
    """Constants for the SW->TE map over a specific base field."""
    q: int          # base field modulus
    s: int
    neg_alpha: int
    beta: int


# BLS12-377 Fq (conversion.rs:62-96)
BLS12_377_FQ_SW_TE = SWToTEParams(
    q=0x01ae3a4617c510eac63b05c06ca1493b1a22d9f300f5138f1ef3622fba094800170b5d44300000008508c00000000001,
    s=10189023633222963290707194929886294091415157242906428298294512798502806398782149227503530278436336312243746741931,
    neg_alpha=1,
    beta=23560188534917577818843641916571445935985386319233886518929971599490231428764380923487987729215299304184915158756,
)


def convert_sw_to_te(params: SWToTEParams, px: int, py: int):
    """Host-side conversion of an SW affine point to TE coordinates
    (conversion.rs:30-55)."""
    q = params.q
    mx = params.s * ((px + params.neg_alpha) % q) % q
    my = params.s * py % q
    ex = params.beta * mx % q * pow(my, -1, q) % q
    ey = (mx - 1) * pow(mx + 1, -1, q) % q
    return (ex, ey)
