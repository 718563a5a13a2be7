"""Device Fiat-Shamir chain == host SolidityTranscript, byte-for-byte.

The device transcript must replay the exact challenge sequence of the
host transcript (itself pinned against independent keccak vectors in
test_transcript_vectors.py), or device-FS proofs would diverge from the
reference protocol.
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from mpc_jellyfish_tpu.curves import BN254
from mpc_jellyfish_tpu.ops import field as F
from mpc_jellyfish_tpu.plonk.transcript import SolidityTranscript
from mpc_jellyfish_tpu.plonk.device_transcript import (
    DeviceSolidityTranscript, fr_from_le48_dev, g1_bytes_dev)
from mpc_jellyfish_tpu.utils.serialize import g1_to_bytes
from mpc_jellyfish_tpu.utils.ec_host import AffinePoint, ec_mul


def _mont_int(spec, t):
    return spec.from_device(t)[0]


def test_fr_from_le48():
    spec = BN254.fr
    rng = random.Random(0)
    for _ in range(10):
        b = bytes(rng.randrange(256) for _ in range(48))
        want = int.from_bytes(b, "little") % spec.p
        got = fr_from_le48_dev(
            spec, jnp.asarray(np.frombuffer(b, np.uint8)))
        assert _mont_int(spec, got) == want


def test_g1_bytes_dev():
    fq = BN254.fq
    G = AffinePoint(*BN254.g1_gen)
    rng = random.Random(1)
    pts = [ec_mul(fq.p, G, rng.randrange(1, 1 << 60)) for _ in range(6)]
    pts.append(AffinePoint.infinity())
    for pt in pts:
        if pt.inf:
            aff = (F.zeros(fq, (1,)), F.zeros(fq, (1,)),
                   jnp.ones((1,), dtype=bool))
        else:
            aff = (fq.to_device([pt.x]), fq.to_device([pt.y]),
                   jnp.zeros((1,), dtype=bool))
        got = bytes(np.asarray(g1_bytes_dev(BN254, aff)))
        assert got == g1_to_bytes(BN254, pt), pt


def test_challenge_chain_parity():
    curve = BN254
    spec = curve.fr
    rng = random.Random(2)
    G = AffinePoint(*curve.g1_gen)

    host = SolidityTranscript(curve)
    dev = DeviceSolidityTranscript(curve)

    prefix = bytes(rng.randrange(256) for _ in range(123))
    host.append_message(b"x", prefix)
    dev.append_host_bytes(prefix)

    for round_ in range(4):
        comms = [ec_mul(spec.p, G, rng.randrange(1, spec.p))
                 for _ in range(3)]
        host.append_commitments(b"c", comms)
        for c in comms:
            aff = (curve.fq.to_device([c.x]), curve.fq.to_device([c.y]),
                   jnp.zeros((1,), dtype=bool))
            dev.append_commitment_dev(aff)
        vals = [rng.randrange(spec.p) for _ in range(2)]
        for v in vals:
            host.append_field(b"f", v)
            dev.append_field_dev(spec.to_device([v]))
        want = host.get_and_append_challenge(b"ch")
        got = _mont_int(spec, dev.get_and_append_challenge_dev())
        assert got == want, f"round {round_}"
