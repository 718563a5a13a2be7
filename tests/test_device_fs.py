"""Device-resident Fiat-Shamir prove == host-transcript prove, byte-equal.

The device-FS path (snark._prove_device_fs) keeps the whole round chain on
device; the proof BYTES must be identical to the host path's — same
serialization, challenge math and rng draw order (the verifier replays the
host transcript either way).
"""

import os
import random

import pytest

from mpc_jellyfish_tpu.curves import BN254
from mpc_jellyfish_tpu.relation.circuit import PlonkCircuit
from mpc_jellyfish_tpu.plonk.snark import PlonkKzgSnark
from mpc_jellyfish_tpu.pcs import kzg
from mpc_jellyfish_tpu.utils.serialize import proof_to_bytes

spec = BN254.fr


def _circuit():
    rng = random.Random(7)
    cs = PlonkCircuit(spec)
    vals = [cs.create_variable(rng.randrange(spec.p)) for _ in range(8)]
    out = cs.create_public_variable(0)
    acc = vals[0]
    while cs.num_gates() < 200:
        acc = cs.mul(acc, vals[cs.num_gates() % 8])
    cs.witness[out] = cs.witness_of(acc)
    cs.enforce_equal(acc, out)
    cs.finalize_for_arithmetization()
    return cs


def test_device_fs_proof_byte_parity(monkeypatch):
    cs = _circuit()
    snark = PlonkKzgSnark(BN254)
    srs = kzg.universal_setup_for_testing(BN254, cs.srs_size(), seed=3)
    pk, vk = snark.preprocess(srs, cs)

    monkeypatch.setenv("MPC_JELLYFISH_TPU_DEVICE_FS", "0")
    p_host = snark.prove(cs, pk, rng=random.Random(0), mask=True)
    b_host = proof_to_bytes(BN254, p_host)

    monkeypatch.setenv("MPC_JELLYFISH_TPU_DEVICE_FS", "1")
    p_dev = snark.prove(cs, pk, rng=random.Random(0), mask=True)
    b_dev = proof_to_bytes(BN254, p_dev)

    assert snark.verify(vk, cs.public_input(), p_dev)
    assert b_host == b_dev
