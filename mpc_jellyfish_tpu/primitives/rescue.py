"""Rescue algebraic permutation, sponge, CRHF, PRF, commitment.

Mirror of the reference `primitives/src/rescue/` family (SURVEY.md §2.3):
`RescueParameter` (per-field constants), `PRP` (keyed permutation),
`Permutation::eval`, `RescueCRHF` sponges, `RescuePRF`,
`FixedLengthRescueCommitment`.

Parameter generation: the reference ships hardcoded per-field constant
tables (rescue_constants/*.rs, generated offline by the Marvellous scripts).
We generate an equivalent self-consistent instance deterministically:
round constants from a keccak256-based PRG with rejection sampling, and a
Cauchy-matrix MDS (provably MDS for distinct parameters).  STATE_SIZE=4,
RATE=3, 12 rounds, alpha = smallest odd prime with gcd(alpha, p-1) = 1 -
the same shape as the reference (rescue/mod.rs:31-76).

Two implementations share the constants: a host (Python int) reference and a
batched device kernel ([L, 4, batch] limb tensors) for Merkle-scale hashing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import field as F
from ..ops.field import FieldSpec
from ..utils.keccak import keccak256

STATE_SIZE = 4
CRHF_RATE = 3
ROUNDS = 12


class RescueParams:
    """Per-field Rescue instance (mirror of `RescueParameter`)."""

    _cache: dict = {}

    def __new__(cls, spec: FieldSpec):
        if spec.name in cls._cache:
            return cls._cache[spec.name]
        self = super().__new__(cls)
        cls._cache[spec.name] = self
        self.spec = spec
        p = spec.p
        # alpha: smallest odd prime power map that is a bijection
        alpha = 3
        while (p - 1) % alpha == 0:
            alpha += 2
        self.alpha = alpha
        self.alpha_inv = pow(alpha, -1, p - 1)
        # round constants: 2 per round per state element + initial
        seed = f"mpc-jellyfish-tpu rescue v1 {spec.name}".encode()
        self.round_constants = self._prg_field_elems(
            seed, (2 * ROUNDS + 1) * STATE_SIZE)
        # MDS: Cauchy matrix 1/(x_i - y_j), x = 0..3, y = 4..7
        self.mds = [[pow((i - (STATE_SIZE + j)) % p, -1, p)
                     for j in range(STATE_SIZE)] for i in range(STATE_SIZE)]
        return self

    def _prg_field_elems(self, seed: bytes, count: int) -> list:
        p = self.spec.p
        out = []
        ctr = 0
        nbytes = (p.bit_length() + 7) // 8 + 8  # oversample -> negligible bias
        while len(out) < count:
            block = b""
            while len(block) < nbytes:
                block += keccak256(seed + ctr.to_bytes(8, "little"))
                ctr += 1
            out.append(int.from_bytes(block[:nbytes], "little") % p)
        return out

    # -- host permutation -------------------------------------------------
    def _spow(self, x: int, inverse: bool) -> int:
        e = self.alpha_inv if inverse else self.alpha
        return pow(x, e, self.spec.p)

    def _mds_mul(self, state: list) -> list:
        p = self.spec.p
        return [sum(self.mds[i][j] * state[j] for j in range(STATE_SIZE)) % p
                for i in range(STATE_SIZE)]

    def key_schedule(self, key: list) -> list:
        """Round keys K_0..K_{2*ROUNDS} (mirror of PRP key schedule,
        rescue/mod.rs:239-356): K_0 = key + c_0;
        K_{r+1} = MDS(S_r(K_r)) + c_{r+1}."""
        p = self.spec.p
        rc = self.round_constants
        keys = []
        k = [(key[i] + rc[i]) % p for i in range(STATE_SIZE)]
        keys.append(list(k))
        for r in range(2 * ROUNDS):
            k = [self._spow(x, inverse=(r % 2 == 1)) for x in k]
            k = self._mds_mul(k)
            c = rc[(r + 1) * STATE_SIZE:(r + 2) * STATE_SIZE]
            k = [(a + b) % p for a, b in zip(k, c)]
            keys.append(list(k))
        return keys

    def prp_with_keys(self, round_keys: list, state: list) -> list:
        """Apply the permutation given a precomputed key schedule."""
        p = self.spec.p
        s = [(state[i] + round_keys[0][i]) % p for i in range(STATE_SIZE)]
        for r in range(2 * ROUNDS):
            s = [self._spow(x, inverse=(r % 2 == 1)) for x in s]
            s = self._mds_mul(s)
            s = [(a + b) % p for a, b in zip(s, round_keys[r + 1])]
        return s

    def prp(self, key: list, state: list) -> list:
        """Keyed Rescue PRP (mirror of `PRP::prp`)."""
        return self.prp_with_keys(self.key_schedule(key), state)

    @functools.cached_property
    def zero_key_schedule(self) -> list:
        return self.key_schedule([0] * STATE_SIZE)

    def permute(self, state: list) -> list:
        """Unkeyed permutation (mirror of `Permutation::eval`)."""
        return self.prp_with_keys(self.zero_key_schedule, state)

    # -- device constants --------------------------------------------------
    @functools.cached_property
    def device_tables(self):
        """(round_keys [2R+1][L, 4, 1], mds [L, 4, 4, 1]) Montgomery device."""
        spec = self.spec
        keys = self.zero_key_schedule
        kflat = [v for ks in keys for v in ks]
        kd = spec.to_device(kflat).reshape(
            spec.num_limbs, 2 * ROUNDS + 1, STATE_SIZE, 1)
        mflat = [self.mds[i][j] for i in range(STATE_SIZE)
                 for j in range(STATE_SIZE)]
        md = spec.to_device(mflat).reshape(
            spec.num_limbs, STATE_SIZE, STATE_SIZE, 1)
        return kd, md


def _pow_alpha(spec, x, alpha: int):
    return F.pow_static(spec, x, alpha)


@functools.partial(jax.jit, static_argnums=(0, 1))
def permute_batch(spec: FieldSpec, params_key: str, states, round_keys, mds):
    """Batched unkeyed Rescue permutation.

    states: [L, 4, B] Montgomery tensor; round_keys [L, 2R+1, 4, 1];
    mds [L, 4, 4, 1].  Returns [L, 4, B].
    """
    params = RescueParams._cache[params_key]
    alpha = params.alpha
    alpha_inv = params.alpha_inv

    def mds_mul(s):
        # out[i] = sum_j mds[i][j] * s[j]
        prod = F.mul(spec, mds, s[:, None, :, :])        # [L, 4, 4, B]
        return F.sum_reduce(spec, prod, axis=2)          # [L, 4, B]

    s = F.add(spec, states, round_keys[:, 0])
    for r in range(2 * ROUNDS):
        if r % 2 == 0:
            s = F.pow_static(spec, s, alpha)
        else:
            s = F._pow_loop(spec, s, alpha_inv)
        s = mds_mul(s)
        s = F.add(spec, s, round_keys[:, r + 1])
    return s


# ---------------------------------------------------------------------------
# sponge constructions (host; device variants go through permute_batch)
# ---------------------------------------------------------------------------

class RescueCRHF:
    """Sponge-based hashes (mirror of rescue/sponge.rs, crhf.rs)."""

    def __init__(self, spec: FieldSpec):
        self.params = RescueParams(spec)
        self.p = spec.p

    def sponge_no_padding(self, inputs: list, num_outputs: int) -> list:
        if len(inputs) % CRHF_RATE != 0:
            raise ValueError("input length must be a multiple of the rate")
        return self._sponge(list(inputs), num_outputs)

    def sponge_with_zero_padding(self, inputs: list, num_outputs: int) -> list:
        pad = (-len(inputs)) % CRHF_RATE
        return self._sponge(list(inputs) + [0] * pad, num_outputs)

    def sponge_with_bit_padding(self, inputs: list, num_outputs: int) -> list:
        padded = list(inputs) + [1]
        padded += [0] * ((-len(padded)) % CRHF_RATE)
        return self._sponge(padded, num_outputs)

    def _sponge(self, inputs: list, num_outputs: int) -> list:
        state = [0] * STATE_SIZE
        for off in range(0, len(inputs), CRHF_RATE):
            for i in range(CRHF_RATE):
                state[i] = (state[i] + inputs[off + i]) % self.p
            state = self.params.permute(state)
        out = []
        while len(out) < num_outputs:
            out.extend(state[:CRHF_RATE])
            if len(out) < num_outputs:
                state = self.params.permute(state)
        return out[:num_outputs]


class RescuePRF:
    """Keyed PRF (mirror of rescue/prf.rs `RescuePRFCore`)."""

    def __init__(self, spec: FieldSpec):
        self.params = RescueParams(spec)
        self.p = spec.p

    def full_state_keyed_sponge(self, key: int, inputs: list,
                                num_outputs: int) -> list:
        padded = list(inputs)
        padded += [0] * ((-len(padded)) % STATE_SIZE)
        state = [0, 0, 0, key % self.p]
        for off in range(0, len(padded), STATE_SIZE):
            for i in range(STATE_SIZE):
                state[i] = (state[i] + padded[off + i]) % self.p
            state = self.params.permute(state)
        out = []
        while len(out) < num_outputs:
            out.extend(state[:CRHF_RATE])
            if len(out) < num_outputs:
                state = self.params.permute(state)
        return out[:num_outputs]


class RescueCommitment:
    """Fixed-length commitment: commit(input, blind) = H(blind || input || pad)
    (mirror of commitment.rs `FixedLengthRescueCommitment`)."""

    def __init__(self, spec: FieldSpec):
        self.crhf = RescueCRHF(spec)

    def commit(self, inputs: list, blind: int) -> int:
        return self.crhf.sponge_with_zero_padding([blind] + list(inputs), 1)[0]

    def verify(self, value: int, inputs: list, blind: int) -> bool:
        return self.commit(inputs, blind) == value
