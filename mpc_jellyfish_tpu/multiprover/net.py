"""Cross-process 2-party MPC fabric with a real transport.

This is the deployment-shaped counterpart of `MockFabric`
(SURVEY.md §2.7/§2.9; ark-mpc's `MpcFabric` over a QUIC connection): each
party is its own OS process holding ONLY its additive share slice
``share[L, 1, *batch]``; every opening moves that party's reduced share
across a transport (multiprocessing pipe or TCP socket) and sums with the
peer's.  SPDZ MAC checks never reveal the MAC key: each party exchanges
``d_p = mac_p - alpha_p * value`` and both verify ``d_0 + d_1 == 0``; checks
can be deferred and batched into one random-linear-combination exchange
(`ark-mpc`'s lazy-graph MAC batching).

Offline phase: Beaver triples / input shares come from a common-seed
"dealer" (the same draws as `MockFabric`, each party keeping its slice) -
mirroring the reference's `execute_mock_mpc` dealer model
(ark-mpc `test_helpers`), while the ONLINE phase is genuinely 2-process.
With equal seeds the opened values - hence the proof bytes - are identical
to a `MockFabric` run, which is the cross-process correctness oracle.
"""

from __future__ import annotations

import os
import pickle
import random
import struct

import jax
import jax.numpy as jnp

from ..ops import field as F
from ..ops import ec as E
from .fabric import MockFabric, Shared

# ---------------------------------------------------------------------------
# transports
# ---------------------------------------------------------------------------


class PipeTransport:
    """multiprocessing.Pipe connection (same-host, 2-process tests)."""

    def __init__(self, conn):
        self.conn = conn

    def send(self, obj):
        self.conn.send(obj)

    def recv(self):
        return self.conn.recv()

    def close(self):
        self.conn.close()


class SocketTransport:
    """Length-prefixed pickle over a TCP socket (separate hosts)."""

    def __init__(self, sock):
        self.sock = sock

    def send(self, obj):
        data = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
        self.sock.sendall(struct.pack("<Q", len(data)) + data)

    def recv(self):
        hdr = self._read_exact(8)
        (n,) = struct.unpack("<Q", hdr)
        return pickle.loads(self._read_exact(n))

    def _read_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("peer closed")
            buf += chunk
        return buf

    def close(self):
        self.sock.close()


# ---------------------------------------------------------------------------
# network fabric
# ---------------------------------------------------------------------------


class NetworkFabric(MockFabric):
    """2-party SPDZ fabric where this process holds only its share slice.

    Same API as `MockFabric`; the party axis has length 1 locally.  All
    linear ops are inherited (they are share-local); openings, MAC checks
    and point openings go over `transport`.
    """

    def __init__(self, spec, party_id: int, transport, seed: int = 0,
                 mac_seed: int = 0xA5):
        super().__init__(spec, seed)
        assert party_id in (0, 1)
        self.party_id = party_id
        self.transport = transport
        self._alpha_local = self._alpha_shares[:, party_id:party_id + 1]
        del mac_seed  # legacy arg: RLC coefficients now come from a joint
        # commit-reveal coin flip AFTER the opened values are fixed (SPDZ
        # MAC-check shape) — a fixed common seed would let a malicious peer
        # precompute forgeries that cancel in the RLC.
        self._defer = False
        self._deferred = []

    # -- dealer: common-seed draws, keep the local slice -------------------
    def _share_of_values(self, values: list) -> Shared:
        full = super()._share_of_values(values)
        p = self.party_id
        return Shared(full.share[:, p:p + 1], full.mac[:, p:p + 1])

    # -- public-constant addition ------------------------------------------
    def add_public(self, a: Shared, c: jnp.ndarray) -> Shared:
        spec = self.spec
        nb = len(a.batch_shape)
        cb = c[:, None] if c.ndim == 1 + nb else c          # [L, 1, *batch]
        if self.party_id == 0:
            full = (spec.num_limbs, 1) + a.batch_shape
            share = F.add(spec, a.share, jnp.broadcast_to(cb, full))
        else:
            share = a.share
        alpha_r = self._alpha_local.reshape((spec.num_limbs, 1) + (1,) * nb)
        mac = F.add(spec, a.mac, F.mul(spec, alpha_r, cb))
        return Shared(share, mac)

    # -- openings ------------------------------------------------------------
    def _exchange(self, tree):
        """Send our tensor(s), receive the peer's (party 0 sends first)."""
        import numpy as np
        payload = jax.tree_util.tree_map(lambda x: np.asarray(x), tree)
        if self.party_id == 0:
            self.transport.send(payload)
            other = self.transport.recv()
        else:
            other = self.transport.recv()
            self.transport.send(payload)
        return jax.tree_util.tree_map(jnp.asarray, other)

    def open(self, a: Shared, check: bool = True) -> jnp.ndarray:
        return self.open_batch([a], check)[0]

    def open_batch(self, shareds: list, check: bool = True) -> list:
        """Open MANY shares in ONE transport exchange (the wire payload is
        the tuple of local sums) — ark-mpc-style round batching."""
        spec = self.spec
        if not shareds:
            return []
        self.n_openings += 1
        locals_ = tuple(F.sum_reduce(spec, a.share, axis=1) for a in shareds)
        remotes = self._exchange(locals_)
        values = [F.add(spec, lo, re) for lo, re in zip(locals_, remotes)]
        if check:
            items = [(v, F.sum_reduce(spec, a.mac, axis=1))
                     for v, a in zip(values, shareds)]
            if self._defer:
                self._deferred.extend(items)
            else:
                self._run_mac_check(items)
        return values

    def open_point(self, fq, jac_local):
        """Open an EC point: exchange Jacobian limb tensors and add."""
        return self.open_point_batch(fq, [jac_local])[0]

    def open_point_batch(self, fq, jac_locals: list) -> list:
        """Open MANY EC point shares in one transport exchange."""
        if not jac_locals:
            return []
        self.n_openings += 1
        remotes = self._exchange(tuple(tuple(j) for j in jac_locals))
        return [E.jac_add(fq, tuple(lo), tuple(re))
                for lo, re in zip(jac_locals, remotes)]

    # -- batched / deferred MAC checks ---------------------------------------
    def begin_deferred_checks(self):
        self._defer = True

    def verify_deferred_checks(self):
        """One RLC-batched check for every deferred opening (one exchange)."""
        self._defer = False
        items, self._deferred = self._deferred, []
        if items:
            self._run_mac_check(items)

    def _joint_coin(self, items) -> random.Random:
        """Commit-reveal coin flip bound to the opened values.

        Each party samples fresh randomness, exchanges SHA-256 commitments,
        then reveals; the RLC seed is H(s0 || s1 || opened values).  Sampling
        AFTER the values are fixed (and verifying the peer's commitment)
        makes the batched check sound against a malicious peer — the peer
        cannot choose its contribution to cancel a forged opening."""
        import hashlib
        import numpy as np
        s_local = os.urandom(32)
        com = hashlib.sha256(bytes([self.party_id]) + s_local).digest()
        com_remote = self._exchange_raw(com)
        s_remote = self._exchange_raw(s_local)
        expect = hashlib.sha256(bytes([1 - self.party_id]) + s_remote)
        if expect.digest() != com_remote:
            raise ValueError("MAC-check coin flip: commitment mismatch")
        h = hashlib.sha256()
        h.update(s_local if self.party_id == 0 else s_remote)
        h.update(s_remote if self.party_id == 0 else s_local)
        for value, _ in items:
            h.update(np.asarray(value).tobytes())
        return random.Random(int.from_bytes(h.digest(), "big"))

    def _exchange_raw(self, payload: bytes) -> bytes:
        if self.party_id == 0:
            self.transport.send(payload)
            return self.transport.recv()
        other = self.transport.recv()
        self.transport.send(payload)
        return other

    def _run_mac_check(self, items):
        """sum_i r_i * (mac_i - alpha * v_i) == 0, without revealing alpha:
        each party contributes d_p = sum_i r_i * (mac_p,i - alpha_p * v_i)."""
        spec = self.spec
        rng = self._joint_coin(items)
        acc = None
        for value, mac_local in items:
            v = value.reshape(spec.num_limbs, -1)
            m = mac_local.reshape(spec.num_limbs, -1)
            k = v.shape[1]
            r = spec.to_device(
                [rng.randrange(spec.p) for _ in range(k)])
            d = F.sub(spec, m, F.mul(spec, v, self._alpha_local))
            t = F.sum_reduce(spec, F.mul(spec, d, r), axis=1)
            acc = t if acc is None else F.add(spec, acc, t)
        remote = self._exchange(acc)
        total = F.add(spec, acc, remote)
        if not bool(jnp.all(F.is_zero(spec, total))):
            raise ValueError("batched MAC check failed on opening")


# ---------------------------------------------------------------------------
# 2-process test harness (the reference's execute_mock_mpc, cross-process)
# ---------------------------------------------------------------------------


def _party_main(worker, party_id, conn, seed, kwargs, queue):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    try:
        result = worker(party_id, PipeTransport(conn), seed, **kwargs)
        queue.put((party_id, "ok", result))
    except Exception as exc:  # surface the traceback to the parent
        import traceback
        queue.put((party_id, "err", f"{exc}\n{traceback.format_exc()}"))


def execute_network_mpc(worker, seed: int = 0, timeout: float = 600.0,
                        **kwargs):
    """Run `worker(party_id, transport, seed, **kwargs)` in 2 processes.

    Returns (result_party0, result_party1); raises on either party's error.
    """
    import multiprocessing as mp
    ctx = mp.get_context("spawn")
    c0, c1 = ctx.Pipe()
    queue = ctx.Queue()
    procs = [
        ctx.Process(target=_party_main,
                    args=(worker, pid, conn, seed, kwargs, queue))
        for pid, conn in ((0, c0), (1, c1))
    ]
    for p in procs:
        p.start()
    results = {}
    try:
        for _ in range(2):
            pid, status, payload = queue.get(timeout=timeout)
            if status == "err":
                raise RuntimeError(f"party {pid} failed: {payload}")
            results[pid] = payload
    finally:
        for p in procs:
            p.join(timeout=30)
            if p.is_alive():
                p.terminate()
                p.join()
    return results[0], results[1]
