"""Persistent AOT cache of lowered executables via jax.export.

Pallas/Mosaic lowering of the big limb-arithmetic kernels costs ~30-60s of
Python MLIR building per (function, shape) and is re-paid by every process;
XLA's own persistent cache only skips the backend compile.  This module
caches the *serialized StableHLO export* on disk so warm processes skip
tracing and lowering entirely (measured: 65s -> 14s first-call on a v5e,
<1ms steady).

Keying: user key + platform + jax version + a salt over the compute-kernel
source files (so code edits invalidate stale artifacts).
"""

from __future__ import annotations

import functools
import hashlib
import os

import jax

_MEMO: dict = {}


@functools.lru_cache(maxsize=1)
def _code_salt() -> str:
    import mpc_jellyfish_tpu.ops as ops_pkg
    root = os.path.dirname(ops_pkg.__file__)
    h = hashlib.sha256()
    for fn in sorted(os.listdir(root)):
        if fn.endswith(".py"):
            with open(os.path.join(root, fn), "rb") as f:
                h.update(f.read())
    h.update(jax.__version__.encode())
    return h.hexdigest()[:16]


def _cache_dir() -> str:
    d = os.environ.get(
        "MPC_JELLYFISH_TPU_CACHE",
        os.path.expanduser("~/.cache/mpc_jellyfish_tpu_xla"))
    d = os.path.join(d, "export")
    os.makedirs(d, exist_ok=True)
    return d


def cached_jit(key: str, fn, *example_args):
    """Return a callable computing jax.jit(fn)(*args) for the example shapes.

    On a cache hit the function is restored from the serialized export (no
    tracing/lowering); on a miss it is traced, exported and persisted.
    `fn` must be a pure function of its positional array arguments.
    """
    platform = jax.default_backend()
    full_key = f"{key}-{platform}-{_code_salt()}"
    if full_key in _MEMO:
        return _MEMO[full_key]
    path = os.path.join(_cache_dir(), hashlib.sha256(
        full_key.encode()).hexdigest()[:32] + ".jaxexport")
    call = None
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                exp = jax.export.deserialize(f.read())
            call = jax.jit(exp.call)
        except Exception:
            call = None  # stale/corrupt artifact: fall through to re-export
    if call is None:
        jitted = jax.jit(fn)
        try:
            exp = jax.export.export(jitted)(*example_args)
            blob = exp.serialize()
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)
            call = jax.jit(exp.call)
        except Exception:
            call = jitted  # export unsupported: plain jit still works
    _MEMO[full_key] = call
    return call
