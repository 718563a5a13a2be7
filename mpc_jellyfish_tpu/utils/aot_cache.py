"""Persistent AOT cache of lowered executables via jax.export.

Pallas/Mosaic lowering of the big limb-arithmetic kernels costs ~30-60s of
Python MLIR building per (function, shape) and is re-paid by every process;
XLA's own persistent cache only skips the backend compile.  This module
caches the *serialized StableHLO export* on disk so warm processes skip
tracing and lowering entirely (measured: 65s -> 14s first-call on a v5e,
<1ms steady).

Keying: user key + platform + jax version + a recursive hash of the traced
function's bytecode (so editing a round body invalidates exactly that
round) + a salt over the kernel source files the entry DEPENDS on (callers
pass `deps=`; editing ops/msm.py no longer invalidates every NTT artifact
and vice versa — round-2's global salt made any ops/ edit a full 15-min
recompile).
"""

from __future__ import annotations

import functools
import hashlib
import os
import types

import jax

_MEMO: dict = {}

# dependency groups -> package-relative source files.  "core" is implied
# for every entry (all kernels build on the limb field arithmetic).
_DEP_FILES = {
    "core": ("ops/field.py", "ops/pallas_field.py", "utils/bigint.py"),
    "ntt": ("ops/ntt.py", "ops/pallas_ntt.py"),
    "msm": ("ops/msm.py", "ops/ec.py"),
    "poly": ("ops/poly.py",),
    "kzg": ("pcs/kzg.py",),
    "prover": ("plonk/prover.py",),
    "parallel": ("parallel/backend.py", "parallel/sharded.py",
                 "ops/group_ntt.py"),
    "keccak": ("ops/keccak.py", "plonk/device_transcript.py"),
}


@functools.lru_cache(maxsize=None)
def _files_salt(files: tuple) -> str:
    import mpc_jellyfish_tpu as pkg
    root = os.path.dirname(pkg.__file__)
    h = hashlib.sha256()
    for rel in files:
        path = os.path.join(root, rel)
        if os.path.exists(path):
            with open(path, "rb") as f:
                h.update(f.read())
    h.update(jax.__version__.encode())
    return h.hexdigest()[:16]


@functools.lru_cache(maxsize=1)
def _all_ops_files() -> tuple:
    import mpc_jellyfish_tpu.ops as ops_pkg
    root = os.path.dirname(ops_pkg.__file__)
    return tuple(
        "ops/" + fn for fn in sorted(os.listdir(root)) if fn.endswith(".py"))


def _dep_salt(deps) -> str:
    if deps is None:
        files = _all_ops_files()          # legacy: whole ops package
    else:
        files = []
        for d in ("core",) + tuple(deps):
            files.extend(_DEP_FILES[d])
        files = tuple(dict.fromkeys(files))
    return _files_salt(files)


def _code_hash(fn) -> str:
    """Recursive hash of fn's bytecode + nested code objects + closure
    functions.  Catches edits to the traced body itself (the file-level
    dep salt catches edits to the kernels it calls)."""
    h = hashlib.sha256()
    seen = set()

    def walk(code):
        if id(code) in seen:
            return
        seen.add(id(code))
        h.update(code.co_code)
        for c in code.co_consts:
            if isinstance(c, types.CodeType):
                walk(c)

    target = fn
    while isinstance(target, functools.partial):
        target = target.func
    if hasattr(target, "__code__"):
        walk(target.__code__)
        for cell in (target.__closure__ or ()):
            try:
                v = cell.cell_contents
            except ValueError:
                continue
            if isinstance(v, types.FunctionType):
                walk(v.__code__)
    return h.hexdigest()[:16]


def repo_cache_root() -> str | None:
    """Repo-local cache root (<repo>/.tpu_cache) when the package lives in a
    writable checkout, else None.  TPU artifacts go HERE so they survive the
    environment resets that wipe $HOME between builder and driver runs
    (round 3: a wiped $HOME cost 252.9s preprocess + 499.4s warmup re-compiles
    at 2^16).  jax.export blobs and XLA:TPU executables are keyed by platform
    and runtime version, not host CPU features, so committing them is safe;
    XLA:CPU artifacts are NOT host-portable and stay in $HOME."""
    import mpc_jellyfish_tpu as pkg
    root = os.path.dirname(os.path.dirname(os.path.abspath(pkg.__file__)))
    d = os.path.join(root, ".tpu_cache")
    try:
        os.makedirs(d, exist_ok=True)
        return d
    except OSError:
        return None


def _cache_dir() -> str:
    exact = os.environ.get("MPC_JELLYFISH_EXPORT_DIR")
    if exact:
        # exact directory, no host fingerprint: StableHLO export blobs are
        # host-portable, so callers (the multichip dryrun) can point this at
        # a repo-committed dir that survives the $HOME wipe between builder
        # and driver runs
        os.makedirs(exact, exist_ok=True)
        return exact
    d = os.environ.get("MPC_JELLYFISH_TPU_CACHE")
    if d is None:
        if jax.default_backend() == "tpu":
            d = repo_cache_root()
        if d is None:
            d = os.path.expanduser("~/.cache/mpc_jellyfish_tpu_xla")
    d = os.path.join(d, "export")
    os.makedirs(d, exist_ok=True)
    return d


def cached_jit(key: str, fn, *example_args, deps=None):
    """Return a callable computing jax.jit(fn)(*args) for the example shapes.

    On a cache hit the function is restored from the serialized export (no
    tracing/lowering); on a miss it is traced, exported and persisted.
    `fn` must be a pure function of its positional array arguments.
    `deps` names the kernel-source dependency groups (see _DEP_FILES);
    None means "all of ops/" (safe default).
    """
    platform = jax.default_backend()
    full_key = f"{key}-{platform}-{_dep_salt(deps)}-{_code_hash(fn)}"
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
