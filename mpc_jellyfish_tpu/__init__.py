"""mpc-jellyfish-tpu: a TPU-native PLONK proving stack (JAX/XLA/Pallas).

Brand-new implementation of the renegade-fi/mpc-jellyfish capabilities
(TurboPlonk/UltraPlonk + KZG + collaborative prover) designed TPU-first:
limb-tensor field kernels, constant-geometry NTT, Pippenger MSM, sharded
multi-chip paths via jax.sharding.  See SURVEY.md for the layer map.
"""

import os as _os

import jax as _jax

# Persistent XLA compilation cache: the limb-arithmetic graphs are large and
# recompile across processes otherwise.  Harmless if the dir is unwritable.
# The dir is fingerprinted by the host CPU flags: XLA's CPU cache key does
# NOT include machine features, so artifacts from a different container
# generation load with "prefer-no-gather not supported" warnings and can
# SIGILL mid-suite.
def _host_fingerprint() -> str:
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(
                        " ".join(sorted(line.split()[2:])).encode()
                    ).hexdigest()[:12]
    except OSError:
        pass
    return "generic"


def _will_use_tpu() -> bool:
    """True when this process will run on the real chip (axon tunnel
    present and JAX_PLATFORMS not forcing cpu).  Decided from env because
    the backend must not be initialized at import time."""
    plats = _os.environ.get("JAX_PLATFORMS", "")
    forced_cpu = bool(plats) and all(
        p.strip() == "cpu" for p in plats.split(",") if p.strip())
    return bool(_os.environ.get("PALLAS_AXON_POOL_IPS")) and not forced_cpu


try:
    _cache_dir = _os.environ.get("MPC_JELLYFISH_TPU_CACHE")
    if _cache_dir is not None:
        _cache_dir = _os.path.join(_cache_dir, _host_fingerprint())
    elif _will_use_tpu():
        # repo-local, committed: survives the $HOME wipe between builder and
        # driver runs (round-3 driver paid 252.9s preprocess + 499.4s warmup
        # of cold TPU compiles).  XLA:TPU executables are keyed by program +
        # compile options + runtime version — host-CPU independent — so no
        # host fingerprint subdir.
        _cache_dir = _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            ".tpu_cache", "xla")
    else:
        _cache_dir = _os.path.join(
            _os.path.expanduser("~/.cache/mpc_jellyfish_tpu_xla"),
            _host_fingerprint())
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:  # pragma: no cover - cache is best-effort
    pass
