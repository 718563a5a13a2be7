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
try:
    _cache_dir = _os.environ.get(
        "MPC_JELLYFISH_TPU_CACHE", _os.path.expanduser("~/.cache/mpc_jellyfish_tpu_xla"))
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:  # pragma: no cover - cache is best-effort
    pass
