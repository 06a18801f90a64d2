"""cbl_tpu — a TPU-native exact dynamic k-mer set (CBL method).

A from-scratch JAX/XLA/Pallas re-design of the Conway–Bromage–Lyndon k-mer
set (reference: imartayan/CBL, Bioinformatics btae217).  The compute path —
2-bit encoding, sliding-window k-mer extraction, necklace canonicalisation,
and sorted-set maintenance — runs as batched XLA programs on TPU; multi-chip
scaling shards the necklace prefix space over a `jax.sharding.Mesh`.
"""

import os as _os

import jax as _jax

# The axon TPU plugin overrides the JAX_PLATFORMS env var; the only reliable
# platform override is jax.config.  CBL_TPU_PLATFORM=cpu forces local CPU.
if _os.environ.get("CBL_TPU_PLATFORM"):
    _jax.config.update("jax_platforms", _os.environ["CBL_TPU_PLATFORM"])

# XLA compiles a fresh (slow-to-compile) program per array shape; capacities
# are power-of-two tiers so the set of shapes is small and stable — persist
# them across processes.  Opt out with CBL_TPU_NO_CACHE=1.
if not _os.environ.get("CBL_TPU_NO_CACHE"):
    _cache_dir = _os.environ.get(
        "CBL_TPU_COMPILE_CACHE", _os.path.expanduser("~/.cache/cbl_tpu_xla")
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - older jax
        pass

from .config import CBLConfig, get_config
from .cbl import CBL, PackedStream

__all__ = ["CBL", "CBLConfig", "PackedStream", "get_config"]
__version__ = "0.1.0"
