"""seal_embedded_tpu: a TPU-native CKKS encode/encrypt framework.

Re-implements the full capability surface of microsoft/SEAL-Embedded
(IoT-side CKKS encoder/encryptor) as an idiomatic JAX/XLA/Pallas framework:
batched, sharded, and kernel-fused for TPU.
"""

import jax as _jax

# The framework requires x64: plaintexts are int64 (ckks_common.c:187-209)
# and encode runs in f64.  Integer ops are exact on TPU; f64 is emulated
# (see ops/encode.py docstring).
_jax.config.update("jax_enable_x64", True)

# Persistent compile cache (opt out with SEAL_TPU_NO_CACHE=1): pipeline
# graphs are large; caching spans processes.
import os as _os

if not _os.environ.get("SEAL_TPU_NO_CACHE"):
    _cache = _os.environ.get(
        "SEAL_TPU_CACHE_DIR",
        _os.path.expanduser("~/.cache/seal_embedded_tpu/jax"))
    _os.makedirs(_cache, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

__version__ = "0.1.0"
