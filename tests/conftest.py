"""Test env setup: CPU JAX with an 8-device virtual mesh for sharding tests.

NOTE: this container's sitecustomize force-registers a TPU plugin before
pytest starts; run tests as
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python -m pytest tests/ -x -q
(the env vars here are a best-effort fallback for clean environments).
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# persistent compilation cache: repeat test runs skip XLA recompiles.
# The axon-site environment compiles with different CPU target features
# (+prefer-no-scatter etc.); its cache entries mis-execute when loaded in a
# bare environment (observed: wrong physics from a feature-mismatched AOT
# artifact) — keep the two environments' caches separate.
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_axon = any(".axon_site" in p for p in sys.path) or (
    ".axon_site" in os.environ.get("PYTHONPATH", "")
)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(_repo, ".jax_cache" if _axon else ".jax_cache_bare"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
