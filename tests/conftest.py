"""Test env setup: CPU JAX with an 8-device virtual mesh for sharding tests.

NOTE: this container's sitecustomize force-registers a TPU plugin before
pytest starts; run tests as
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python -m pytest tests/ -x -q
(the env vars here are a best-effort fallback for clean environments).
"""
import os
import sys

# hard override (not setdefault): the axon environment exports
# JAX_PLATFORMS=axon and its sitecustomize force-selects the TPU; tests
# are CPU-only by design
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The axon TPU plugin's sitecustomize force-selects its backend regardless
# of JAX_PLATFORMS in the environment; backend init is lazy, so overriding
# the config here (before any array is created) still wins. Without this,
# "CPU" test runs silently execute over the TPU tunnel and serialize
# against every other TPU user (observed round 5: a 20-min hang on the
# first test).
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

# persistent compilation cache: repeat test runs skip XLA recompiles. The
# directory is keyed by environment kind AND host CPU features — serialized
# CPU executables mis-execute across feature drift (maniskill_tpu/_cache.py)
from maniskill_tpu._cache import configure as _configure_cache

_configure_cache(jax)
