"""Persistent-XLA-cache location with environment + host fingerprinting.

Serialized XLA:CPU executables bake in the COMPILE host's target features
(+avx512*, +prefer-no-scatter, ...). Loading them on a host with different
features emits ``cpu_aot_loader.cc`` feature-mismatch errors and can
MIS-EXECUTE (observed: wrong contact impulses producing a phantom bounce).
Two independent sources of feature drift exist here:

1. the axon TPU-plugin site environment compiles CPU code with different
   target features than a bare environment on the SAME machine, and
2. the build hosts themselves change between sessions (round-3 artifacts
   mis-loaded on the round-4 container).

So the cache directory is keyed by BOTH: the environment kind
(``.jax_cache`` vs ``.jax_cache_bare``) and a hash of the host CPU's
feature flags (/proc/cpuinfo). A new host gets a fresh cache rather than
silently loading feature-mismatched AOT artifacts.
"""
from __future__ import annotations

import hashlib
import os
import sys


def host_fingerprint() -> str:
    """Short hash of the host CPU feature flags (ISA-level identity)."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "nohost"


def cache_dir(repo_root: str | None = None) -> str:
    if repo_root is None:
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    override = os.environ.get("MANISKILL_TPU_CACHE_DIR")
    if override:
        return override
    axon = any(".axon_site" in p for p in sys.path) or (
        ".axon_site" in os.environ.get("PYTHONPATH", "")
    )
    # key by EXECUTION backend, not just environment: under the axon site
    # with JAX_PLATFORMS=cpu (or conftest's forced-cpu override), programs
    # compile and run on the local CPU — sharing the axon cache then mixes
    # remote-compile-host CPU artifacts into local runs (observed round 5:
    # SIGSEGV inside XLA:CPU during a test run in the axon env)
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        axon = False
    base = ".jax_cache" if axon else ".jax_cache_bare"
    return os.path.join(repo_root, base, host_fingerprint())


def configure(jax_module) -> None:
    """Point JAX's persistent compilation cache at :func:`cache_dir`."""
    try:
        jax_module.config.update("jax_compilation_cache_dir", cache_dir())
        jax_module.config.update(
            "jax_persistent_cache_min_entry_size_bytes", -1
        )
        jax_module.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.5
        )
    except Exception:  # pragma: no cover - older jax
        pass
