"""maniskill_tpu: a TPU-native robot manipulation simulation + MPC framework.

Brand-new JAX/XLA implementation of the capability surface of ManiSkill 3
(reference: Zhouxunzhe/ManiSkill fork), re-architected TPU-first:
the PhysX GPU pipeline becomes a pure-JAX batched dynamics engine, the env
loop becomes one jitted function, and the batch dimension shards across chips
with jax.sharding. See SURVEY.md for the layer-by-layer mapping.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent XLA compilation cache: this framework's step functions are large
# sequential graphs whose (remote) TPU compiles take minutes — cache them
# across processes. Opt out with MANISKILL_TPU_NO_CACHE=1.
if not _os.environ.get("MANISKILL_TPU_NO_CACHE"):
    import sys as _sys

    # the axon-site environment compiles CPU executables with different
    # target features (+prefer-no-scatter …) than a bare environment; its
    # cached AOT artifacts MIS-EXECUTE when loaded bare (observed: wrong
    # contact impulses). Keep per-environment caches.
    _axon = any(".axon_site" in p for p in _sys.path) or (
        ".axon_site" in _os.environ.get("PYTHONPATH", "")
    )
    _cache_dir = _os.environ.get(
        "MANISKILL_TPU_CACHE_DIR",
        _os.path.join(
            _os.path.dirname(_os.path.abspath(__file__)), "..",
            ".jax_cache" if _axon else ".jax_cache_bare",
        ),
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - older jax
        pass

from .envs.registration import REGISTERED_ENVS, make, register_env


def register_gym_envs():
    """Expose every task to gymnasium (maniskill_tpu/<id>)."""
    from .utils.gym_interop import register_gym_envs as _r

    _r()


def _register_all():
    """Import agent/task modules so their registration decorators run."""
    from . import agents  # noqa: F401
    from .envs import tasks  # noqa: F401


_register_all()
