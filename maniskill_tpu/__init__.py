"""maniskill_tpu: a TPU-native robot manipulation simulation + MPC framework.

Brand-new JAX/XLA implementation of the capability surface of ManiSkill 3
(reference: Zhouxunzhe/ManiSkill fork), re-architected TPU-first:
the PhysX GPU pipeline becomes a pure-JAX batched dynamics engine, the env
loop becomes one jitted function, and the batch dimension shards across chips
with jax.sharding. See SURVEY.md for the layer-by-layer mapping.
"""

__version__ = "0.1.0"

from .envs.registration import REGISTERED_ENVS, make, register_env


def _register_all():
    """Import agent/task modules so their registration decorators run."""
    from . import agents  # noqa: F401
    from .envs import tasks  # noqa: F401


_register_all()
