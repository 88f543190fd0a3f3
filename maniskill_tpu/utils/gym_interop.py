"""gymnasium interoperability.

The reference registers every task with gymnasium (``mani_skill/utils/
registration.py:192``: dual entry_point + vector_entry_point). Here the
batched env is wrapped into the standard gymnasium.Env / gymnasium
vector-style API on demand:

  import maniskill_tpu  # registers tasks
  import gymnasium as gym
  env = gym.make("maniskill_tpu/PushCube-v1")           # single-env API
  venv = gym.make("maniskill_tpu/PushCube-v1", num_envs=64)  # batched
"""
from __future__ import annotations

from typing import Optional

import numpy as np

try:
    import gymnasium as gym
    from gymnasium import spaces

    _HAS_GYM = True
except Exception:  # pragma: no cover
    _HAS_GYM = False


if _HAS_GYM:

    class GymEnvAdapter(gym.Env):
        """gymnasium.Env facade over a maniskill_tpu batched env. With
        num_envs=1 behaves like a classic single env (numpy, scalar reward);
        with num_envs>1 observations/rewards keep the batch dimension."""

        metadata = {"render_modes": []}

        def __init__(self, env_id: str, num_envs: int = 1, **kwargs):
            import maniskill_tpu as mst

            self._env = mst.make(env_id, num_envs=num_envs, **kwargs)
            self.num_envs = num_envs
            lo, hi = self._env.single_action_space
            self.single_action_space = spaces.Box(
                low=np.asarray(lo), high=np.asarray(hi), dtype=np.float32
            )
            self.action_space = self.single_action_space
            obs, _ = self._env.reset(seed=0)
            obs = np.asarray(obs)
            single = obs[0] if num_envs >= 1 else obs
            self.single_observation_space = spaces.Box(
                low=-np.inf, high=np.inf, shape=single.shape, dtype=np.float32
            )
            self.observation_space = self.single_observation_space

        @property
        def unwrapped_batched(self):
            """The underlying maniskill_tpu env (full batched API)."""
            return self._env

        def reset(self, *, seed: Optional[int] = None, options=None):
            obs, info = self._env.reset(seed=seed, options=options)
            return self._squeeze(np.asarray(obs)), self._np_info(info)

        def step(self, action):
            action = np.asarray(action, dtype=np.float32)
            if self.num_envs == 1 and action.ndim == 1:
                action = action[None]
            obs, rew, term, trunc, info = self._env.step(action)
            return (
                self._squeeze(np.asarray(obs)),
                self._squeeze(np.asarray(rew)),
                self._squeeze(np.asarray(term)),
                self._squeeze(np.asarray(trunc)),
                self._np_info(info),
            )

        def _squeeze(self, x):
            if self.num_envs == 1 and np.ndim(x) > 0:
                return x[0]
            return x

        def _np_info(self, info):
            return {
                k: self._squeeze(np.asarray(v))
                for k, v in info.items()
                if not isinstance(v, dict)
            }

    def register_gym_envs():
        """Register every maniskill_tpu task with gymnasium under the
        ``maniskill_tpu/`` namespace."""
        import maniskill_tpu as mst

        for uid, spec in mst.REGISTERED_ENVS.items():
            gym_id = f"maniskill_tpu/{uid}"
            if gym_id in gym.registry:
                continue
            gym.register(
                id=gym_id,
                entry_point="maniskill_tpu.utils.gym_interop:GymEnvAdapter",
                max_episode_steps=None,  # the env tracks its own truncation
                kwargs=dict(env_id=uid),
            )

else:  # pragma: no cover

    def register_gym_envs():
        raise ImportError("gymnasium is not available")
