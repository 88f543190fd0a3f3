"""Stable-Baselines3 VecEnv adapter.

Parity port of the reference SB3 wrapper
(``mani_skill/vector/wrappers/sb3.py``): exposes a batched maniskill_tpu
env as an SB3 ``VecEnv`` so SB3's PPO/SAC train against the TPU simulator
unchanged. SB3 is an optional dependency — the class imports it lazily and
raises a clear error when absent (this image ships torch but not sb3).

Notes:
  * SB3's VecEnv contract auto-resets on termination; the underlying
    ``ManiSkillVectorEnv`` already implements masked auto-reset, so this
    adapter only converts arrays (device -> numpy) and repackages infos.
  * ``terminal_observation`` is populated per SB3 convention.
"""
from __future__ import annotations

from typing import Any, List, Optional

import numpy as np


def _require_sb3():
    try:
        from stable_baselines3.common.vec_env.base_vec_env import VecEnv
        return VecEnv
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "stable_baselines3 is required for the SB3 adapter: "
            "pip install stable_baselines3"
        ) from e


def make_sb3_vec_env(env):
    """Wrap a ``ManiSkillVectorEnv`` (or bare batched env) as an SB3 VecEnv."""
    VecEnv = _require_sb3()
    import gymnasium as gym

    class ManiSkillSB3VecEnv(VecEnv):  # pragma: no cover - needs sb3
        def __init__(self, ms_env):
            self._env = ms_env
            base = getattr(ms_env, "_env", ms_env)
            low, high = base.single_action_space
            act_space = gym.spaces.Box(
                low=np.asarray(low, np.float32),
                high=np.asarray(high, np.float32),
            )
            obs, _ = ms_env.reset(seed=0)
            obs0 = np.asarray(obs)[0]
            obs_space = gym.spaces.Box(
                low=-np.inf, high=np.inf, shape=obs0.shape, dtype=np.float32
            )
            super().__init__(base.num_envs, obs_space, act_space)
            self._last_obs = np.asarray(obs)
            self._actions = None

        def reset(self):
            obs, _ = self._env.reset()
            self._last_obs = np.asarray(obs)
            return self._last_obs

        def step_async(self, actions):
            self._actions = actions

        def step_wait(self):
            obs, rew, term, trunc, info = self._env.step(self._actions)
            obs = np.asarray(obs)
            term = np.asarray(term)
            trunc = np.asarray(trunc)
            dones = term | trunc
            infos: List[dict] = []
            for i in range(self.num_envs):
                d: dict = {"TimeLimit.truncated": bool(trunc[i])
                           and not bool(term[i])}
                if dones[i]:
                    # SB3 convention: the pre-reset obs rides in info
                    final = info.get("final_observation")
                    d["terminal_observation"] = (
                        np.asarray(final)[i] if final is not None else obs[i]
                    )
                infos.append(d)
            self._last_obs = obs
            return obs, np.asarray(rew, np.float32), dones, infos

        def close(self):
            pass

        # SB3 abstract-surface stubs (single-process, shared-memory env)
        def get_attr(self, attr_name, indices=None):
            return [getattr(self._env, attr_name)] * self.num_envs

        def set_attr(self, attr_name, value, indices=None):
            setattr(self._env, attr_name, value)

        def env_method(self, method_name, *args, indices=None, **kwargs):
            return [getattr(self._env, method_name)(*args, **kwargs)]

        def env_is_wrapped(self, wrapper_class, indices=None):
            return [False] * self.num_envs

    return ManiSkillSB3VecEnv(env)
