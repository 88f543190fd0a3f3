"""Vector-env facade with auto-reset and episode metrics.

Parity port of the reference ``ManiSkillVectorEnv``
(``mani_skill/vector/wrappers/gymnasium.py:16``): wraps ONE batched env,
auto-resets done sub-envs via partial reset, supports ``ignore_terminations``
(infinite-horizon mode), and tracks per-episode metrics (return, episode
length, success_once/at_end, fail_once/at_end — :114-140). ``final_obs`` /
``final_info`` carry the pre-reset values like gymnasium's convention.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


class ManiSkillVectorEnv:
    def __init__(
        self,
        env,
        auto_reset: bool = True,
        ignore_terminations: bool = False,
        record_metrics: bool = True,
    ):
        self.env = env
        self.num_envs = env.num_envs
        self.auto_reset = auto_reset
        self.ignore_terminations = ignore_terminations
        self.record_metrics = record_metrics
        self._zero_metrics()

    def _zero_metrics(self):
        n = self.num_envs
        self._returns = np.zeros(n, np.float32)
        self._lengths = np.zeros(n, np.int64)
        self._success_once = np.zeros(n, bool)
        self._fail_once = np.zeros(n, bool)

    @property
    def action_dim(self):
        return self.env.action_dim

    @property
    def single_action_space(self):
        return self.env.single_action_space

    def reset(self, seed: Optional[int] = None, options: Optional[dict] = None):
        obs, info = self.env.reset(seed=seed, options=options)
        if options is None or "env_idx" not in options:
            self._zero_metrics()
        return obs, info

    def step(self, action):
        obs, reward, terminated, truncated, info = self.env.step(action)
        terminated = np.asarray(terminated)
        truncated = np.asarray(truncated)
        info = dict(info)

        if self.record_metrics:
            self._returns += np.asarray(reward)
            self._lengths += 1
            if "success" in info:
                self._success_once |= np.asarray(info["success"])
                info["success_at_end"] = np.asarray(info["success"])
            if "fail" in info:
                self._fail_once |= np.asarray(info["fail"])
                info["fail_at_end"] = np.asarray(info["fail"])
            info["episode"] = dict(
                r=self._returns.copy(),
                l=self._lengths.copy(),
                success_once=self._success_once.copy(),
                fail_once=self._fail_once.copy(),
            )

        if self.ignore_terminations:
            terminated = np.zeros_like(terminated)

        dones = terminated | truncated
        if dones.any() and self.auto_reset:
            info["final_observation"] = obs
            info["final_info"] = {
                k: v for k, v in info.items() if k not in ("final_observation",)
            }
            env_idx = np.nonzero(dones)[0]
            obs, _ = self.env.reset(options=dict(env_idx=env_idx))
            if self.record_metrics:
                self._returns[env_idx] = 0
                self._lengths[env_idx] = 0
                self._success_once[env_idx] = False
                self._fail_once[env_idx] = False
        return obs, reward, terminated, truncated, info

    def close(self):
        pass


class CPUGymWrapper:
    """Unbatches a 1-env batched env to the plain single-env gym API with
    numpy outputs (reference ``utils/wrappers/gymnasium.py:10``)."""

    def __init__(self, env):
        assert env.num_envs == 1, "CPUGymWrapper requires num_envs=1"
        self.env = env

    @property
    def action_dim(self):
        return self.env.action_dim

    def reset(self, seed=None, options=None):
        obs, info = self.env.reset(seed=seed, options=options)
        return self._un(obs), self._un(info)

    def step(self, action):
        action = np.asarray(action)[None]
        obs, rew, term, trunc, info = self.env.step(action)
        return (
            self._un(obs),
            float(np.asarray(rew)[0]),
            bool(np.asarray(term)[0]),
            bool(np.asarray(trunc)[0]),
            self._un(info),
        )

    @staticmethod
    def _un(x):
        if isinstance(x, dict):
            return {k: CPUGymWrapper._un(v) for k, v in x.items()}
        a = np.asarray(x)
        return a[0] if a.ndim > 0 and a.shape[0] == 1 else a


class FlattenActionSpaceWrapper:
    """Identity passthrough for API compatibility — this framework's
    composite controllers already expose one flat Box action space
    (reference analogue: utils/wrappers/flatten.py:99)."""

    def __init__(self, env):
        self.env = env

    def __getattr__(self, name):
        return getattr(self.env, name)
