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


class FlattenObservationWrapper:
    """Flattens dict observations into one (B, D) vector per step with a
    deterministic key order (reference ``utils/wrappers/flatten.py:80`` /
    ``common.flatten_state_dict``). No-op for already-flat obs."""

    def __init__(self, env):
        self.env = env

    def __getattr__(self, name):
        return getattr(self.env, name)

    @staticmethod
    def _flatten(obs):
        if not isinstance(obs, dict):
            return obs
        from ..envs.base_env import flatten_state_dict

        return flatten_state_dict(obs)

    def reset(self, seed=None, options=None):
        obs, info = self.env.reset(seed=seed, options=options)
        return self._flatten(obs), info

    def step(self, action):
        obs, rew, term, trunc, info = self.env.step(action)
        return self._flatten(obs), rew, term, trunc, info


class FlattenRGBDObservationWrapper:
    """Splits a visual dict obs into ``{state, rgb?, depth, segmentation}``
    with the per-camera images stacked along the channel axis (reference
    ``FlattenRGBDObservationWrapper``, utils/wrappers/flatten.py:14).
    Requires ``obs_mode`` in ("rgbd", "depth", "sensor_data")."""

    def __init__(self, env, include_state: bool = True):
        self.env = env
        self.include_state = include_state

    def __getattr__(self, name):
        return getattr(self.env, name)

    def _convert(self, obs):
        from ..envs.base_env import flatten_state_dict

        if not isinstance(obs, dict) or "sensor_data" not in obs:
            raise ValueError(
                "FlattenRGBDObservationWrapper needs a dict obs with "
                "'sensor_data' — construct the env with obs_mode='depth' "
                "or 'sensor_data'"
            )
        obs = dict(obs)
        sensor = obs.pop("sensor_data")
        out = {}
        if self.include_state:
            out["state"] = flatten_state_dict(obs)
        first = next(iter(sensor.values()))
        if "rgb" in first:
            out["rgb"] = jnp.concatenate(
                [d["rgb"] for d in sensor.values()], axis=-1)
        if "depth" in first:
            out["depth"] = jnp.stack(
                [d["depth"] for d in sensor.values()], axis=-1)
        if "segmentation" in first:
            out["segmentation"] = jnp.stack(
                [d["segmentation"] for d in sensor.values()], axis=-1)
        return out

    def reset(self, seed=None, options=None):
        obs, info = self.env.reset(seed=seed, options=options)
        return self._convert(obs), info

    def step(self, action):
        obs, rew, term, trunc, info = self.env.step(action)
        return self._convert(obs), rew, term, trunc, info


class FrameStack:
    """Stacks the last ``num_stack`` observations along a new axis-1:
    flat obs (B, D) → (B, num_stack, D) (reference
    ``utils/wrappers/frame_stack.py:11``). Host-side ring buffer — frame
    stacking is an obs-space transform, not part of the jitted step."""

    def __init__(self, env, num_stack: int):
        from collections import deque

        self.env = env
        self.num_stack = num_stack
        self._frames = deque(maxlen=num_stack)

    def __getattr__(self, name):
        return getattr(self.env, name)

    def _stacked(self):
        if isinstance(self._frames[0], dict):
            raise ValueError(
                "FrameStack needs flat array obs — wrap the env in "
                "FlattenObservationWrapper first (or use obs_mode='state')"
            )
        return np.stack([np.asarray(f) for f in self._frames], axis=1)

    def reset(self, seed=None, options=None):
        obs, info = self.env.reset(seed=seed, options=options)
        for _ in range(self.num_stack):
            self._frames.append(obs)
        return self._stacked(), info

    def step(self, action):
        obs, rew, term, trunc, info = self.env.step(action)
        self._frames.append(obs)
        return self._stacked(), rew, term, trunc, info
