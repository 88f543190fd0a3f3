"""Environment registry (reference ``mani_skill/utils/registration.py``):
``@register_env(uid, max_episode_steps=...)`` + ``make(uid, num_envs=...)``.
Truncation is computed by the env from max_episode_steps (the reference does
it in a TimeLimitWrapper, registration.py:127-168 — same semantics)."""
from __future__ import annotations

from typing import Dict, Optional, Type

REGISTERED_ENVS: Dict[str, dict] = {}


def register_env(uid: str, max_episode_steps: Optional[int] = None, **default_kwargs):
    def deco(cls):
        if uid in REGISTERED_ENVS:
            raise ValueError(f"env id {uid} already registered")
        REGISTERED_ENVS[uid] = dict(
            cls=cls, max_episode_steps=max_episode_steps, kwargs=default_kwargs
        )
        cls.env_id = uid
        return cls

    return deco


def make(uid: str, num_envs: int = 1, **kwargs):
    if uid not in REGISTERED_ENVS:
        raise KeyError(
            f"unknown env id {uid!r}; registered: {sorted(REGISTERED_ENVS)}"
        )
    spec = REGISTERED_ENVS[uid]
    kw = dict(spec["kwargs"])
    kw.update(kwargs)
    env = spec["cls"](num_envs=num_envs, **kw)
    env.max_episode_steps = spec["max_episode_steps"]
    return env
