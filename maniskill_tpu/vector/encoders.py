"""Visual feature encoders for image observations.

Parity port of the reference's visual-encoder utilities
(``mani_skill/vector/...`` / the NatureCNN used across its RL baselines,
e.g. examples/baselines/ppo/ppo_rgb.py): a flax NatureCNN over stacked
rgb/depth/segmentation channels plus an optional state branch — the
module RL baselines drop in front of their MLP heads for visual obs.

Usage::

    enc = NatureCNN(feature_dim=256)
    params = enc.init(key, {"rgb": rgb, "state": state})
    feat = enc.apply(params, {"rgb": rgb, "state": state})  # (B, 256+...)
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn


class NatureCNN(nn.Module):
    """DQN-style CNN (the reference baselines' default visual torso).

    Consumes a dict obs with any of: ``rgb`` (B,H,W,3·k uint8/float),
    ``depth`` (B,H,W,k float meters), ``segmentation`` (B,H,W,k int) —
    channel-concatenated — and an optional flat ``state`` branch appended
    to the output features.
    """

    feature_dim: int = 256
    state_hidden: int = 256

    @nn.compact
    def __call__(self, obs):
        imgs = []
        if "rgb" in obs:
            imgs.append(jnp.asarray(obs["rgb"], jnp.float32) / 255.0)
        if "depth" in obs:
            d = jnp.asarray(obs["depth"], jnp.float32)
            if d.ndim == 3:
                d = d[..., None]
            imgs.append(jnp.clip(d, 0.0, 5.0) / 5.0)
        if "segmentation" in obs:
            s = jnp.asarray(obs["segmentation"], jnp.float32)
            if s.ndim == 3:
                s = s[..., None]
            imgs.append(s / (1.0 + s.max()))
        assert imgs, "NatureCNN needs rgb/depth/segmentation in the obs dict"
        x = jnp.concatenate(imgs, axis=-1)
        x = nn.relu(nn.Conv(32, (8, 8), strides=(4, 4), padding="VALID")(x))
        x = nn.relu(nn.Conv(64, (4, 4), strides=(2, 2), padding="VALID")(x))
        x = nn.relu(nn.Conv(64, (3, 3), strides=(1, 1), padding="VALID")(x))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(self.feature_dim)(x))
        if "state" in obs:
            s = nn.relu(nn.Dense(self.state_hidden)(
                jnp.asarray(obs["state"], jnp.float32)))
            x = jnp.concatenate([x, s], axis=-1)
        return x
