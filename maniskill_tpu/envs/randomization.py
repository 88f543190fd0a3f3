"""Episode-randomization helpers: uniform samplers and collision-aware
placement.

TPU-native analogue of the reference ``mani_skill/envs/utils/randomization/``
(``common.py:uniform``, ``pose.py:random_quaternions``,
``samplers.py:UniformPlacementSampler``): pure ``jax.random`` functions
keyed per env, usable inside jitted/vmapped ``_initialize_episode`` — the
reference's torch.rand + stateful sampler become explicit key-threading.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..math.rotations import random_quaternion


def uniform(key, low, high, shape: Sequence[int] = ()) -> jnp.ndarray:
    """Uniform samples in [low, high); low/high may be arrays broadcast
    against ``shape`` (reference ``randomization/common.py:uniform``)."""
    low = jnp.asarray(low, jnp.float32)
    high = jnp.asarray(high, jnp.float32)
    u = jax.random.uniform(key, tuple(shape) + jnp.broadcast_shapes(
        low.shape, high.shape))
    return low + u * (high - low)


def random_quaternions(key, n: Optional[int] = None, lock_x: bool = False,
                       lock_y: bool = False, lock_z: bool = False):
    """Batch of uniform random quaternions (wxyz), optionally restricted to
    yaw-only etc. (reference ``randomization/pose.py:13``)."""
    shape = () if n is None else (n,)
    return random_quaternion(key, shape, lock_x=lock_x, lock_y=lock_y,
                             lock_z=lock_z)


def sample_excluding(
    key,
    bounds: Tuple[Sequence[float], Sequence[float]],
    fixture_pos: jnp.ndarray,
    fixture_radii: jnp.ndarray,
    radius: float,
    max_trials: int = 100,
) -> jnp.ndarray:
    """Sample one position uniformly inside ``bounds`` at least
    ``radius + fixture_radii[i]`` away from every fixture. Jit/vmap-safe
    rejection sampling over a fixed ``max_trials`` budget (keeps the first
    accepted draw; falls back to the last draw if none pass — same
    best-effort semantics as the reference sampler's trial loop,
    ``samplers.py:38-78``).

    fixture_pos: (F, d), fixture_radii: (F,). Returns (d,).
    """
    lo = jnp.asarray(bounds[0], jnp.float32)
    hi = jnp.asarray(bounds[1], jnp.float32)
    draws = lo + jax.random.uniform(key, (max_trials, lo.shape[0])) * (hi - lo)

    def clearance(p):
        d2 = jnp.sum((fixture_pos - p) ** 2, axis=-1)
        return jnp.all(d2 >= (fixture_radii + radius) ** 2)

    ok = jax.vmap(clearance)(draws)  # (max_trials,)
    # index of first ok draw, else last draw
    first = jnp.argmax(ok)
    idx = jnp.where(jnp.any(ok), first, max_trials - 1)
    return draws[idx]


class UniformPlacementSampler:
    """Sequentially place objects without overlap, batched over envs
    (reference ``samplers.py:UniformPlacementSampler``). Functional: each
    ``sample`` consumes a key and returns positions; accepted samples are
    appended as fixtures for subsequent calls.

    Intended for host-side / trace-time episode setup::

        sampler = UniformPlacementSampler(([-0.1, -0.1], [0.1, 0.1]), batch_size=B)
        pos_a = sampler.sample(key_a, radius=0.03, max_trials=100)
        pos_b = sampler.sample(key_b, radius=0.03, max_trials=100)  # avoids a
    """

    def __init__(self, bounds: Tuple[Sequence[float], Sequence[float]],
                 batch_size: int):
        assert len(bounds) == 2 and len(bounds[0]) == len(bounds[1])
        self.bounds = (list(map(float, bounds[0])), list(map(float, bounds[1])))
        self.batch_size = batch_size
        self.fixture_positions: list = []  # each (B, d)
        self.fixture_radii: list = []  # floats

    def sample(self, key, radius: float, max_trials: int = 100,
               append: bool = True) -> jnp.ndarray:
        """Returns (batch_size, d) positions clear of prior fixtures."""
        d = len(self.bounds[0])
        if self.fixture_positions:
            fpos = jnp.stack(self.fixture_positions, axis=1)  # (B, F, d)
            frad = jnp.asarray(self.fixture_radii, jnp.float32)
        else:
            fpos = jnp.zeros((self.batch_size, 0, d))
            frad = jnp.zeros((0,))
        keys = jax.random.split(key, self.batch_size)
        pos = jax.vmap(
            lambda k, fp: sample_excluding(
                k, self.bounds, fp, frad, radius, max_trials)
        )(keys, fpos)
        if append:
            self.fixture_positions.append(pos)
            self.fixture_radii.append(float(radius))
        return pos
