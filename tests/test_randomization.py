"""Episode-randomization helpers: uniform, random quats, placement sampler."""
import jax
import jax.numpy as jnp
import numpy as np

from maniskill_tpu.envs.randomization import (
    UniformPlacementSampler,
    random_quaternions,
    sample_excluding,
    uniform,
)


def test_uniform_bounds():
    x = uniform(jax.random.key(0), [-1.0, 2.0], [0.0, 5.0], shape=(1000,))
    assert x.shape == (1000, 2)
    assert float(x[:, 0].min()) >= -1.0 and float(x[:, 0].max()) <= 0.0
    assert float(x[:, 1].min()) >= 2.0 and float(x[:, 1].max()) <= 5.0


def test_random_quaternions_normalized_and_locked():
    q = random_quaternions(jax.random.key(1), n=500)
    assert np.allclose(np.linalg.norm(np.asarray(q), axis=-1), 1.0, atol=1e-5)
    qz = random_quaternions(jax.random.key(2), n=100, lock_x=True, lock_y=True)
    # yaw-only: x and y components stay zero
    assert np.allclose(np.asarray(qz)[:, 1:3], 0.0, atol=1e-6)


def test_sample_excluding_respects_radius():
    fixtures = jnp.array([[0.0, 0.0]])
    radii = jnp.array([0.05])
    keys = jax.random.split(jax.random.key(3), 200)
    pts = jax.vmap(
        lambda k: sample_excluding(
            k, ([-0.2, -0.2], [0.2, 0.2]), fixtures, radii, radius=0.05
        )
    )(keys)
    dist = np.linalg.norm(np.asarray(pts), axis=-1)
    assert (dist >= 0.1 - 1e-6).all()


def test_placement_sampler_sequential_no_overlap():
    B = 64
    sampler = UniformPlacementSampler(([-0.1, -0.1], [0.1, 0.1]), batch_size=B)
    key = jax.random.key(4)
    k1, k2, k3 = jax.random.split(key, 3)
    a = sampler.sample(k1, radius=0.03)
    b = sampler.sample(k2, radius=0.03)
    c = sampler.sample(k3, radius=0.03)
    assert a.shape == (B, 2)
    for u, v in ((a, b), (a, c), (b, c)):
        d = np.linalg.norm(np.asarray(u) - np.asarray(v), axis=-1)
        assert (d >= 0.06 - 1e-6).all()


def test_placement_sampler_inside_jit():
    # trace-time use inside a jitted reset-style function
    def setup(key):
        s = UniformPlacementSampler(([-0.1, -0.1], [0.1, 0.1]), batch_size=4)
        k1, k2 = jax.random.split(key)
        return s.sample(k1, 0.02), s.sample(k2, 0.02)

    a, b = jax.jit(setup)(jax.random.key(5))
    d = np.linalg.norm(np.asarray(a) - np.asarray(b), axis=-1)
    assert (d >= 0.04 - 1e-6).all()
