"""DrawTriangle-v1 / DrawSVG-v1 (reference drawing family parity)."""
import jax.numpy as jnp
import numpy as np
import pytest

import maniskill_tpu as mst


@pytest.mark.parametrize("eid,R", [("DrawTriangle-v1", 153),
                                   ("DrawSVG-v1", None)])
def test_outline_initialized_and_randomized(eid, R):
    env = mst.make(eid, num_envs=2)
    env.reset(seed=0)
    outline = np.asarray(env._state.extras["outline"])
    if R is not None:
        assert outline.shape[1] == R
    # outline sits in the reachable tabletop region
    assert (np.abs(outline) < 0.5).all()
    # per-env randomization: the two envs get different placements
    assert not np.allclose(outline[0], outline[1])
    # same seed reproduces
    env.reset(seed=0)
    np.testing.assert_allclose(
        np.asarray(env._state.extras["outline"]), outline, atol=1e-6
    )


def test_success_logic():
    env = mst.make("DrawTriangle-v1", num_envs=1)
    env.reset(seed=0)
    rng = np.random.RandomState(0)
    obs, rew, term, trunc, info = env.step(env.sample_action(rng) * 0.0)
    assert not bool(np.asarray(info["success"])[0])
    # fabricate a completed drawing: all reference points covered, all
    # drawn dots valid
    ex = dict(env._state.extras)
    ex["ref_hit"] = jnp.ones_like(env._state.extras["ref_hit"])
    ex["dots_ok"] = jnp.ones_like(env._state.extras["dots_ok"])
    ex["drew_any"] = jnp.ones_like(env._state.extras["drew_any"])
    env._state = env._state.replace(extras=ex)
    obs, rew, term, trunc, info = env.step(env.sample_action(rng) * 0.0)
    # the step's own update keeps coverage complete when nothing new is
    # drawn (zero action keeps the stick up)
    assert float(np.asarray(info["outline_coverage"])[0]) == 1.0
