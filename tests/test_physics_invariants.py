

def test_velocity_clamp_prevents_gyro_blowup():
    """A free body kicked to an absurd angular velocity must stay finite
    (the explicit gyroscopic term is unstable at |w|*h >> 1 without the
    PhysX-parity max_ang_vel clamp) and settle under the cap."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import maniskill_tpu as mst
    from maniskill_tpu.physics.engine import make_step_fn

    env = mst.make("PickCube-v1", num_envs=1, obs_mode="none",
                   sim_backend="xla")
    env.reset(seed=0)
    sim = jax.tree.map(lambda x: x[0], env._state.sim)
    cmd = jax.tree.map(lambda x: x[0], env._state.cmd)
    # cube far from everything, spinning at 1e8 rad/s
    sim = sim.replace(
        free_pose=sim.free_pose.at[0].set(
            jnp.array([50.0, 0.0, 50.0, 1, 0, 0, 0])),
        free_vel=sim.free_vel.at[0].set(
            jnp.array([0.0, 0, 0, 1e8, 3e7, -2e7])),
    )
    step = make_step_fn(env.model)
    for _ in range(50):
        sim = step(sim, cmd)
    for arr in (sim.qpos, sim.qvel, sim.free_pose, sim.free_vel):
        assert np.isfinite(np.asarray(arr)).all()
    w = np.linalg.norm(np.asarray(sim.free_vel)[0, 3:])
    assert w <= env.model.params.max_ang_vel * 1.01
