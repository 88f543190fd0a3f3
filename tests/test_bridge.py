"""Digital-twin (BridgeData eval) family + WidowX agent + template tests."""
import numpy as np
import pytest

import maniskill_tpu as mst

BRIDGE_ENVS = [
    "PutCarrotOnPlateInScene-v1",
    "PutSpoonOnTableClothInScene-v1",
    "StackGreenCubeOnYellowCubeBakedTexInScene-v1",
    "PutEggplantInBasketScene-v1",
]


@pytest.mark.parametrize("env_id", BRIDGE_ENVS)
def test_bridge_env_runs(env_id):
    env = mst.make(env_id, num_envs=2, obs_mode="state")
    obs, _ = env.reset(seed=0)
    assert np.all(np.isfinite(np.asarray(obs)))
    for _ in range(3):
        obs, rew, term, trunc, info = env.step(
            np.zeros((2, env.action_dim), np.float32)
        )
    assert np.all(np.isfinite(np.asarray(obs)))
    assert np.all(np.isfinite(np.asarray(rew)))
    assert "success" in info and "is_src_obj_grasped" in info
    lang = env.get_language_instruction()
    assert len(lang) == 2 and isinstance(lang[0], str)


def test_bridge_greenscreen_compositing():
    """Background pixels must be replaced by the overlay image; robot and
    object pixels must survive."""
    from maniskill_tpu.envs.tasks.bridge import _procedural_overlay

    env = mst.make("PutCarrotOnPlateInScene-v1", num_envs=1, obs_mode="rgb")
    obs, _ = env.reset(seed=0)
    rgb = np.asarray(obs["sensor_data"]["3rd_view_camera"]["rgb"])[0]
    ov = _procedural_overlay()
    frac_overlay = (rgb == ov).all(-1).mean()
    # the robot + two tabletop objects occupy part of the frame; the rest
    # is greenscreened to the overlay
    assert 0.5 < frac_overlay < 0.999, frac_overlay


def test_bridge_success_when_placed():
    """Teleporting the carrot onto the plate must register success."""
    import jax.numpy as jnp

    env = mst.make("PutCarrotOnPlateInScene-v1", num_envs=1, obs_mode="none")
    env.reset(seed=0)
    st = env._state
    ci = env.model.free_index["carrot"]
    pi = env.model.free_index["plate"]
    plate_p = np.asarray(st.sim.free_pose[0, pi, :3])
    carrot_z = float(env._hulls["carrot"].aabb_half[2])
    plate_top = plate_p[2] + float(env._hulls["plate"].aabb_half[2])
    new_pose = jnp.asarray(
        np.concatenate([
            plate_p[:2], [plate_top + carrot_z - 0.002], [1, 0, 0, 0]
        ], dtype=np.float32)
    )
    sim = st.sim.replace(
        free_pose=st.sim.free_pose.at[0, ci].set(new_pose),
        free_vel=st.sim.free_vel.at[0, ci].set(jnp.zeros(6)),
    )
    env._state = st.replace(sim=sim)
    # let contact form, then check evaluate
    for _ in range(3):
        _, _, _, _, info = env.step(
            np.zeros((1, env.action_dim), np.float32)
        )
    assert bool(np.asarray(info["success"])[0]), info


def test_widowx_agent_registered():
    from maniskill_tpu.agents.base_agent import REGISTERED_AGENTS

    for uid in ("widowx250s", "widowx250s_bridgedataset_flat_table"):
        assert uid in REGISTERED_AGENTS
    ag = REGISTERED_AGENTS["widowx250s"]()
    assert ag.nq == 8
    assert ag.ee_link_name == "ee_gripper_link"


def test_template_task_runs():
    from maniskill_tpu.envs.registration import REGISTERED_ENVS, register_env
    from maniskill_tpu.envs.template import MyTaskEnv

    if "TemplateTask-v1" not in REGISTERED_ENVS:
        register_env("TemplateTask-v1", max_episode_steps=50)(MyTaskEnv)
    env = mst.make("TemplateTask-v1", num_envs=2)
    obs, _ = env.reset(seed=0)
    obs, rew, term, trunc, info = env.step(
        np.zeros((2, env.action_dim), np.float32)
    )
    assert np.all(np.isfinite(np.asarray(obs)))
    assert "success" in info
