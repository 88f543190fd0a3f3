"""Depth camera tests: geometric correctness of the analytic renderer
(reference analogue: obs-mode matrix over visual modes, tests/test_envs.py)."""
import numpy as np
import pytest

import maniskill_tpu as mst


def test_depth_obs_mode():
    env = mst.make("PushCube-v1", num_envs=2, obs_mode="depth")
    obs, _ = env.reset(seed=0)
    d = np.asarray(obs["sensor_data"]["base_camera"]["depth"])
    seg = np.asarray(obs["sensor_data"]["base_camera"]["segmentation"])
    assert d.shape == (2, 128, 128)
    assert np.isfinite(d).mean() > 0.95  # table fills the view
    assert d[np.isfinite(d)].min() > 0.01
    # the cube's geom id must be visible from the default camera
    cube_gid = [i for i, g in enumerate(env.model.geoms) if g.name == "cube"][0]
    assert (seg == cube_gid + 1).any()
    obs2, _, *_ = env.step(np.zeros((2, env.action_dim), np.float32))
    assert np.asarray(obs2["sensor_data"]["base_camera"]["depth"]).shape == (2, 128, 128)


def test_pointcloud_obs_mode():
    env = mst.make("PushCube-v1", num_envs=1, obs_mode="pointcloud")
    obs, _ = env.reset(seed=0)
    pc = np.asarray(obs["pointcloud"]["xyzw"])
    seg = np.asarray(obs["pointcloud"]["segmentation"])
    # one 128x128 point set per camera (PushCube's panda_wristcam agent
    # contributes its hand camera on top of the task base camera)
    n_cams = len(env._sensors)
    assert n_cams == 2
    assert pc.shape == (1, n_cams * 128 * 128, 3)
    finite = np.isfinite(pc).all(-1)
    # points on the tabletop should sit at z ~= 0
    table_gid = [i for i, g in enumerate(env.model.geoms)
                 if g.name == "table-workspace"][0]
    table_pts = pc[(seg == table_gid + 1) & finite]
    assert len(table_pts) > 100
    assert np.abs(table_pts[:, 2]).max() < 1e-3


def test_depth_matches_known_geometry():
    """Camera straight above the cube: center-pixel depth = eye_z - cube_top."""
    from maniskill_tpu.sensors.camera import Camera, CameraConfig
    from maniskill_tpu.math.pose import look_at
    import jax

    env = mst.make("PushCube-v1", num_envs=1, robot_init_qpos_noise=0.0)
    env.reset(seed=0)
    state = jax.tree.map(lambda x: x[0], env._state)
    cube_p = np.asarray(state.sim.free_pose[0, :3])
    eye = cube_p + np.array([0, 0, 0.5])
    pose = look_at(eye=eye, target=cube_p)
    cam = Camera(CameraConfig("top", np.asarray(pose.raw), 64, 64, np.pi / 3),
                 env.model)
    from maniskill_tpu.envs.base_env import TaskContext

    ctx = TaskContext(env, state)
    out = cam.render(state.sim, ctx.body_pos, ctx.body_quat)
    center = np.asarray(out["depth"])[31:33, 31:33].mean()
    expected = 0.5 - 0.02  # eye 0.5 above the cube center; top face is half_size above it
    assert abs(center - expected) < 0.01, (center, expected)


def test_rgb_and_rgbd_obs_modes():
    """Flat-shaded Lambert RGB channel (rgb/rgbd obs modes — the geometry
    channels of the reference's minimal shader pack)."""
    env = mst.make("PushCube-v1", num_envs=2, obs_mode="rgbd",
                   robot_uids="panda")
    obs, _ = env.reset(seed=0)
    d = obs["sensor_data"]["base_camera"]
    rgb = np.asarray(d["rgb"])
    assert rgb.shape == (2, 128, 128, 3) and rgb.dtype == np.uint8
    # full coverage (table/ground fill the frame) and multiple materials
    assert (rgb.sum(-1) > 0).mean() > 0.95
    assert len(np.unique(rgb.reshape(-1, 3), axis=0)) >= 4
    # rgbd also carries depth + seg
    assert "depth" in d and "segmentation" in d
    # wrapper stacks rgb across cameras
    from maniskill_tpu.vector.wrappers import FlattenRGBDObservationWrapper

    w = FlattenRGBDObservationWrapper(
        mst.make("PushCube-v1", num_envs=2, obs_mode="rgbd"))
    obs2, _ = w.reset(seed=0)
    assert obs2["rgb"].shape[-1] == 3 * len(w.env._sensors)
