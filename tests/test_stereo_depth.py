"""StereoDepthCamera: active-stereo depth model correctness
(reference sensors/depth_camera.py:19,38 — SAPIEN StereoDepthSensor
wrapper; here an analytic disparity-quantization + occlusion model)."""
import jax
import numpy as np

import maniskill_tpu as mst
from maniskill_tpu.envs.base_env import TaskContext
from maniskill_tpu.math.pose import look_at
from maniskill_tpu.sensors.camera import Camera, CameraConfig
from maniskill_tpu.sensors.depth_camera import (StereoDepthCamera,
                                                StereoDepthCameraConfig)


def _scene_ctx():
    env = mst.make("PushCube-v1", num_envs=1, robot_init_qpos_noise=0.0)
    env.reset(seed=0)
    state = jax.tree.map(lambda x: x[0], env._state)
    return env, state, TaskContext(env, state)


def test_stereo_depth_quantization_and_holes():
    env, state, ctx = _scene_ctx()
    cube_p = np.asarray(state.sim.free_pose[0, :3])
    # low side view: the cube occludes the table behind it
    eye = cube_p + np.array([0.35, 0.0, 0.08])
    pose = look_at(eye=eye, target=cube_p)
    cfg = StereoDepthCameraConfig(
        "stereo", np.asarray(pose.raw), 96, 96, np.pi / 3)
    cam = StereoDepthCamera(cfg, env.model)
    ideal = Camera(CameraConfig("ideal", np.asarray(pose.raw), 96, 96,
                                np.pi / 3), env.model)
    out = cam.render(state.sim, ctx.body_pos, ctx.body_quat)
    ref = ideal.render(state.sim, ctx.body_pos, ctx.body_quat)
    z = np.asarray(out["depth"])
    z_ref = np.asarray(ref["depth"])
    valid = z > 0

    # depth present and close to ideal where valid
    assert valid.mean() > 0.3
    err = np.abs(z[valid] - z_ref[valid])
    assert np.median(err) < 0.01  # quantization-scale error at ~0.4 m

    # quantization: valid depths correspond to near-integer subpixel
    # disparity steps of f*B
    f = 0.5 * cfg.height / np.tan(cfg.fov / 2)
    disp_steps = f * cfg.baseline / z[valid] * cfg.subpixel_bits
    assert np.abs(disp_steps - np.round(disp_steps)).max() < 1e-2

    # stereo shadow: some pixels visible to the ideal camera are holes
    holes = (~valid) & np.isfinite(z_ref)
    assert holes.any()


def test_stereo_min_depth_gating():
    env, state, ctx = _scene_ctx()
    cube_p = np.asarray(state.sim.free_pose[0, :3])
    eye = cube_p + np.array([0.06, 0.0, 0.04])  # closer than min_depth=0.1
    pose = look_at(eye=eye, target=cube_p)
    cfg = StereoDepthCameraConfig(
        "stereo", np.asarray(pose.raw), 32, 32, np.pi / 3, min_depth=0.1)
    cam = StereoDepthCamera(cfg, env.model)
    out = cam.render(state.sim, ctx.body_pos, ctx.body_quat)
    z = np.asarray(out["depth"])
    # the cube face closer than min_depth must be gated to invalid
    center = z[12:20, 12:20]
    assert (center == 0.0).all()


def test_stereo_camera_in_env_obs():
    """An env can request a stereo sensor through _default_sensor_configs
    (the reference wires StereoDepthCameraConfig the same way)."""

    class StereoPushCube(mst.REGISTERED_ENVS["PushCube-v1"]["cls"]):
        def _default_sensor_configs(self):
            pose = look_at(eye=[0.3, 0, 0.6], target=[-0.1, 0, 0.1])
            return [StereoDepthCameraConfig(
                "stereo_camera", np.asarray(pose.raw), 64, 64, np.pi / 2)]

    env = StereoPushCube(num_envs=2, obs_mode="depth")
    obs, _ = env.reset(seed=0)
    d = np.asarray(obs["sensor_data"]["stereo_camera"]["depth"])
    assert d.shape == (2, 64, 64)
    assert (d > 0).mean() > 0.3  # mostly valid
    assert (d == 0).any()  # with stereo holes
