"""Shader-pack system (reference render/shaders.py:11,67 analogue)."""
import jax
import numpy as np
import pytest

import maniskill_tpu as mst
from maniskill_tpu.envs.base_env import TaskContext
from maniskill_tpu.math.pose import look_at
from maniskill_tpu.sensors.camera import Camera, CameraConfig
from maniskill_tpu.sensors.shaders import (PREBUILT_SHADER_CONFIGS,
                                           get_shader_config)


def _scene():
    env = mst.make("PushCube-v1", num_envs=1, robot_init_qpos_noise=0.0)
    env.reset(seed=0)
    state = jax.tree.map(lambda x: x[0], env._state)
    return env, state, TaskContext(env, state)


def _cam(env, pack, hw=48):
    cube_p = np.array([0.0, 0.0, 0.02])
    pose = look_at(eye=cube_p + [0.25, 0.1, 0.25], target=cube_p)
    return Camera(CameraConfig("c", np.asarray(pose.raw), hw, hw,
                               np.pi / 3, shader_pack=pack), env.model)


def test_prebuilt_pack_names():
    # the reference registry names (render/shaders.py:67)
    for name in ("minimal", "default", "rt", "rt-med", "rt-fast"):
        assert name in PREBUILT_SHADER_CONFIGS
    with pytest.raises(KeyError):
        get_shader_config("nope")


def test_minimal_pack_texture_set():
    env, state, ctx = _scene()
    out = _cam(env, "minimal").render(state.sim, ctx.body_pos, ctx.body_quat)
    assert set(out) == {"depth", "segmentation", "position"}


def test_default_pack_full_set():
    env, state, ctx = _scene()
    out = _cam(env, "default").render(state.sim, ctx.body_pos, ctx.body_quat)
    assert {"rgb", "depth", "segmentation", "position", "normal"} <= set(out)


def test_rt_pack_casts_shadows():
    """The cube must darken some table pixels under the rt pack relative
    to the shadowless default pack (same palette, different shading)."""
    env, state, ctx = _scene()
    out_d = _cam(env, "default").render(state.sim, ctx.body_pos,
                                        ctx.body_quat)
    out_rt = _cam(env, "rt").render(state.sim, ctx.body_pos, ctx.body_quat)
    seg = np.asarray(out_d["segmentation"])
    table_gid = [i for i, g in enumerate(env.model.geoms)
                 if g.name == "table-workspace"][0]
    table = seg == table_gid + 1
    lum_d = np.asarray(out_d["rgb"]).astype(np.float32).mean(-1)
    lum_rt = np.asarray(out_rt["rgb"]).astype(np.float32).mean(-1)
    assert table.sum() > 50
    # rt shading differs on the table (shadows and/or multi-light)
    assert np.abs(lum_rt[table] - lum_d[table]).max() > 5.0
    # and produces a DARK region (shadow) among table pixels
    rel = lum_rt[table] / np.maximum(lum_d[table], 1.0)
    assert rel.min() < 0.75
