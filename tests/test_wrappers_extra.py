"""Obs wrappers (flatten / frame-stack), profiler, and the BC baseline
pipeline (record demos -> train -> act)."""
import os
import subprocess
import sys

import numpy as np
import pytest

import maniskill_tpu as mst
from maniskill_tpu.utils.profiling import Profiler, device_memory_stats
from maniskill_tpu.vector.wrappers import (
    FlattenObservationWrapper,
    FlattenRGBDObservationWrapper,
    FrameStack,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_flatten_observation_wrapper():
    env = FlattenObservationWrapper(
        mst.make("PushCube-v1", num_envs=2, obs_mode="state_dict")
    )
    obs, _ = env.reset(seed=0)
    assert not isinstance(obs, dict)
    obs2, *_ = env.step(np.zeros((2, env.action_dim), np.float32))
    assert np.asarray(obs2).shape == np.asarray(obs).shape
    assert np.asarray(obs).ndim == 2 and np.asarray(obs).shape[0] == 2


def test_flatten_rgbd_wrapper():
    env = FlattenRGBDObservationWrapper(
        mst.make("PushCube-v1", num_envs=2, obs_mode="depth")
    )
    obs, _ = env.reset(seed=0)
    assert set(obs) == {"state", "depth", "segmentation"}
    # (B, H, W, ncams)
    assert np.asarray(obs["depth"]).ndim == 4
    assert np.asarray(obs["state"]).shape[0] == 2


def test_frame_stack():
    k = 3
    env = FrameStack(mst.make("PushCube-v1", num_envs=2), num_stack=k)
    obs, _ = env.reset(seed=0)
    assert obs.shape[:2] == (2, k)
    assert np.allclose(obs[:, 0], obs[:, -1])  # reset fills with copies
    first = obs[:, -1].copy()
    obs, *_ = env.step(np.zeros((2, env.action_dim), np.float32))
    assert np.allclose(obs[:, 1], first)  # shifted by one


def test_profiler(tmp_path):
    env = mst.make("PushCube-v1", num_envs=4)
    obs, _ = env.reset(seed=0)
    prof = Profiler(output_format="silent")
    with prof.profile("steps", total_steps=3, num_envs=4):
        for _ in range(3):
            obs, *_ = env.step(np.zeros((4, env.action_dim), np.float32))
        Profiler.synchronize(obs)
    s = prof.stats["steps"]
    assert s["steps_per_s"] > 0
    assert s["parallel_steps_per_s"] == pytest.approx(4 * s["steps_per_s"])
    csv_path = tmp_path / "out.csv"
    prof.update_csv(str(csv_path))
    assert csv_path.read_text().count("\n") == 2  # header + row
    assert isinstance(device_memory_stats(), dict)


@pytest.mark.slow
def test_bc_pipeline(tmp_path):
    # record a handful of scripted PushCube demos, then train BC on them
    env = subprocess.run(
        [
            sys.executable, "-m", "maniskill_tpu.examples.motionplanning.run",
            "-e", "PushCube-v1", "-n", "4", "--traj-dir", str(tmp_path),
        ],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert env.returncode == 0, env.stderr[-2000:]
    h5 = tmp_path / "trajectory.h5"
    assert h5.exists()
    out = subprocess.run(
        [
            sys.executable, "examples/baselines/bc/bc_jax.py",
            "--env-id", "PushCube-v1", "--dataset", str(h5),
            "--control-mode", "pd_ee_delta_pos",
            "--epochs", "3", "--eval-envs", "4", "--eval-steps", "5",
        ],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "eval success_once" in out.stdout


def test_tdmpc2_smoke(tmp_path):
    """TD-MPC2-style baseline trains (losses finite and decreasing) —
    reference examples/baselines/tdmpc2 capability."""
    import subprocess, sys, os
    root = os.path.join(os.path.dirname(__file__), "..")
    out = subprocess.run(
        [sys.executable,
         os.path.join(root, "examples/baselines/tdmpc2/tdmpc2_jax.py"),
         "--env-id", "PushCube-v1", "--num-envs", "4",
         "--total-steps", "400", "--batch-size", "32"],
        capture_output=True, text=True, timeout=1200,
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": root},
    )
    assert "done" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]
    import re
    losses = [float(m) for m in re.findall(r"loss (\d+\.\d+)", out.stdout)]
    assert losses and all(np.isfinite(losses))


def test_diffusion_policy_pipeline(tmp_path):
    """Diffusion-policy baseline: record demos -> train DDPM over action
    chunks -> evaluate (reference examples/baselines/diffusion_policy
    capability; same completion bar as the BC pipeline test)."""
    env = subprocess.run(
        [
            sys.executable, "-m", "maniskill_tpu.examples.motionplanning.run",
            "-e", "PushCube-v1", "-n", "4", "--traj-dir", str(tmp_path),
        ],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert env.returncode == 0, env.stderr[-2000:]
    out = subprocess.run(
        [
            sys.executable, "examples/baselines/diffusion_policy/dp_jax.py",
            "--env-id", "PushCube-v1",
            "--dataset", str(tmp_path / "trajectory.h5"),
            "--epochs", "10", "--eval-envs", "4", "--eval-steps", "8",
        ],
        cwd=REPO, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "eval success_once" in out.stdout


def test_nature_cnn_encoder():
    """Visual encoder over FlattenRGBD output (reference NatureCNN torso)."""
    import jax
    import maniskill_tpu as mst
    from maniskill_tpu.vector import NatureCNN
    from maniskill_tpu.vector.wrappers import FlattenRGBDObservationWrapper

    env = FlattenRGBDObservationWrapper(
        mst.make("PushCube-v1", num_envs=2, obs_mode="rgbd",
                 robot_uids="panda"))
    obs, _ = env.reset(seed=0)
    enc = NatureCNN(feature_dim=64)
    params = enc.init(jax.random.key(0), obs)
    feat = enc.apply(params, obs)
    assert feat.shape[0] == 2 and feat.shape[1] >= 64
    assert np.isfinite(np.asarray(feat)).all()


def test_teleop_scripted(tmp_path):
    """Scripted teleop drives the env and records a trajectory (reference
    examples/teleoperation capability, non-interactive mode)."""
    out = subprocess.run(
        [sys.executable, "-m", "maniskill_tpu.examples.teleop",
         "-e", "PushCube-v1", "--script", "wwaae",
         "--record-dir", str(tmp_path)],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-1500:]
    assert (tmp_path / "trajectory.h5").exists()


def test_asset_verify():
    out = subprocess.run(
        [sys.executable, "-m", "maniskill_tpu.utils.download_asset",
         "--verify"],
        cwd=REPO, capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stdout + out.stderr


def test_rlpd_pipeline(tmp_path):
    """RLPD: symmetric online/demo sampling SAC runs end-to-end (reference
    examples/baselines/rlpd capability; demos now carry rewards)."""
    env = subprocess.run(
        [sys.executable, "-m", "maniskill_tpu.examples.motionplanning.run",
         "-e", "PushCube-v1", "-n", "3", "--traj-dir", str(tmp_path)],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert env.returncode == 0, env.stderr[-1500:]
    out = subprocess.run(
        [sys.executable, "examples/baselines/rlpd/rlpd_jax.py",
         "--env-id", "PushCube-v1",
         "--demo-dataset", str(tmp_path / "trajectory.h5"),
         "--num-envs", "4", "--total-timesteps", "256",
         "--batch-size", "32", "--updates-per-iter", "2"],
        cwd=REPO, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-1500:]
    assert "done" in out.stdout


def test_act_pipeline(tmp_path):
    """ACT baseline: CVAE action chunking + temporal ensembling (reference
    examples/baselines/act capability)."""
    env = subprocess.run(
        [sys.executable, "-m", "maniskill_tpu.examples.motionplanning.run",
         "-e", "PushCube-v1", "-n", "4", "--traj-dir", str(tmp_path)],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert env.returncode == 0, env.stderr[-1500:]
    out = subprocess.run(
        [sys.executable, "examples/baselines/act/act_jax.py",
         "--env-id", "PushCube-v1",
         "--dataset", str(tmp_path / "trajectory.h5"),
         "--epochs", "20", "--eval-envs", "4", "--eval-steps", "10"],
        cwd=REPO, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-1500:]
    assert "eval success_once" in out.stdout
