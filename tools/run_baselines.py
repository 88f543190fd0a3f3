"""Produce BASELINES_RESULTS.json — measured training evidence (VERDICT r4 #8).

Runs the cheap-but-real configurations of each baseline family and records
the final eval success rate (or reward where a family has no success eval),
seeds, and step counts. Families too expensive for this harness are listed
with measured=false rather than claimed.

Usage:
    python tools/run_baselines.py demos          # generate demo datasets
    python tools/run_baselines.py bc act dp      # imitation families (CPU ok)
    python tools/run_baselines.py ppo sac        # RL families (TPU)
"""
import json
import os
import re
import subprocess
import sys
import time

REPO = "/root/repo"
OUT = os.path.join(REPO, "BASELINES_RESULTS.json")
DEMO_DIR = "/tmp/ms_demos"


def _load():
    try:
        with open(OUT) as f:
            return json.load(f)
    except Exception:
        return {}


def _save(results):
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


def run(cmd, env=None, timeout=2400):
    print("+", " ".join(cmd), flush=True)
    e = dict(os.environ)
    e.setdefault("PYTHONPATH", REPO)
    if env:
        e.update(env)
    p = subprocess.run(cmd, cwd=REPO, env=e, capture_output=True, text=True,
                       timeout=timeout)
    sys.stdout.write(p.stdout[-2000:])
    if p.returncode != 0:
        sys.stderr.write(p.stderr[-2000:])
    return p


def gen_demos(env_id, n=24):
    d = os.path.join(DEMO_DIR, env_id)
    os.makedirs(d, exist_ok=True)
    p = run([sys.executable, "-m", "maniskill_tpu.examples.motionplanning.run",
             "-e", env_id, "-n", str(n), "--traj-dir", d])
    return d if p.returncode == 0 else None


def parse_success(stdout):
    m = re.findall(r"success_once: ([0-9.]+)%?", stdout)
    if not m:
        return None
    v = float(m[-1])
    return v / 100.0 if v > 1.0 else v


def main():
    todo = sys.argv[1:] or ["demos", "bc", "act", "dp"]
    results = _load()
    env_id = "PushCube-v1"
    demo_h5 = os.path.join(DEMO_DIR, env_id, "trajectory.h5")

    if "demos" in todo:
        gen_demos(env_id)

    py = sys.executable
    cpu = {"JAX_PLATFORMS": "cpu"}

    if "bc" in todo:
        t0 = time.time()
        p = run([py, "examples/baselines/bc/bc_jax.py", "--env-id", env_id,
                 "--dataset", demo_h5, "--epochs", "60",
                 "--control-mode", "pd_ee_delta_pos", "--eval-envs", "16"],
                env=cpu)
        results["bc"] = dict(
            env_id=env_id, demos=24, epochs=60, seed=0,
            success_once=parse_success(p.stdout),
            wall_s=round(time.time() - t0, 1), platform="cpu")
        _save(results)

    if "act" in todo:
        t0 = time.time()
        p = run([py, "examples/baselines/act/act_jax.py", "--env-id", env_id,
                 "--dataset", demo_h5, "--epochs", "60",
                 "--control-mode", "pd_ee_delta_pos"], env=cpu)
        results["act"] = dict(
            env_id=env_id, demos=24, epochs=60, seed=0,
            success_once=parse_success(p.stdout),
            wall_s=round(time.time() - t0, 1), platform="cpu")
        _save(results)

    if "dp" in todo:
        t0 = time.time()
        p = run([py, "examples/baselines/diffusion_policy/dp_jax.py",
                 "--env-id", env_id, "--dataset", demo_h5, "--epochs", "60",
                 "--control-mode", "pd_ee_delta_pos"], env=cpu)
        results["diffusion_policy"] = dict(
            env_id=env_id, demos=24, epochs=60, seed=0,
            success_once=parse_success(p.stdout),
            wall_s=round(time.time() - t0, 1), platform="cpu")
        _save(results)

    if "ppo" in todo:
        t0 = time.time()
        out = "/tmp/ppo_pushcube.json"
        p = run([py, "examples/baselines/ppo/ppo_jax.py", "--env-id", env_id,
                 "--num-envs", "512", "--total-timesteps", "2000000",
                 "--out-json", out], timeout=3000)
        row = dict(env_id=env_id, total_timesteps=2_000_000, num_envs=512,
                   seed=1, wall_s=round(time.time() - t0, 1))
        try:
            with open(out) as f:
                j = json.load(f)
            row["final_success_rate"] = j.get("final_success_rate")
            row["env_steps_per_s"] = j.get("env_steps_per_s") or j.get("sps")
            row["platform"] = j.get("platform", "tpu")
        except Exception:
            row["error"] = (p.stderr or p.stdout)[-300:]
        results["ppo"] = row
        _save(results)

    # families exercised by CI smoke tests but not success-measured here:
    # honesty rows so README/docs never claim unmeasured numbers.
    for fam in ("ppo_rgb", "sac", "sac_rgbd", "tdmpc2", "dp_language",
                "rfcl", "rlpd", "sb3"):
        results.setdefault(fam, dict(
            measured=False,
            note="pipeline smoke-tested in CI (tests/test_wrappers_extra.py);"
                 " no success-rate artifact committed"))
    _save(results)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
