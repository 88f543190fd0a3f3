"""Sweep the renderer chunk cap per visual-benchmark config (round 5).

For each (config, MS_RENDER_CHUNK) pair, runs bench_visual.bench_one in a
SUBPROCESS (the cap is read at trace time; a crashed remote compile must
not kill the sweep) and prints one JSON line per result.

Usage: python tools/render_sweep.py
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SWEEP = [
    # (env_id, obs_mode, cams, w, h, num_envs, chunk_cap)
    ("FrankaPickCubeBenchmark-v1", "rgb", 1, 640, 480, 512, 10**9),
    ("CartpoleBalanceBenchmark-v1", "depth", 1, 640, 480, 512, 10**9),
    ("CartpoleBalanceBenchmark-v1", "rgb", 1, 640, 480, 512, 10**9),
    ("CartpoleBalanceBenchmark-v1", "depth", 1, 640, 480, 512, 76800),
]

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
import jax
from tools.bench_visual import bench_one
env_id, obs_mode, cams, w, h, num_envs = {cfg!r}
fps = bench_one(env_id, obs_mode, cams, w, h, num_envs, 60)
print("RESULT " + json.dumps(dict(fps=round(fps, 1))))
"""


def main():
    results = []
    for env_id, obs_mode, cams, w, h, n, cap in SWEEP:
        env = dict(os.environ)
        env["MS_RENDER_CHUNK"] = str(cap)
        env["PYTHONPATH"] = REPO
        code = CHILD.format(repo=REPO, cfg=(env_id, obs_mode, cams, w, h, n))
        try:
            p = subprocess.run([sys.executable, "-u", "-c", code], env=env,
                               capture_output=True, text=True, timeout=1500)
            line = [l for l in p.stdout.splitlines()
                    if l.startswith("RESULT ")]
            row = dict(env_id=env_id, obs_mode=obs_mode, w=w, h=h,
                       num_envs=n, chunk_cap=cap)
            if line:
                row.update(json.loads(line[-1][7:]))
            else:
                row["error"] = (p.stderr or p.stdout)[-250:]
        except subprocess.TimeoutExpired:
            row = dict(env_id=env_id, obs_mode=obs_mode, w=w, h=h,
                       num_envs=n, chunk_cap=cap, error="timeout")
        results.append(row)
        print(json.dumps(row), flush=True)
    with open(os.path.join(REPO, "RENDER_SWEEP.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
