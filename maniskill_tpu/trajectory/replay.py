"""Trajectory replay.

Functional port of the reference replay tool
(``mani_skill/trajectory/replay_trajectory.py``): re-runs recorded episodes
in a (possibly different) env configuration, by

  * replaying recorded **actions** and reporting the max state drift vs the
    recorded state trajectory (the reference's fidelity check),
  * replaying recorded **env states** (set state t, step, compare to t+1 —
    a per-step one-step-drift measurement with exact trajectory following),
  * optionally **converting** the recorded actions to a different target
    control mode from the recorded drive targets
    (``target_control_mode``, reference replay_trajectory.py:34,110-253 via
    trajectory/conversion.py).
"""
from __future__ import annotations

import json
from typing import Optional

import numpy as np

from .record import load_trajectories


def _state_error(env, ref_state, t):
    """Max abs error between the env's current state dict and the recorded
    one at step t (actors 13-float + articulation qpos/qvel)."""
    cur = env.get_state_dict()
    err = 0.0
    for name, val in ref_state.get("actors", {}).items():
        a = np.asarray(cur["actors"][name][0])
        b = np.asarray(val)[t]
        err = max(err, float(np.abs(a - b).max()))
    for name, val in ref_state.get("articulations", {}).items():
        a = np.asarray(cur["articulations"][name][0])
        b = np.asarray(val)[t]
        err = max(err, float(np.abs(a - b).max()))
    return err


def replay_trajectory(
    h5_path: str,
    json_path: Optional[str] = None,
    env=None,
    use_env_states: bool = False,
    target_control_mode: Optional[str] = None,
    verbose: bool = False,
):
    """Replay every trajectory; returns per-episode dicts with final
    success, steps, and ``max_state_err`` (action replay: cumulative drift;
    env-state replay: one-step drift)."""
    import maniskill_tpu as mst

    if json_path is None:
        json_path = h5_path.replace(".h5", ".json")
    with open(json_path) as f:
        meta = json.load(f)
    if env is None:
        kwargs = dict(meta["env_info"]["env_kwargs"])
        if target_control_mode is not None:
            kwargs["control_mode"] = target_control_mode
        env = mst.make(meta["env_info"]["env_id"], **kwargs)
    trajs = load_trajectories(h5_path)
    results = []
    for ep_meta, traj in zip(meta["episodes"], trajs):
        seed = ep_meta["reset_kwargs"].get("seed")
        env.reset(seed=seed)
        states = traj["env_states"]
        init = _index_state(states, 0, env.num_envs)
        env.set_state_dict(init)
        actions = traj["actions"]
        T = actions.shape[0]
        if target_control_mode is not None:
            from .conversion import qpos_targets_to_actions

            arts = states["articulations"]
            art = np.asarray(next(iter(arts.values())))
            nq_rob = env.agent.nq
            qpos_traj = art[:-1, 13:13 + nq_rob]
            tq = np.asarray(states["controller"]["target_qpos"])
            actions = qpos_targets_to_actions(
                env, qpos_traj, tq[1:, :nq_rob]
            )
        success = None
        max_err = 0.0
        for t in range(T):
            if use_env_states and t > 0:
                env.set_state_dict(_index_state(states, t, env.num_envs))
            a = np.broadcast_to(
                actions[t], (env.num_envs,) + actions[t].shape
            )
            obs, rew, term, trunc, info = env.step(a)
            max_err = max(max_err, _state_error(env, states, t + 1))
            if "success" in info:
                success = bool(np.asarray(info["success"])[0])
        results.append(dict(
            episode_id=ep_meta["episode_id"], success=success, steps=T,
            max_state_err=max_err,
        ))
        if verbose:
            print(results[-1])
    return results


def _index_state(states, t, num_envs):
    def rec(node):
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        x = np.asarray(node)[t]
        return np.broadcast_to(x, (num_envs,) + x.shape)

    return rec(states)
