"""MobileRMPick-v1: mobile Realman picks a per-env object to a 3D goal.

Parity port of the fork's flagship mobile-manipulation task
(``mani_skill/envs/tasks/tabletop/mobile_rm_pick.py``): the 41-dof mobile
dual-arm Realman stands at the table and must lift a randomly sampled
object (the fork samples YCB; here the per-env hull library) to a random
3D goal. Success: object within goal_thresh of the goal AND the right arm
static (mobile_rm_pick.py:194-205).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..registration import register_env
from .pick_single_hull import PickSingleHullEnv


@register_env("MobileRMPick-v1", max_episode_steps=100)
class MobileRMPickEnv(PickSingleHullEnv):
    SUPPORTED_ROBOTS = ["mobile_realman"]
    DEFAULT_ROBOT = "mobile_realman"

    def compute_dense_reward(self, state, action, info, ctx):
        # PickCube's staged reward with the robot-agnostic static term
        # (the panda version slices qvel[:-2])
        cube_p = ctx.actor_pose("cube").p
        goal_p = ctx.actor_pose("goal_site").p
        tcp_to_obj = jnp.linalg.norm(cube_p - ctx.tcp_pose.p)
        reward = 1.0 - jnp.tanh(5.0 * tcp_to_obj)
        is_grasped = info["is_grasped"].astype(jnp.float32)
        reward = reward + is_grasped
        place = 1.0 - jnp.tanh(5.0 * jnp.linalg.norm(goal_p - cube_p))
        reward = reward + place * is_grasped
        static = self.agent.is_static(state.sim.qvel, 0.2).astype(
            jnp.float32
        )
        reward = reward + static * info["is_obj_placed"].astype(jnp.float32)
        return jnp.where(info["success"], 5.0, reward)


from .articulated import OpenCabinetDoorEnv, OpenCabinetDrawerEnv  # noqa: E402


@register_env("OpenCabinetDrawerRealman-v1", max_episode_steps=100)
class OpenCabinetDrawerRealmanEnv(OpenCabinetDrawerEnv):
    """Fork parity: ``open_cabinet_drawer_realman.py`` — the mobile
    Realman opens the drawer instead of Fetch."""

    SUPPORTED_ROBOTS = ["mobile_realman"]
    DEFAULT_ROBOT = "mobile_realman"

    def _load_agent(self, builder):
        import numpy as np

        # face the cabinet (+x): Realman forward is -y at identity
        pose = np.array(
            [-0.95, 0, 0.0, np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)],
            np.float32,
        )
        self.agent.install(builder, pose)


@register_env("OpenCabinetDoorRealman-v1", max_episode_steps=100)
class OpenCabinetDoorRealmanEnv(OpenCabinetDoorEnv):
    """Fork parity: ``open_cabinet_drawer_realman.py:375``."""

    SUPPORTED_ROBOTS = ["mobile_realman"]
    DEFAULT_ROBOT = "mobile_realman"

    def _load_agent(self, builder):
        import numpy as np

        pose = np.array(
            [-0.95, 0, 0.0, np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)],
            np.float32,
        )
        self.agent.install(builder, pose)
