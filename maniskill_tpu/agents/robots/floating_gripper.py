"""Floating Panda gripper.

Parity port of the reference ``agents/robots/floating_panda_gripper``:
the Panda hand + fingers on a position-controlled 6-dof floating root
(3 prismatic + 3 revolute synthetic joints through zero-mass frames —
the same chain expansion the MJCF loader uses for free joints). Useful
for grasp-centric tasks and demo generation without arm kinematics.

The hand body reuses panda_link7's fused inertial properties and the
Panda agent's hand/finger collision primitives; the ``panda_hand_tcp``
frame rides along, so grasp checkers and EE-based rewards work
unchanged.
"""
from __future__ import annotations

from dataclasses import replace as dc_replace

import numpy as np

from ...kinematics.urdf import (
    JOINT_PRISMATIC,
    JOINT_REVOLUTE,
    RobotSpec,
)
from ..base_agent import BaseAgent, Keyframe, register_agent
from ..controllers.base import PDJointPosControllerConfig
from .panda import Panda

_AXES = [
    (JOINT_PRISMATIC, (1.0, 0, 0)), (JOINT_PRISMATIC, (0, 1.0, 0)),
    (JOINT_PRISMATIC, (0, 0, 1.0)), (JOINT_REVOLUTE, (0, 0, 1.0)),
    (JOINT_REVOLUTE, (0, 1.0, 0)), (JOINT_REVOLUTE, (1.0, 0, 0)),
]
ROOT_JOINTS = ["root_x", "root_y", "root_z", "root_rz", "root_ry", "root_rx"]


def _build_spec() -> RobotSpec:
    donor = Panda(control_mode=None)
    ds = donor.robot_spec
    i7 = ds.link_index["panda_link7"]
    fingers = [ds.link_index["panda_leftfinger"],
               ds.link_index["panda_rightfinger"]]

    nb = 6 + 2
    parent = np.array([-1, 0, 1, 2, 3, 4, 5, 5], np.int32)
    joint_type = np.array(
        [t for (t, _) in _AXES]
        + [int(ds.joint_type[f]) for f in fingers], np.int32)
    axis = np.stack([np.asarray(a, np.float64) for (_, a) in _AXES]
                    + [ds.axis[f] for f in fingers])
    joint_pos = np.zeros((nb, 3))
    joint_quat = np.tile(np.array([1.0, 0, 0, 0]), (nb, 1))
    for k, f in enumerate(fingers):
        joint_pos[6 + k] = ds.joint_pos[f]
        joint_quat[6 + k] = ds.joint_quat[f]
    mass = np.full(nb, 1e-6)
    com = np.zeros((nb, 3))
    inertia = np.tile(np.eye(3) * 1e-8, (nb, 1, 1))
    # the 6th chain body IS the hand: donor link7 fused inertials
    mass[5] = ds.mass[i7]
    com[5] = ds.com[i7]
    inertia[5] = ds.inertia[i7]
    for k, f in enumerate(fingers):
        mass[6 + k] = ds.mass[f]
        com[6 + k] = ds.com[f]
        inertia[6 + k] = ds.inertia[f]
    qlim = np.array(
        [(-2.0, 2.0)] * 3 + [(-3.2, 3.2)] * 3
        + [tuple(ds.qlim[f]) for f in fingers])
    frames = {}
    for name, (bi, fp, fq) in ds.frames.items():
        if bi == i7:
            frames[name] = (5, fp, fq)
    link_index = {"hand_root": 5,
                  "panda_leftfinger": 6, "panda_rightfinger": 7}
    return RobotSpec(
        name="floating_panda_gripper",
        nb=nb,
        parent=parent,
        joint_type=joint_type,
        joint_pos=joint_pos,
        joint_quat=joint_quat,
        axis=axis,
        mass=mass,
        com=com,
        inertia=inertia,
        qlim=qlim,
        effort=np.full(nb, 200.0),
        vel_limit=np.full(nb, 2.0),
        joint_damping=np.array([5.0] * 6 + [
            float(ds.joint_damping[f]) for f in fingers]),
        joint_friction=np.zeros(nb),
        frames=frames,
        link_index=link_index,
        joint_names=ROOT_JOINTS + [ds.joint_names[f] for f in fingers],
        link_names=["root_x_f", "root_y_f", "root_z_f", "root_rz_f",
                    "root_ry_f", "hand_root", "panda_leftfinger",
                    "panda_rightfinger"],
        base_link="world",
    )


@register_agent
class FloatingPandaGripper(BaseAgent):
    uid = "floating_panda_gripper"
    ee_link_name = "panda_hand_tcp"

    root_stiffness = 1e3
    root_damping = 2e2
    root_force_limit = 200.0
    gripper_stiffness = 1e3
    gripper_damping = 1e2
    gripper_force_limit = 100.0

    keyframes = dict(
        rest=Keyframe(qpos=np.array(
            [0.0, 0.0, 0.3, 0.0, np.pi, 0.0, 0.04, 0.04], np.float32))
    )

    def _make_robot_spec(self):
        return _build_spec()

    def collision_geoms(self):
        donor = Panda(control_mode=None)
        out = []
        for g in donor.collision_geoms():
            if g["link"] == "panda_link7":
                g = dict(g)
                g["link"] = "hand_root"
                out.append(g)
            elif g["link"] in ("panda_hand", "panda_leftfinger",
                               "panda_rightfinger"):
                # frames copied from link7 resolve these names on the hand
                out.append(dict(g))
        return out

    def _controller_configs(self):
        root = PDJointPosControllerConfig(
            joint_names=ROOT_JOINTS,
            lower=-0.1, upper=0.1, use_delta=True,
            stiffness=self.root_stiffness, damping=self.root_damping,
            force_limit=self.root_force_limit,
        )
        gripper = PDJointPosControllerConfig(
            joint_names=["panda_finger_joint1", "panda_finger_joint2"],
            lower=-0.01, upper=0.04,
            stiffness=self.gripper_stiffness,
            damping=self.gripper_damping,
            force_limit=self.gripper_force_limit,
            mimic=True,
        )
        return dict(
            pd_joint_delta_pos=dict(root=root, gripper=gripper),
        )
