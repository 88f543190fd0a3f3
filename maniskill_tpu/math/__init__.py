from .pose import Pose, look_at
from .rotations import (
    angle_between,
    matrix_to_quat,
    quat_apply,
    quat_conjugate,
    quat_exp,
    quat_from_axis_angle,
    quat_from_euler,
    quat_identity,
    quat_inv,
    quat_log,
    quat_mul,
    quat_normalize,
    quat_rotate_inv,
    quat_to_matrix,
    random_quaternion,
    skew,
)

__all__ = [
    "Pose", "look_at", "angle_between", "matrix_to_quat", "quat_apply",
    "quat_conjugate", "quat_exp", "quat_from_axis_angle", "quat_from_euler",
    "quat_identity", "quat_inv", "quat_log", "quat_mul", "quat_normalize",
    "quat_rotate_inv", "quat_to_matrix", "random_quaternion", "skew",
]
