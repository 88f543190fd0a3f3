from .base import (
    ControllerConfig,
    ControllerState,
    JointController,
    PDEEPosControllerConfig,
    PDEEPoseControllerConfig,
    PDJointPosControllerConfig,
    PDJointPosVelControllerConfig,
    PDJointVelControllerConfig,
    clip_and_scale_action,
)
from .composite import CompositeController
from .ee import EEController

__all__ = [
    "ControllerConfig", "ControllerState", "JointController",
    "PDEEPosControllerConfig", "PDEEPoseControllerConfig",
    "PDJointPosControllerConfig", "PDJointPosVelControllerConfig",
    "PDJointVelControllerConfig",
    "clip_and_scale_action", "CompositeController", "EEController",
]
