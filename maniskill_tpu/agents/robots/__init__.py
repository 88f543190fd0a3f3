from .panda import Panda, PandaWristCam  # noqa: F401
from .cartpole import CartPoleRobot  # noqa: F401
from .fetch import Fetch  # noqa: F401
from .trifinger import TriFingerPro  # noqa: F401
from .panda_stick import PandaStick  # noqa: F401
from .xarm import XArm7, XArm7Ability, AllegroHandRight, DClaw  # noqa: F401
from .floating_gripper import FloatingPandaGripper  # noqa: F401
from .unitree import UnitreeG1  # noqa: F401
from .quadruped import AnymalC, UnitreeGo2, UnitreeH1  # noqa: F401
from .realman import Realman  # noqa: F401
from .widowx import WidowX250S, WidowX250SBridge  # noqa: F401
from .arms_extra import UR10e, XArm6NoGripper, XArm6Robotiq, Xmate3Robotiq, GoogleRobot, FloatingRobotiq2F85Gripper  # noqa: F401
from .stompy import Stompy  # noqa: F401
