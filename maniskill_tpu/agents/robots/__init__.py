from .panda import Panda, PandaWristCam  # noqa: F401
