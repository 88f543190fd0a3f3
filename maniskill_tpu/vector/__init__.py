from .wrappers import CPUGymWrapper, FlattenActionSpaceWrapper, ManiSkillVectorEnv
from .sb3 import make_sb3_vec_env  # noqa: F401
from .encoders import NatureCNN  # noqa: F401
