from .wrappers import CPUGymWrapper, FlattenActionSpaceWrapper, ManiSkillVectorEnv
