from .base_agent import REGISTERED_AGENTS, BaseAgent, Keyframe, register_agent
from . import robots  # noqa: F401  (populates the agent registry)
