from .record import RecordEpisode, load_trajectories
from .replay import replay_trajectory
from .dataset import ManiSkillTrajectoryDataset
