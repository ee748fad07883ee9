from .episode import EpisodeConfig, EpisodeOutput, run_episode, make_episode_fn
from .batch import run_episode_batch, run_episode_batch_fused, tracking_rmse_masked

__all__ = [
    "EpisodeConfig",
    "EpisodeOutput",
    "run_episode",
    "make_episode_fn",
    "run_episode_batch",
    "run_episode_batch_fused",
    "tracking_rmse_masked",
]
