from .mesh import make_mesh, shard_episode_batch, sharded_step_fn, psum_metrics

__all__ = ["make_mesh", "shard_episode_batch", "sharded_step_fn", "psum_metrics"]
