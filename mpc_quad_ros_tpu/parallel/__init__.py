from .mesh import make_mesh, shard_episode_batch, sharded_step_fn, psum_metrics
from .distributed import (global_mesh, initialize, local_shard,
                          make_global_batch, process_slice)

__all__ = ["make_mesh", "shard_episode_batch", "sharded_step_fn", "psum_metrics",
           "global_mesh", "initialize", "local_shard", "make_global_batch",
           "process_slice"]
