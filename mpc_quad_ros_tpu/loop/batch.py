"""Scenario batching: vmapped episodes.

The scaling axis of the framework (SURVEY §2 parallelism inventory): the
reference runs ONE closed loop per process; here a whole batch of episodes —
randomised drag profiles, speeds, trajectories, per-episode RGP state — runs
as a single vmapped scan on one chip, and `parallel/` shards that batch over
a device mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax

from ..models.params import QuadParams
from .episode import EpisodeConfig, run_episode


def run_episode_batch(
    cfg: EpisodeConfig,
    solver,
    plant_params: QuadParams,     # leaves with leading (B,) — per-episode params
    x0,                           # (B, 13)
    x_trajectory,                 # (B, T, 13)
    n_ticks: int,
    rgp0=None,                    # leaves with leading (B,) or None
):
    """vmap `run_episode` over a leading batch dim of every argument."""

    def one(p, x, traj, rgp):
        return run_episode(cfg, solver, p, x, traj, n_ticks, rgp)

    if rgp0 is None:
        fn = jax.vmap(lambda p, x, tr: one(p, x, tr, None))
        return fn(plant_params, x0, x_trajectory)
    return jax.vmap(one)(plant_params, x0, x_trajectory, rgp0)
