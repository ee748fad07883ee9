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
    gp_aug=None,                  # static pretrained GPState shared by all episodes
):
    """vmap `run_episode` over a leading batch dim of every argument."""

    def one(p, x, traj, rgp):
        return run_episode(cfg, solver, p, x, traj, n_ticks, rgp, gp_aug=gp_aug)

    if rgp0 is None:
        fn = jax.vmap(lambda p, x, tr: one(p, x, tr, None))
        return fn(plant_params, x0, x_trajectory)
    return jax.vmap(one)(plant_params, x0, x_trajectory, rgp0)


def run_episode_batch_fused(
    cfg: EpisodeConfig,
    solver,
    plant_params: QuadParams,     # leaves with leading (B,)
    x0,                           # (B, 13)
    x_trajectory,                 # (B, T, 13)
    n_ticks: int,
    rgp0=None,                    # leaves with leading (B,) or None
    gp_aug=None,                  # static pretrained GPState with leading (B,)
):
    """Batch-major episode scan: one scan over ticks whose body operates on
    the WHOLE scenario batch, so the condensed QPs of all episodes are solved
    together by the Pallas lanes-batched IPM kernel (`SQPSolver.solve_batch`).

    Numerically equivalent to `run_episode_batch` (vmap-of-scan); this is the
    throughput path — the vmap-of-scan form leaves the QP as B independent
    40x40 Cholesky chains that XLA solves at ~6% of the Pallas kernel's rate.

    Returns (final_carry, EpisodeOutput) with leading dims (B, n_ticks, ...).
    """
    import jax.numpy as jnp

    from ..models.dynamics import compute_a_drag_target, plant_substeps
    from ..models.rgp import rgp_regress
    from ..ops.sqp import init_carry
    from .episode import EpisodeCarry, EpisodeOutput

    mpc = cfg.mpc
    N = mpc.n_nodes
    n_sub = cfg.n_substeps
    use_rgp = rgp0 is not None
    log_post = use_rgp and cfg.log_rgp_posterior
    B = x0.shape[0]
    T = x_trajectory.shape[1]

    def tick(carry, i):
        x = carry.x                                       # (B, 13)
        idx = jnp.clip((i + jnp.arange(N)) * cfg.control_skip, 0, T - 1)
        x_ref = x_trajectory[:, idx, :]                   # (B, N, 13)

        aug = carry.rgp if use_rgp else gp_aug
        solver_carry, sol = solver.solve_batch(carry.solver, x, x_ref, x_ref[:, -1], aug)
        u = sol.U[:, 0]                                   # (B, 4)

        x_pred = jax.vmap(lambda x, u: solver.discrete_dynamics(x, u, mpc.dt, None))(x, u)
        x_next = jax.vmap(
            lambda x, u, p: plant_substeps(x, u, p, cfg.simulation_dt, n_sub)
        )(x, u, plant_params)

        if use_rgp:
            v_body, a_drag = compute_a_drag_target(x, carry.x_pred_prev, mpc.dt)
            rgp_new = jax.vmap(jax.vmap(rgp_regress))(
                carry.rgp, v_body[:, :, None], a_drag[:, :, None]
            )
        else:
            v_body = a_drag = None
            rgp_new = carry.rgp

        out = EpisodeOutput(
            x_odom=x, x_pred_odom=x_pred, x_ref=x_ref[:, 0], w_odom=u,
            cost_solution=sol.cost, kkt_residual=sol.kkt_residual,
            rgp_mu_g_t=rgp_new.mu_g if use_rgp else None,
            v_body=v_body, a_drag=a_drag,
            rgp_basis_vectors=rgp_new.X if log_post else None,
            rgp_C_g_t=rgp_new.C_g if log_post else None,
            rgp_theta=rgp_new.theta if log_post else None,
        )
        return EpisodeCarry(x=x_next, solver=solver_carry, rgp=rgp_new,
                            x_pred_prev=x_pred), out

    carry0 = EpisodeCarry(
        x=x0,
        solver=jax.vmap(lambda x: init_carry(mpc, x))(x0),
        rgp=rgp0,
        x_pred_prev=x0,
    )
    final, outs = jax.lax.scan(tick, carry0, jnp.arange(n_ticks))
    # (n_ticks, B, ...) -> (B, n_ticks, ...) to match run_episode_batch
    outs = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1) if a is not None else None, outs)
    return final, outs
