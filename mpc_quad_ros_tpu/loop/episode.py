"""Closed-loop episode: MPC ticks as a `lax.scan`.

The TPU-native form of the reference's simulation driver
(`/root/reference/src/execute_trajectory.py:172-279`): per tick —

1. gather the reference chunk for the current index (`utils.py:897-931`),
2. one SQP-RTI MPC solve warm-started from the previous tick,
3. nominal one-step prediction (the `quad_nominal.discrete_dynamics` twin used
   to build the drag-learning label),
4. 20 x 5 ms RK4 physics sub-steps of the true (drag) plant under the held
   first control,
5. (gp2) RGP regression on (v_body, a_drag) from the *previous* tick's
   prediction error — same data timing as the reference: the solve at tick i
   uses the posterior updated through measurement i-1
   (`execute_trajectory.py:246-258`),
6. log everything.

The whole episode is ONE jit-compiled scan — no Python in the loop, no
host<->device traffic; vmap it over scenarios (see `loop/batch.py`) and
shard the batch over a mesh (see `parallel/`).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.dynamics import compute_a_drag_target, plant_substeps
from ..models.params import QuadParams
from ..models.rgp import RGPState, rgp_regress
from ..ops.sqp import MPCConfig, SQPSolver, SolverCarry, init_carry


class EpisodeConfig(NamedTuple):
    mpc: MPCConfig = MPCConfig()
    simulation_dt: float = 5e-3       # physics RK4 step (`execute_trajectory.py:118`)
    control_skip: int = 1             # reference downsampling factor
                                      # (1 in the python sim — trajectory sampled at
                                      # optimization_dt; 10 in the ROS path)
    # fault injection: from `fault_tick` on, the plant's per-rotor
    # functionality switches to `fault_rotors` — the working version of the
    # reference's disabled mid-flight degradation hook
    # (`execute_trajectory.py:197-199`, `quad.py:86-87`)
    fault_tick: int = -1              # <0 disables
    fault_rotors: tuple = (1.0, 1.0, 1.0, 1.0)
    log_rgp_posterior: bool = True
    # log the full per-tick RGP posterior covariance / basis vectors / theta
    # (the reference logs all of them every tick,
    # `execute_trajectory.py:270-273`; consumed by the Visualiser's posterior
    # animations).  C_g is (3, nb, nb) per tick — disable for huge scenario
    # batches where (B, T, 3, nb, nb) would dominate memory.

    @property
    def n_substeps(self) -> int:
        return round(self.mpc.dt / self.simulation_dt)


class EpisodeCarry(NamedTuple):
    x: jnp.ndarray                 # (13,) plant state
    solver: SolverCarry            # warm-started primal trajectory
    rgp: Optional[RGPState]        # (3, nb) stacked, or None
    x_pred_prev: jnp.ndarray       # (13,) prediction made last tick for this tick


class EpisodeOutput(NamedTuple):
    """Stacked per-tick logs — the Logger keys of the reference
    (`execute_trajectory.py:270-273`), as device arrays."""

    x_odom: jnp.ndarray            # (T, 13)
    x_pred_odom: jnp.ndarray       # (T, 13)
    x_ref: jnp.ndarray             # (T, 13)
    w_odom: jnp.ndarray            # (T, 4)
    cost_solution: jnp.ndarray     # (T,)
    kkt_residual: jnp.ndarray      # (T,)
    rgp_mu_g_t: Optional[jnp.ndarray]   # (T, 3, nb) | None
    v_body: Optional[jnp.ndarray]       # (T, 3) | None
    a_drag: Optional[jnp.ndarray]       # (T, 3) | None
    # full posterior logging (`execute_trajectory.py:270-273`) — constant-
    # in-regress-mode X/theta are still stacked per tick for reference-format
    # parity (a learn-mode episode would genuinely vary them)
    rgp_basis_vectors: Optional[jnp.ndarray] = None  # (T, 3, nb) | None
    rgp_C_g_t: Optional[jnp.ndarray] = None          # (T, 3, nb, nb) | None
    rgp_theta: Optional[jnp.ndarray] = None          # (T, 3, 3) | None
    # heterogeneous batches only (`run_episode_batch_fused(episode_ticks=)`):
    # per-tick liveness mask — False rows are frozen episodes whose outputs
    # must be ignored by metrics (see `loop.batch.tracking_rmse_masked`)
    active: Optional[jnp.ndarray] = None             # (T,) bool | None


def run_episode(
    cfg: EpisodeConfig,
    solver: SQPSolver,
    plant_params: QuadParams,
    x0: jnp.ndarray,
    x_trajectory: jnp.ndarray,
    n_ticks: int,
    rgp0: Optional[RGPState] = None,
    gp_aug=None,
    carry0: Optional["EpisodeCarry"] = None,
    start_tick: int = 0,
):
    """Run one closed-loop episode of `n_ticks` MPC steps.

    solver       : SQPSolver whose dynamics accept aug = RGPState (gp2),
                   GPState (gp1) or None (gp0)
    plant_params : true-plant parameters (drag on) — may differ from the
                   solver's nominal model (that mismatch is what the RGP
                   learns)
    x_trajectory : (T, 13) sampled reference states
    rgp0         : initial stacked RGP state for gp2 mode
    gp_aug       : static pretrained GPState for gp1 mode
    """
    mpc = cfg.mpc
    N = mpc.n_nodes
    n_sub = cfg.n_substeps
    use_rgp = rgp0 is not None
    log_post = use_rgp and cfg.log_rgp_posterior

    def tick(carry: EpisodeCarry, i):
        x = carry.x

        # 1. reference chunk (clipped strided gather == reference padding).
        # control_skip > 1 means the trajectory is sampled control_skip-times
        # finer than the MPC rate (the ROS path's control_freq_factor,
        # `mpc_controller_node.py:222,278-280`); one MPC tick then advances
        # control_skip trajectory samples.
        idx = jnp.clip((i + jnp.arange(N)) * cfg.control_skip, 0, x_trajectory.shape[0] - 1)
        x_ref = jnp.take(x_trajectory, idx, axis=0)

        # 2. MPC solve (aug: online RGP posterior, static GP, or nothing)
        aug = carry.rgp if use_rgp else gp_aug
        solver_carry, sol = solver.solve(carry.solver, x, x_ref, x_ref[-1], aug)
        u = sol.U[0]

        # 3. nominal one-step prediction for the learning label
        x_pred = solver.discrete_dynamics(x, u, mpc.dt, None)

        # 4. true plant: n_sub physics sub-steps under held control,
        # with scheduled rotor-fault injection
        if cfg.fault_tick >= 0:
            healthy = plant_params.rotor_functionality
            faulty = jnp.asarray(cfg.fault_rotors, dtype=healthy.dtype)
            p_tick = plant_params._replace(
                rotor_functionality=jnp.where(i >= cfg.fault_tick, faulty, healthy)
            )
        else:
            p_tick = plant_params
        x_next = plant_substeps(x, u, p_tick, cfg.simulation_dt, n_sub)

        # 5. RGP regression with the PREVIOUS tick's prediction error
        if use_rgp:
            v_body, a_drag = compute_a_drag_target(x, carry.x_pred_prev, mpc.dt)
            rgp_new = jax.vmap(rgp_regress)(carry.rgp, v_body[:, None], a_drag[:, None])
        else:
            v_body = a_drag = None
            rgp_new = carry.rgp

        out = EpisodeOutput(
            x_odom=x,
            x_pred_odom=x_pred,
            x_ref=x_ref[0],
            w_odom=u,
            cost_solution=sol.cost,
            kkt_residual=sol.kkt_residual,
            rgp_mu_g_t=rgp_new.mu_g if use_rgp else None,
            v_body=v_body,
            a_drag=a_drag,
            rgp_basis_vectors=rgp_new.X if log_post else None,
            rgp_C_g_t=rgp_new.C_g if log_post else None,
            rgp_theta=rgp_new.theta if log_post else None,
        )
        new_carry = EpisodeCarry(x=x_next, solver=solver_carry, rgp=rgp_new, x_pred_prev=x_pred)
        return new_carry, out

    if carry0 is None:
        carry0 = EpisodeCarry(
            x=x0,
            solver=init_carry(mpc, x0),
            rgp=rgp0,
            # first tick: the reference uses the current state when the log is
            # empty (`execute_trajectory.py:251-254`) -> zero drag label
            x_pred_prev=x0,
        )
    final, outs = jax.lax.scan(tick, carry0, start_tick + jnp.arange(n_ticks))
    return final, outs


def make_episode_fn(cfg: EpisodeConfig, solver: SQPSolver, n_ticks: int):
    """Close over static config; returns a jittable
    (plant_params, x0, x_trajectory, rgp0, gp_aug) -> (final, outputs)."""

    def fn(plant_params, x0, x_trajectory, rgp0=None, gp_aug=None):
        return run_episode(cfg, solver, plant_params, x0, x_trajectory, n_ticks, rgp0, gp_aug)

    return fn


def tracking_rmse(outs: EpisodeOutput) -> jnp.ndarray:
    """RMS position tracking error [m] — the Visualiser's headline metric
    (`Visualiser.py:811-822`)."""
    err = outs.x_odom[..., :3] - outs.x_ref[..., :3]
    return jnp.sqrt(jnp.mean(jnp.sum(err**2, axis=-1), axis=-1))
