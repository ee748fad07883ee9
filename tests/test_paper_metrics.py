"""The reference paper's headline learning metric: cov(v_axis, error_axis)
shrinks when the RGP learns the drag online (reference measured ~2.5x
reduction on the circle, `covariance_data.csv` / BASELINE.md)."""

import numpy as np
import jax
import jax.numpy as jnp

from mpc_quad_ros_tpu.models.params import hummingbird_params
from mpc_quad_ros_tpu.models.augmented import make_mpc_dynamics
from mpc_quad_ros_tpu.models.ensemble import GPEnsemble
from mpc_quad_ros_tpu.ops import MPCConfig, SQPSolver
from mpc_quad_ros_tpu.loop import EpisodeConfig, run_episode
from mpc_quad_ros_tpu.io.viz import Visualiser
from mpc_quad_ros_tpu.io.logger import Logger
from mpc_quad_ros_tpu.traj import circle_trajectory_accelerating, states_from_flat_outputs

DT = jnp.float64


def run(gpe_mode, v_max):
    p = hummingbird_params(dtype=DT)
    cfg = EpisodeConfig(mpc=MPCConfig(u_ref=float(p.hover_input)))
    ts, pos, vel, acc = circle_trajectory_accelerating(10.0, v_max, t_max=12.0, dt=cfg.mpc.dt)
    x_traj = jnp.asarray(states_from_flat_outputs(np.asarray(pos), np.asarray(vel)), DT)
    x0 = jnp.asarray([0, 0, 3, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0], dtype=DT)
    solver = SQPSolver(cfg.mpc, make_mpc_dynamics(p))
    rgp0 = None
    if gpe_mode == 2:
        rgp0 = GPEnsemble.fromrange([(-v_max, v_max)] * 3, 10,
                                    theta=(3.0, 0.1, 0.01), dtype=DT).state
    _, outs = jax.jit(
        lambda a, b, r: run_episode(cfg, solver, p, a, b, x_traj.shape[0], rgp0=r)
    )(x0, x_traj, rgp0)
    return Visualiser.from_logger(Logger.from_episode(outs))


def test_rgp_reduces_velocity_error_covariance():
    """gp2 must cut |cov(v_x, e_x)| substantially vs gp0 (reference: ~2.5x)."""
    for v_peak in (3.0, 6.0):
        cov0 = run(0, v_peak).velocity_error_covariance()
        cov2 = run(2, v_peak).velocity_error_covariance()
        # x/y axes carry the drag signature on the planar circle
        for ax in range(2):
            assert abs(cov2[ax]) < abs(cov0[ax]) / 1.5, (
                f"v_peak={v_peak} axis={ax}: gp0 {cov0[ax]:.4f} gp2 {cov2[ax]:.4f}"
            )


def test_rms_metrics_scale_of_reference():
    """Sanity: tracking at v=6 lands in the sub-metre RMS regime the
    reference reports (its figures quote hundreds of mm)."""
    viz = run(2, 6.0)
    rms = viz.rms_errors()
    assert rms["rms_pos_mm"] < 1000.0
