"""Closed-loop episode tests — the `execute_trajectory --gpe {0,2}
--trajectory 2` analogue in miniature (BASELINE configs 1 and 2).

These run the full jit-compiled scan on CPU: MPC tracks the accelerating
circle flown by the drag-afflicted plant; gp2 must reduce tracking error
versus the nominal controller by learning the drag online."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpc_quad_ros_tpu.models.params import hummingbird_params
from mpc_quad_ros_tpu.models.augmented import make_mpc_dynamics
from mpc_quad_ros_tpu.models.ensemble import GPEnsemble
from mpc_quad_ros_tpu.ops import MPCConfig, SQPSolver
from mpc_quad_ros_tpu.loop import EpisodeConfig, run_episode, run_episode_batch
from mpc_quad_ros_tpu.loop.episode import tracking_rmse
from mpc_quad_ros_tpu.traj import circle_trajectory_accelerating, states_from_flat_outputs

DTYPE = jnp.float64


def setup(v_max=5.0, t_max=8.0):
    p = hummingbird_params(dtype=DTYPE)
    mpc = MPCConfig(u_ref=float(p.hover_input))
    cfg = EpisodeConfig(mpc=mpc)
    ts, pos, vel, acc = circle_trajectory_accelerating(10.0, v_max, t_max=t_max, dt=mpc.dt)
    x_traj = jnp.asarray(states_from_flat_outputs(pos, vel), dtype=DTYPE)
    x0 = jnp.asarray([0, 0, 3, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0], dtype=DTYPE)
    n_ticks = x_traj.shape[0]
    return p, cfg, x0, x_traj, n_ticks


def test_gp0_tracks_circle():
    p, cfg, x0, x_traj, n_ticks = setup()
    solver = SQPSolver(cfg.mpc, make_mpc_dynamics(p))
    final, outs = jax.jit(
        lambda x0, tr: run_episode(cfg, solver, p, x0, tr, n_ticks)
    )(x0, x_traj)

    assert np.isfinite(np.asarray(outs.x_odom)).all()
    # controls respect the box
    U = np.asarray(outs.w_odom)
    assert U.min() >= -1e-9 and U.max() <= 1 + 1e-9
    rmse = float(tracking_rmse(outs))
    # the quad starts 3 m above the circle plane and must dive in; after the
    # transient the tracking must be decent despite unmodelled drag
    tail_err = np.linalg.norm(
        np.asarray(outs.x_odom)[20:, :3] - np.asarray(outs.x_ref)[20:, :3], axis=1
    )
    assert tail_err.mean() < 1.0, f"tail mean err {tail_err.mean()}"
    assert rmse < 2.0, f"rmse {rmse}"


def test_gp2_improves_over_gp0():
    """BASELINE config 2: online RGP drag learning must beat the nominal
    controller on the same plant+trajectory."""
    p, cfg, x0, x_traj, n_ticks = setup(v_max=8.0, t_max=10.0)
    solver = SQPSolver(cfg.mpc, make_mpc_dynamics(p))

    _, outs0 = jax.jit(lambda a, b: run_episode(cfg, solver, p, a, b, n_ticks))(x0, x_traj)

    gpe = GPEnsemble.fromrange([(-8.0, 8.0)] * 3, 10, theta=(3.0, 0.1, 0.01), dtype=DTYPE)
    _, outs2 = jax.jit(lambda a, b, r: run_episode(cfg, solver, p, a, b, n_ticks, rgp0=r))(
        x0, x_traj, gpe.state
    )

    # drag was learned: posterior mean nonzero where visited
    assert np.abs(np.asarray(outs2.rgp_mu_g_t[-1])).max() > 0.05
    # velocity-tracking (the drag error signature) must improve
    ev0 = np.linalg.norm(np.asarray(outs0.x_odom)[30:, 7:10] - np.asarray(outs0.x_ref)[30:, 7:10], axis=1).mean()
    ev2 = np.linalg.norm(np.asarray(outs2.x_odom)[30:, 7:10] - np.asarray(outs2.x_ref)[30:, 7:10], axis=1).mean()
    e0 = np.linalg.norm(np.asarray(outs0.x_odom)[30:, :3] - np.asarray(outs0.x_ref)[30:, :3], axis=1).mean()
    e2 = np.linalg.norm(np.asarray(outs2.x_odom)[30:, :3] - np.asarray(outs2.x_ref)[30:, :3], axis=1).mean()
    assert e2 < e0, f"gp2 {e2} !< gp0 {e0}"
    assert ev2 < ev0, f"gp2 vel {ev2} !< gp0 {ev0}"


def test_batched_episodes_vmap():
    """A small scenario batch must run as one vmapped scan and match the
    unbatched episode bitwise."""
    p, cfg, x0, x_traj, n_ticks = setup(v_max=4.0, t_max=3.0)
    solver = SQPSolver(cfg.mpc, make_mpc_dynamics(p))
    B = 3
    pb = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), p)
    x0b = jnp.broadcast_to(x0, (B, 13))
    trajb = jnp.broadcast_to(x_traj, (B,) + x_traj.shape)

    _, outs_b = run_episode_batch(cfg, solver, pb, x0b, trajb, n_ticks)
    _, outs_1 = run_episode(cfg, solver, p, x0, x_traj, n_ticks)
    np.testing.assert_allclose(
        np.asarray(outs_b.x_odom[0]), np.asarray(outs_1.x_odom), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(outs_b.x_odom[1]), np.asarray(outs_b.x_odom[0]), atol=0
    )


def test_mpc_prefers_learned_model_statically():
    """Sanity: with a perfectly known drag curve injected as the RGP mean,
    the one-step MPC prediction error shrinks versus the nominal model."""
    from mpc_quad_ros_tpu.models.dynamics import plant_substeps, rk4_step, f_nominal
    from mpc_quad_ros_tpu.models.rgp import rgp_init, rgp_regress

    p = hummingbird_params(dtype=DTYPE)
    f_mpc = make_mpc_dynamics(p)
    solver = SQPSolver(MPCConfig(), f_mpc)

    # train the RGP on the true drag function directly
    import jax.numpy as jnp

    def true_drag(vb):
        return -(0.008 * vb**2 * np.sign(vb) + 0.3 * vb) / float(p.mass)

    sts = []
    for d in range(3):
        st = rgp_init(jnp.linspace(-8, 8, 15, dtype=DTYPE), theta=(3.0, 1.0, 0.01))
        for v in np.linspace(-8, 8, 40):
            drag = true_drag(v) if d < 2 else -(0.008 * v**2 * np.sign(v)) / float(p.mass)
            st = rgp_regress(st, jnp.asarray([v]), jnp.asarray([drag]))
        sts.append(st)
    rgp = jax.tree.map(lambda *ls: jnp.stack(ls), *sts)

    x = jnp.asarray([0, 0, 3, 1, 0, 0, 0, 5, 0, 0, 0, 0, 0], dtype=DTYPE)
    u = jnp.full((4,), float(p.hover_input), dtype=DTYPE)
    x_true = plant_substeps(x, u, p, 0.005, 20)
    x_nom = solver.discrete_dynamics(x, u, 0.1, None)
    x_aug = solver.discrete_dynamics(x, u, 0.1, rgp)
    err_nom = float(jnp.linalg.norm(x_nom[7:10] - x_true[7:10]))
    err_aug = float(jnp.linalg.norm(x_aug[7:10] - x_true[7:10]))
    assert err_aug < 0.2 * err_nom, (err_nom, err_aug)
