"""Checkpoint / resume + fault-injection + profiling utilities."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mpc_quad_ros_tpu.io.checkpoint import save_checkpoint, load_checkpoint
from mpc_quad_ros_tpu.models.params import hummingbird_params
from mpc_quad_ros_tpu.models.augmented import make_mpc_dynamics
from mpc_quad_ros_tpu.models.ensemble import GPEnsemble
from mpc_quad_ros_tpu.ops import MPCConfig, SQPSolver
from mpc_quad_ros_tpu.loop import EpisodeConfig, run_episode
from mpc_quad_ros_tpu.traj import circle_trajectory_accelerating, states_from_flat_outputs

DT = jnp.float64


def setup(t_max=5.0, **cfg_kw):
    p = hummingbird_params(dtype=DT)
    mpc = MPCConfig(u_ref=float(p.hover_input))
    cfg = EpisodeConfig(mpc=mpc, **cfg_kw)
    ts, pos, vel, acc = circle_trajectory_accelerating(10.0, 5.0, t_max=t_max, dt=mpc.dt)
    x_traj = jnp.asarray(states_from_flat_outputs(np.asarray(pos), np.asarray(vel)), DT)
    x0 = jnp.asarray([0, 0, 3, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0], dtype=DT)
    solver = SQPSolver(mpc, make_mpc_dynamics(p))
    return p, cfg, solver, x0, x_traj


def test_mid_trajectory_resume_bit_exact(tmp_path):
    """Run T ticks straight vs T/2 + checkpoint + restore + T/2: identical."""
    p, cfg, solver, x0, x_traj = setup()
    T = x_traj.shape[0]
    gpe = GPEnsemble.fromrange([(-5, 5)] * 3, 8, theta=(3.0, 0.1, 0.01), dtype=DT)

    final_full, outs_full = run_episode(cfg, solver, p, x0, x_traj, T, rgp0=gpe.state)

    h = T // 2
    mid, outs_a = run_episode(cfg, solver, p, x0, x_traj, h, rgp0=gpe.state)
    path = save_checkpoint(str(tmp_path / "mid"), mid)
    restored = load_checkpoint(path)
    # resumed episode continues from the restored carry at the right tick
    final_b, outs_b = run_episode(cfg, solver, p, x0, x_traj, T - h,
                                  rgp0=gpe.state, carry0=restored, start_tick=h)

    np.testing.assert_array_equal(np.asarray(outs_b.x_odom),
                                  np.asarray(outs_full.x_odom)[h:])
    np.testing.assert_array_equal(np.asarray(outs_b.w_odom),
                                  np.asarray(outs_full.w_odom)[h:])
    np.testing.assert_array_equal(np.asarray(final_b.rgp.C_g),
                                  np.asarray(final_full.rgp.C_g))


def test_checkpoint_preserves_rgp_covariance(tmp_path):
    """Unlike the reference RGP save (drops C_g, `RGP.py:507-522`), the
    checkpoint keeps the full posterior."""
    gpe = GPEnsemble.fromrange([(-5, 5)] * 3, 8, dtype=DT)
    st = gpe.state._replace(C_g=gpe.state.C_g * 0.123)
    path = save_checkpoint(str(tmp_path / "rgp"), st)
    st2 = load_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(st.C_g), np.asarray(st2.C_g))


def test_fault_injection_schedule():
    """Rotor failure mid-episode degrades tracking after the fault tick."""
    p, cfg0, solver, x0, x_traj = setup(t_max=6.0)
    T = x_traj.shape[0]
    cfg_fault = cfg0._replace(fault_tick=T // 2, fault_rotors=(0.7, 1.0, 1.0, 1.0))

    _, outs_ok = run_episode(cfg0, solver, p, x0, x_traj, T)
    _, outs_fault = run_episode(cfg_fault, solver, p, x0, x_traj, T)

    e_ok = np.linalg.norm(np.asarray(outs_ok.x_odom)[:, :3] - np.asarray(outs_ok.x_ref)[:, :3], axis=1)
    e_f = np.linalg.norm(np.asarray(outs_fault.x_odom)[:, :3] - np.asarray(outs_fault.x_ref)[:, :3], axis=1)
    # identical before the fault...
    np.testing.assert_allclose(e_f[: T // 2], e_ok[: T // 2], atol=1e-12)
    # ...worse after
    assert e_f[T // 2 + 5:].mean() > e_ok[T // 2 + 5:].mean()


@pytest.mark.slow
def test_profiling_phases():
    from mpc_quad_ros_tpu.io.profiling import profile_solver_phases, Stopwatch
    from mpc_quad_ros_tpu.ops.sqp import init_carry

    p, cfg, solver, x0, x_traj = setup()
    B = 4
    x0b = jnp.broadcast_to(x0, (B, 13))
    carry = jax.vmap(lambda x: init_carry(cfg.mpc, x))(x0b)
    y_ref = jnp.broadcast_to(x0[None, None], (B, cfg.mpc.n_nodes, 13))
    res = profile_solver_phases(solver, carry, x0b, y_ref, iters=2)
    for k in ("linearize_s", "assemble_s", "qp_s", "full_solve_s", "solves_per_s"):
        assert res[k] > 0

    sw = Stopwatch()
    with sw.phase("a"):
        sum(range(1000))
    assert "a" in sw.report()
