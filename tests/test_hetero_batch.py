"""Heterogeneous scenario batches (VERDICT r2 item 5 / SURVEY §7).

Mixed v_max ⇒ mixed trajectory lengths and tick counts in ONE batched
computation: `run_episode_batch_fused(traj_len=, episode_ticks=)` pads to a
shared T, clips the reference gather to each episode's own last sample (the
reference's per-episode end-of-trajectory hover semantics,
`utils.py:912-930`), and freezes finished episodes.

The oracle exploits lane independence: every per-scenario value in the fused
pipeline is independent of what occupies the other lanes, so a heterogeneous
batch row must equal the same episode run in a HOMOGENEOUS batch of its own
length.  Agreement is to chaos-amplified rounding, not bitwise: the two runs
are different jit programs (different batch shapes + masking ops), and XLA
fuses their in-kernel reductions in different orders — measured one solve
apart by 6e-5 in u on identical inputs, growing to ~6e-4 in position over 30
closed-loop ticks.  With IDENTICAL shapes (masks given but nothing frozen)
the masked path IS bitwise-equal to the unmasked one, asserted below.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mpc_quad_ros_tpu.models.params import hummingbird_params, randomize_params
from mpc_quad_ros_tpu.models.augmented import make_mpc_dynamics
from mpc_quad_ros_tpu.models.rgp import rgp_init
from mpc_quad_ros_tpu.ops import MPCConfig, SQPSolver
from mpc_quad_ros_tpu.loop import (EpisodeConfig, run_episode_batch_fused,
                                   tracking_rmse_masked)

DTYPE = jnp.float32
BG = 128            # episodes per group (one full lane tile)
T_A, TICKS_A = 40, 30
T_B, TICKS_B = 25, 15


def _group(key, T, target_x):
    """One homogeneous episode group: straight-line reference of T samples."""
    p = hummingbird_params(dtype=DTYPE)
    pb = randomize_params(p, key, BG)
    x0 = jnp.zeros((BG, 13), DTYPE).at[:, 3].set(1.0).at[:, 2].set(3.0)
    traj = jnp.zeros((BG, T, 13), DTYPE).at[:, :, 3].set(1.0).at[:, :, 2].set(3.0)
    traj = traj.at[:, :, 0].set(
        jnp.linspace(0, target_x, T, dtype=DTYPE)[None, :])
    rgp1 = rgp_init(jnp.linspace(-5, 5, 8, dtype=DTYPE), theta=(3.0, 0.1, 0.01))
    rgp = jax.tree.map(lambda a: jnp.broadcast_to(a, (BG, 3) + a.shape), rgp1)
    return pb, x0, traj, rgp


@pytest.mark.slow
def test_heterogeneous_batch_matches_homogeneous_oracles():
    p1 = hummingbird_params(dtype=DTYPE)
    cfg = EpisodeConfig(mpc=MPCConfig(u_ref=float(p1.hover_input), qp_iters=4),
                        log_rgp_posterior=False)
    solver = SQPSolver(cfg.mpc, make_mpc_dynamics(p1))

    ka, kb = jax.random.split(jax.random.PRNGKey(0))
    pa, x0a, traja, rgpa = _group(ka, T_A, 2.0)
    pb, x0b, trajb, rgpb = _group(kb, T_B, -1.5)

    # homogeneous oracles: each group at its own (T, n_ticks)
    _, outs_a = run_episode_batch_fused(cfg, solver, pa, x0a, traja, TICKS_A, rgpa)
    _, outs_b = run_episode_batch_fused(cfg, solver, pb, x0b, trajb, TICKS_B, rgpb)

    # heterogeneous batch: pad group B's trajectory to T_A with ZEROS (must
    # never be read — the gather clips at traj_len-1), shared n_ticks=TICKS_A
    trajb_pad = jnp.concatenate(
        [trajb, jnp.zeros((BG, T_A - T_B, 13), DTYPE)], axis=1)
    params = jax.tree.map(lambda a, b: jnp.concatenate([a, b]), pa, pb)
    x0 = jnp.concatenate([x0a, x0b])
    traj = jnp.concatenate([traja, trajb_pad])
    rgp = jax.tree.map(lambda a, b: jnp.concatenate([a, b]), rgpa, rgpb)
    traj_len = jnp.concatenate([jnp.full((BG,), T_A, jnp.int32),
                                jnp.full((BG,), T_B, jnp.int32)])
    episode_ticks = jnp.concatenate([jnp.full((BG,), TICKS_A, jnp.int32),
                                     jnp.full((BG,), TICKS_B, jnp.int32)])

    final, outs = run_episode_batch_fused(
        cfg, solver, params, x0, traj, TICKS_A, rgp,
        traj_len=traj_len, episode_ticks=episode_ticks)

    xh = np.asarray(outs.x_odom)
    uh = np.asarray(outs.w_odom)

    # group A rows: full-length agreement with the homogeneous run (atol:
    # chaos-amplified rounding between two differently-fused jit programs,
    # measured 6e-4 after 30 ticks — see module docstring)
    np.testing.assert_allclose(xh[:BG], np.asarray(outs_a.x_odom), atol=5e-3)
    np.testing.assert_allclose(uh[:BG], np.asarray(outs_a.w_odom), atol=2e-3)

    # group B rows: the live prefix matches its own homogeneous run
    np.testing.assert_allclose(xh[BG:, :TICKS_B], np.asarray(outs_b.x_odom),
                               atol=5e-3)
    np.testing.assert_allclose(uh[BG:, :TICKS_B], np.asarray(outs_b.w_odom),
                               atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(outs.rgp_mu_g_t)[BG:, :TICKS_B],
        np.asarray(outs_b.rgp_mu_g_t), atol=2e-3)

    # after its episode ends, a frozen episode's state stops evolving — this
    # is EXACT (freezing is a select on the carry)
    assert (xh[BG:, TICKS_B:] == xh[BG:, TICKS_B:TICKS_B + 1]).all()
    # ...and its RGP posterior too (the final carry holds the tick-15 state)
    np.testing.assert_array_equal(
        np.asarray(final.rgp.mu_g)[BG:],
        np.asarray(outs.rgp_mu_g_t)[BG:, TICKS_B - 1])

    # the liveness mask is exactly the per-episode tick range
    act = np.asarray(outs.active)
    assert act[:BG].all()
    assert act[BG:, :TICKS_B].all() and not act[BG:, TICKS_B:].any()

    # masked metric == each group's own homogeneous metric
    from mpc_quad_ros_tpu.loop.episode import tracking_rmse
    rmse_h = np.asarray(tracking_rmse_masked(outs))
    np.testing.assert_allclose(rmse_h[:BG], np.asarray(tracking_rmse(outs_a)),
                               atol=2e-3)
    np.testing.assert_allclose(rmse_h[BG:], np.asarray(tracking_rmse(outs_b)),
                               atol=2e-3)


@pytest.mark.slow
def test_masked_identical_shapes_is_bitwise():
    """With masks supplied but nothing actually frozen (traj_len=T,
    episode_ticks=n_ticks) and the SAME batch shape, the masked path must be
    bitwise-equal to the unmasked one — the masking machinery itself adds no
    numerics."""
    p1 = hummingbird_params(dtype=DTYPE)
    cfg = EpisodeConfig(mpc=MPCConfig(u_ref=float(p1.hover_input), qp_iters=4),
                        log_rgp_posterior=False)
    solver = SQPSolver(cfg.mpc, make_mpc_dynamics(p1))
    pa, x0a, traja, rgpa = _group(jax.random.PRNGKey(0), T_A, 2.0)
    ticks = 6
    _, plain = run_episode_batch_fused(cfg, solver, pa, x0a, traja, ticks, rgpa)
    _, masked = run_episode_batch_fused(
        cfg, solver, pa, x0a, traja, ticks, rgpa,
        traj_len=jnp.full((BG,), T_A, jnp.int32),
        episode_ticks=jnp.full((BG,), ticks, jnp.int32))
    np.testing.assert_array_equal(np.asarray(masked.x_odom),
                                  np.asarray(plain.x_odom))
    np.testing.assert_array_equal(np.asarray(masked.w_odom),
                                  np.asarray(plain.w_odom))
    assert np.asarray(masked.active).all()
