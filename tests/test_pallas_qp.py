"""Pallas lanes-batched QP kernel + batch-major solver/episode paths.
On CPU the kernel runs in interpret mode; the oracle is the XLA pdip (itself
scipy-validated in test_qp.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpc_quad_ros_tpu.ops.qp import solve_box_qp_pdip
from mpc_quad_ros_tpu.ops.pallas.qp_kernel import solve_box_qp_pdip_pallas

DT = jnp.float32


def random_qps(B, nz, seed=0):
    key = jax.random.PRNGKey(seed)
    A = jax.random.normal(key, (B, nz, nz), DT)
    H = jnp.einsum("bij,bkj->bik", A, A) + 0.5 * jnp.eye(nz, dtype=DT)
    g = jax.random.normal(jax.random.PRNGKey(seed + 1), (B, nz), DT) * 3
    return H, g


def test_pallas_matches_xla_pdip():
    B, nz = 256, 40
    H, g = random_qps(B, nz)
    lb, ub = jnp.zeros(nz, DT), jnp.ones(nz, DT)
    z_ref = jax.vmap(lambda H, g: solve_box_qp_pdip(H, g, lb, ub, iters=12))(H, g)
    z_pal = solve_box_qp_pdip_pallas(H, g, lb, ub, iters=12, interpret=True)
    # the kernel Jacobi-scales the problem, so the fixed-iteration IPM path
    # differs slightly from the unscaled XLA oracle (~1e-3 at the bounds)
    np.testing.assert_allclose(np.asarray(z_pal), np.asarray(z_ref), atol=5e-3)


def test_pallas_pads_non_multiple_batch():
    B, nz = 100, 16  # not a multiple of 128
    H, g = random_qps(B, nz, seed=3)
    lb, ub = jnp.zeros(nz, DT), jnp.ones(nz, DT)
    z_ref = jax.vmap(lambda H, g: solve_box_qp_pdip(H, g, lb, ub, iters=10))(H, g)
    z_pal = solve_box_qp_pdip_pallas(H, g, lb, ub, iters=10, interpret=True)
    assert z_pal.shape == (B, nz)
    np.testing.assert_allclose(np.asarray(z_pal), np.asarray(z_ref), atol=5e-3)


def test_solve_batch_matches_vmapped_solve():
    """Batch-major SQP path (Pallas QP) == per-scenario path (XLA QP)."""
    from mpc_quad_ros_tpu.models.params import hummingbird_params
    from mpc_quad_ros_tpu.models.augmented import make_mpc_dynamics
    from mpc_quad_ros_tpu.ops import MPCConfig, SQPSolver
    from mpc_quad_ros_tpu.ops.sqp import init_carry

    B = 8
    p = hummingbird_params(dtype=DT)
    # extra QP iterations so both implementations are near-converged and the
    # comparison measures the same optimum, not truncation differences
    cfg = MPCConfig(u_ref=float(p.hover_input), qp_iters=25)
    solver = SQPSolver(cfg, make_mpc_dynamics(p))
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((B, 13), DT).at[:, 3].set(1.0).at[:, 2].set(3.0)
    x0 = x0.at[:, 7:10].add(jax.random.uniform(key, (B, 3), DT, -2, 2))
    y_ref = jnp.broadcast_to(x0[:, None, :], (B, cfg.n_nodes, 13))
    carry = jax.vmap(lambda x: init_carry(cfg, x))(x0)

    _, sol_ref = jax.vmap(lambda c, x, yr: solver.solve(c, x, yr, yr[-1], None))(
        carry, x0, y_ref
    )
    _, sol_bat = solver.solve_batch(carry, x0, y_ref, y_ref[:, -1], None)
    # two f32 IPM implementations (one Jacobi-scaled) at fixed iterations land
    # on slightly different near-optimal points around active bounds; assert
    # matched solution QUALITY (cost) plus loose element-wise agreement
    np.testing.assert_allclose(np.asarray(sol_bat.cost), np.asarray(sol_ref.cost),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sol_bat.U), np.asarray(sol_ref.U), atol=5e-2)
    np.testing.assert_allclose(np.asarray(sol_bat.X), np.asarray(sol_ref.X), atol=2e-1)


@pytest.mark.slow
def test_fused_episode_batch_matches_vmap_of_scan():
    from mpc_quad_ros_tpu.models.params import hummingbird_params
    from mpc_quad_ros_tpu.models.augmented import make_mpc_dynamics
    from mpc_quad_ros_tpu.models.rgp import rgp_init
    from mpc_quad_ros_tpu.ops import MPCConfig, SQPSolver
    from mpc_quad_ros_tpu.loop import EpisodeConfig, run_episode_batch, run_episode_batch_fused

    B, T = 4, 8
    p1 = hummingbird_params(dtype=DT)
    cfg = EpisodeConfig(mpc=MPCConfig(u_ref=float(p1.hover_input), qp_iters=25))
    solver = SQPSolver(cfg.mpc, make_mpc_dynamics(p1))

    pb = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), p1)
    key = jax.random.PRNGKey(1)
    x0 = jnp.zeros((B, 13), DT).at[:, 3].set(1.0).at[:, 2].set(3.0)
    traj = jnp.zeros((B, T, 13), DT).at[:, :, 3].set(1.0).at[:, :, 2].set(3.0)
    traj = traj.at[:, :, 0].set(
        jnp.linspace(0, 1, T, dtype=DT)[None, :] * jax.random.uniform(key, (B, 1), DT, 0.5, 2.0)
    )
    rgp1 = rgp_init(jnp.linspace(-5, 5, 8, dtype=DT), theta=(3.0, 0.1, 0.01))
    rgp = jax.tree.map(lambda a: jnp.broadcast_to(a, (B, 3) + a.shape), rgp1)

    _, o_ref = run_episode_batch(cfg, solver, pb, x0, traj, T, rgp)
    _, o_fus = run_episode_batch_fused(cfg, solver, pb, x0, traj, T, rgp)

    # run-vs-run caveat (CLAUDE.md): these are two equally-converged solvers
    # (XLA oracle vs Pallas kernels), and chained ticks amplify the f32
    # formulation differences at active-set boundaries — measured 2/128
    # elements at 0.055 after the panel-live-substitution rewrite, all on
    # ticks where u sits against a bound.  0.1 still catches wiring bugs
    # (wrong scenario routing or broken updates are O(1) off).
    np.testing.assert_allclose(np.asarray(o_fus.w_odom), np.asarray(o_ref.w_odom), atol=1e-1)
    np.testing.assert_allclose(np.asarray(o_fus.x_odom), np.asarray(o_ref.x_odom), atol=1e-1)
    np.testing.assert_allclose(
        np.asarray(o_fus.rgp_mu_g_t), np.asarray(o_ref.rgp_mu_g_t), atol=1e-1
    )
    # identical plants/solves across the batch must stay identical lanes
    np.testing.assert_allclose(
        np.asarray(o_fus.x_odom[0]), np.asarray(o_fus.x_odom[0]), atol=0
    )


@pytest.mark.slow
def test_nan_lane_isolation_in_tiled_solve():
    """Production robustness (SURVEY §7 'one bad scenario cannot stall the
    lane'): a NaN scenario inside a 128-lane tile must not perturb ANY
    other lane — every kernel op is lanes-vectorized and every reduction
    (fraction-to-the-boundary, duality gap) is per-lane.  Pinned BITWISE:
    poisoning lane 7 leaves all other lanes' controls identical to the
    clean batch."""
    from mpc_quad_ros_tpu.models.augmented import make_mpc_dynamics
    from mpc_quad_ros_tpu.models.params import hummingbird_params
    from mpc_quad_ros_tpu.models.rgp import rgp_init
    from mpc_quad_ros_tpu.ops import MPCConfig, SQPSolver
    from mpc_quad_ros_tpu.ops.sqp import init_carry

    B = 128
    p = hummingbird_params(dtype=DT)
    cfg = MPCConfig(u_ref=float(p.hover_input), qp_iters=6)
    solver = SQPSolver(cfg, make_mpc_dynamics(p))
    rgp1 = rgp_init(jnp.linspace(-10, 10, 10, dtype=DT), theta=(3.0, 0.1, 0.01))
    rgp = jax.tree.map(lambda a: jnp.broadcast_to(a, (B, 3) + a.shape), rgp1)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((B, 13), DT).at[:, 3].set(1.0).at[:, 2].set(3.0)
    x0 = x0.at[:, 7:10].add(jax.random.uniform(key, (B, 3), DT, -2, 2))
    y_ref = jnp.broadcast_to(x0[:, None, :], (B, cfg.n_nodes, 13))
    carry = jax.vmap(lambda x: init_carry(cfg, x))(x0)

    _, sol_clean = solver.solve_batch(carry, x0, y_ref, y_ref[:, -1], rgp)

    x0_bad = x0.at[7, 8].set(jnp.nan)
    carry_bad = jax.vmap(lambda x: init_carry(cfg, x))(x0_bad)
    _, sol_bad = solver.solve_batch(carry_bad, x0_bad, y_ref, y_ref[:, -1], rgp)

    U_c, U_b = np.asarray(sol_clean.U), np.asarray(sol_bad.U)
    assert np.isnan(U_b[7]).any()                 # the poison reached lane 7
    mask = np.arange(B) != 7
    np.testing.assert_array_equal(U_b[mask], U_c[mask])
