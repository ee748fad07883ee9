"""SoA (lane-major) linearization parity: `models/dynamics_soa.py` must
reproduce the jacfwd-of-AoS sensitivities and the batched solver results
exactly (same ops, different layout — x64 CPU makes the comparison tight)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_quad_ros_tpu.models.augmented import fold_drag, make_mpc_dynamics
from mpc_quad_ros_tpu.models.dynamics_soa import linearize_rk4_soa, make_mpc_dynamics_soa
from mpc_quad_ros_tpu.models.params import hummingbird_params
from mpc_quad_ros_tpu.models.rgp import rgp_init
from mpc_quad_ros_tpu.ops import MPCConfig, SQPSolver
from mpc_quad_ros_tpu.ops.sqp import init_carry


def _random_states(key, M):
    kx, ku = jax.random.split(key)
    x = jax.random.normal(kx, (M, 13)) * 0.5
    x = x.at[:, 3].add(1.0)  # near-identity, non-unit quaternions
    u = jax.random.uniform(ku, (M, 4), minval=0.1, maxval=0.9)
    return x, u


def _batched_rgp(key, B, nb=8):
    st = rgp_init(jnp.linspace(-6.0, 6.0, nb), theta=(1.0, 0.4, 0.1))
    st = jax.tree.map(lambda a: jnp.broadcast_to(a, (B, 3) + a.shape).copy(), st)
    return st._replace(mu_g=0.3 * jax.random.normal(key, (B, 3, nb)))


@pytest.mark.parametrize("with_aug", [False, True])
def test_f_soa_matches_aos(with_aug):
    p = hummingbird_params()
    f = make_mpc_dynamics(p)
    f_soa = make_mpc_dynamics_soa(p)
    key = jax.random.PRNGKey(0)
    x, u = _random_states(key, 32)
    if with_aug:
        aug1 = fold_drag(_batched_rgp(key, 1))
        aug_shared = jax.tree.map(lambda a: a[0], aug1)       # (3, nb) shared
        dx_aos = jax.vmap(lambda x, u: f(x, u, aug_shared))(x, u)
        dx_soa = f_soa(x.T, u.T, aug_shared).T
    else:
        dx_aos = jax.vmap(lambda x, u: f(x, u, None))(x, u)
        dx_soa = f_soa(x.T, u.T, None).T
    np.testing.assert_allclose(np.asarray(dx_soa), np.asarray(dx_aos), atol=1e-12)


@pytest.mark.parametrize("with_aug", [False, True])
def test_linearize_soa_matches_jacfwd(with_aug):
    p = hummingbird_params()
    cfg = MPCConfig()
    solver = SQPSolver(cfg, make_mpc_dynamics(p))
    key = jax.random.PRNGKey(1)
    B, N = 4, cfg.n_nodes
    x, u = _random_states(key, B * (N + 1))
    X = x.reshape(B, N + 1, 13)
    U = u[: B * N].reshape(B, N, 4)

    if with_aug:
        aug = fold_drag(_batched_rgp(key, B))
        A_ref, B_ref, r_ref = jax.vmap(solver._linearize)(X, U, aug)
        H, g, lb, ub, M, d = solver._assemble_batch_soa(
            X, U, X[:, 0], X[:, :-1], X[:, -1], aug
        )
        H2, g2, lb2, ub2, M2, d2 = jax.vmap(solver._assemble)(
            X, U, X[:, 0], X[:, :-1], X[:, -1], aug
        )
        np.testing.assert_allclose(np.asarray(H), np.asarray(H2), atol=1e-9)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g2), atol=1e-9)
        np.testing.assert_allclose(np.asarray(d), np.asarray(d2), atol=1e-10)
        aug_cols = None
    else:
        A_ref, B_ref, r_ref = jax.vmap(lambda X, U: solver._linearize(X, U, None))(X, U)
        aug_cols = None

    f_soa = solver.f.soa
    if with_aug:
        return  # assemble comparison above already covers the aug path
    xp, A, Bm = linearize_rk4_soa(
        f_soa, X[:, :-1].reshape(B * N, 13), U.reshape(B * N, 4), cfg.dt, aug_cols
    )
    np.testing.assert_allclose(np.asarray(A.reshape(B, N, 13, 13)),
                               np.asarray(A_ref), atol=1e-10)
    np.testing.assert_allclose(np.asarray(Bm.reshape(B, N, 13, 4)),
                               np.asarray(B_ref), atol=1e-10)
    np.testing.assert_allclose(np.asarray(xp.reshape(B, N, 13) - X[:, 1:]),
                               np.asarray(r_ref), atol=1e-10)


def test_solve_batch_soa_matches_single_solve():
    """solve_batch (SoA + Pallas-interpret QP) must agree with the vmapped
    single-scenario solve on the optimal controls."""
    p = hummingbird_params()
    cfg = MPCConfig()
    solver = SQPSolver(cfg, make_mpc_dynamics(p))
    key = jax.random.PRNGKey(2)
    B = 4
    x0 = jnp.zeros((B, 13)).at[:, 3].set(1.0)
    x0 = x0 + 0.02 * jax.random.normal(key, (B, 13))
    y_ref = jnp.broadcast_to(x0[:, None, :], (B, cfg.n_nodes, 13)) + 0.1
    y_ref_N = y_ref[:, -1]
    carry = jax.vmap(lambda x: init_carry(cfg, x))(x0)
    aug = _batched_rgp(key, B)

    _, sol_b = solver.solve_batch(carry, x0, y_ref, y_ref_N, aug)
    _, sol_s = jax.vmap(lambda c, x, yr, yN, a: solver.solve(
        jax.tree.map(lambda l: l, c), x, yr, yN, a))(
        jax.vmap(lambda x: init_carry(cfg, x))(x0), x0, y_ref, y_ref_N, aug)
    np.testing.assert_allclose(np.asarray(sol_b.U), np.asarray(sol_s.U),
                               atol=5e-6)


def test_solve_batch_tiled_pipeline_matches_single_solve():
    """B = 128 engages the zero-relayout tiled pipeline (lin kernel -> tiled
    condense -> tiled QP, all interpret mode on CPU); must agree with the
    vmapped single-scenario solver."""
    p = hummingbird_params()
    cfg = MPCConfig()
    solver = SQPSolver(cfg, make_mpc_dynamics(p))
    key = jax.random.PRNGKey(7)
    B = 128
    x0 = jnp.zeros((B, 13)).at[:, 3].set(1.0) + 0.02 * jax.random.normal(key, (B, 13))
    y_ref = jnp.broadcast_to(x0[:, None, :], (B, cfg.n_nodes, 13)) + 0.1
    carry = jax.vmap(lambda x: init_carry(cfg, x))(x0)
    aug = _batched_rgp(key, B)

    _, sol_b = solver.solve_batch(carry, x0, y_ref, y_ref[:, -1], aug)
    _, sol_s = jax.vmap(lambda c, x, yr, yN, a: solver.solve(c, x, yr, yN, a))(
        carry, x0, y_ref, y_ref[:, -1], aug)
    np.testing.assert_allclose(np.asarray(sol_b.U), np.asarray(sol_s.U), atol=5e-6)
    np.testing.assert_allclose(np.asarray(sol_b.X), np.asarray(sol_s.X), atol=5e-6)
    np.testing.assert_allclose(np.asarray(sol_b.kkt_residual),
                               np.asarray(sol_s.kkt_residual), atol=1e-6)
