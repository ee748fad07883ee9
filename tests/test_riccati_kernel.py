"""Lanes-batched Pallas Riccati-IPM kernel (`ops/pallas/riccati_kernel.py`):
pinned against the f64 `solve_ocp_box_riccati_ipm` oracle (per the repo's
each-vs-f64-oracle comparison rule — two equally-converged f32 runs may
differ elementwise by the IPM's full convergence slack) and against the
vmapped XLA path through `solve_batch(qp_method="riccati")`.

Runs in Pallas interpret mode on CPU (conftest pins the backend)."""

import numpy as np
import jax
import jax.numpy as jnp

from mpc_quad_ros_tpu.models.params import hummingbird_params
from mpc_quad_ros_tpu.models.augmented import make_mpc_dynamics
from mpc_quad_ros_tpu.models.rgp import rgp_init
from mpc_quad_ros_tpu.ops import MPCConfig, SQPSolver
from mpc_quad_ros_tpu.ops.riccati import solve_ocp_box_riccati_ipm
from mpc_quad_ros_tpu.ops.pallas.riccati_kernel import (
    solve_ocp_box_riccati_ipm_pallas_tiled,
)
from mpc_quad_ros_tpu.ops.sqp import init_carry

NX, NU = 13, 4
Q = (10.0, 10.0, 10.0, 0.1, 0.1, 0.1, 0.1,
     0.05, 0.05, 0.05, 0.05, 0.05, 0.05)
RD = (0.1,) * NU
PT = tuple(2.0 * v for v in Q)


def _random_ocp(B, N, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    A = rng.normal(0, 0.08, (B, N, NX, NX)).astype(dtype) + np.eye(NX, dtype=dtype)
    Bm = rng.normal(0, 0.15, (B, N, NX, NU)).astype(dtype)
    c = rng.normal(0, 0.02, (B, N, NX)).astype(dtype)
    dx0 = rng.normal(0, 0.05, (B, NX)).astype(dtype)
    qlin = rng.normal(0, 0.5, (B, N, NX)).astype(dtype)
    rlin = rng.normal(0, 0.1, (B, N, NU)).astype(dtype)
    plin = rng.normal(0, 0.5, (B, NX)).astype(dtype)
    lb = np.full((B, N, NU), -0.16, dtype)
    ub = np.full((B, N, NU), 0.3, dtype)
    return tuple(jnp.asarray(a) for a in (A, Bm, c, dx0, qlin, rlin, plin, lb, ub))


def _oracle(ocp, iters, dtype):
    A, Bm, c, dx0, qlin, rlin, plin, lb, ub = (a.astype(dtype) for a in ocp)
    q = jnp.asarray(Q, dtype)
    rd = jnp.asarray(RD, dtype)
    pt = jnp.asarray(PT, dtype)

    def one(A, Bm, c, qlin, rlin, plin, dx0, lb, ub):
        return solve_ocp_box_riccati_ipm(
            A, Bm, c, q, qlin, rd, rlin, pt, plin,
            dx0=dx0, u_lb=lb, u_ub=ub, iters=iters)[0]

    return jax.vmap(one)(A, Bm, c, qlin, rlin, plin, dx0, lb, ub)


def _tile(a):
    nt = a.shape[0] // 128
    a = a.reshape((nt, 128) + a.shape[1:])
    return jnp.moveaxis(a, 1, -1)


def _untile(at):
    B = at.shape[0] * 128
    return jnp.moveaxis(at, -1, 1).reshape((B,) + at.shape[1:-1])


def test_kernel_matches_f64_oracle_on_saturated_instances():
    """f32 kernel vs the fully-converged f64 oracle on random OCPs where
    ~70% of the bounds are active: the kernel must sit within the IPM's own
    12-iteration convergence slack of the truth (measured 2.4e-4 here), not
    just within f32-vs-f32 drift of the XLA twin."""
    B, N = 128, 12
    ocp = _random_ocp(B, N)
    dU_truth = _oracle(ocp, iters=40, dtype=jnp.float64)

    A, Bm, c, dx0, qlin, rlin, plin, lb, ub = (
        a.astype(jnp.float32) for a in ocp)
    Jcols = jnp.concatenate([A, Bm], axis=3).transpose(0, 1, 3, 2)
    dUt, dXt = solve_ocp_box_riccati_ipm_pallas_tiled(
        _tile(Jcols), _tile(c), _tile(dx0), _tile(qlin), _tile(rlin),
        _tile(plin), _tile(lb), _tile(ub),
        q=Q, p_term=PT, rdiag=RD, nu=NU, iters=12, interpret=True)
    dU = _untile(dUt)

    sat = np.mean((np.asarray(dU_truth) <= -0.16 + 1e-3)
                  | (np.asarray(dU_truth) >= 0.3 - 1e-3))
    assert sat > 0.5, f"instances not saturated enough to be a bound test ({sat})"
    err = np.abs(np.asarray(dU, np.float64) - np.asarray(dU_truth)).max()
    assert err < 1e-3, f"kernel vs f64 oracle: {err}"

    # dX output must be the exact affine rollout of dU (defects included)
    def roll(A, Bm, c, dx0, du):
        def f(dx, inp):
            Ak, Bk, ck, dk = inp
            dxn = Ak @ dx + Bk @ dk + ck
            return dxn, dxn
        _, tail = jax.lax.scan(f, dx0, (A, Bm, c, du))
        return jnp.concatenate([dx0[None], tail], axis=0)

    dX_expect = jax.vmap(roll)(A, Bm, c, dx0, dU)
    np.testing.assert_allclose(np.asarray(_untile(dXt)), np.asarray(dX_expect),
                               atol=5e-5)


def test_solve_batch_riccati_matches_vmapped_solve():
    """`solve_batch(qp_method='riccati')` (Pallas tiled path at B=128) must
    agree with the vmapped per-scenario `solve` (XLA scan path) — same
    algorithm, different engines."""
    dtype = jnp.float32
    p = hummingbird_params(dtype=dtype)
    B, N = 128, 15
    cfg = MPCConfig(n_nodes=N, t_horizon=0.1 * N, u_ref=float(p.hover_input),
                    qp_method="riccati")
    solver = SQPSolver(cfg, make_mpc_dynamics(p))
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((B, 13), dtype).at[:, 3].set(1.0).at[:, 2].set(3.0)
    x0 = x0.at[:, 7:10].add(jax.random.uniform(key, (B, 3), dtype, -3, 3))
    y_ref = jnp.broadcast_to(x0[:, None, :], (B, N, 13))
    y_ref = y_ref.at[:, :, 0].add(jnp.linspace(0, 2, N, dtype=dtype)[None, :])
    carry = jax.vmap(lambda x: init_carry(cfg, x))(x0)

    rgp1 = rgp_init(jnp.linspace(-10, 10, 10, dtype=dtype),
                    theta=(3.0, 0.1, 0.01))
    rgp = jax.tree.map(lambda a: jnp.broadcast_to(a, (B, 3) + a.shape), rgp1)

    _, sol = solver.solve_batch(carry, x0, y_ref, y_ref[:, -1], rgp)
    _, sol_v = jax.vmap(
        lambda c, x, yr, r: solver.solve(c, x, yr, yr[-1], r)
    )(carry, x0, y_ref, rgp)

    np.testing.assert_allclose(np.asarray(sol.U), np.asarray(sol_v.U),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(sol.X), np.asarray(sol_v.X),
                               atol=1e-4)
    assert float(sol.U.min()) >= 0.0 and float(sol.U.max()) <= 1.0


def test_solve_batch_riccati_small_batch_fallback():
    """B < 128 takes the vmapped XLA fallback inside `solve_batch` — same
    answers as calling `solve` per scenario."""
    dtype = jnp.float32
    p = hummingbird_params(dtype=dtype)
    B, N = 4, 12
    cfg = MPCConfig(n_nodes=N, t_horizon=0.1 * N, u_ref=float(p.hover_input),
                    qp_method="riccati")
    solver = SQPSolver(cfg, make_mpc_dynamics(p))
    x0 = jnp.zeros((B, 13), dtype).at[:, 3].set(1.0).at[:, 2].set(3.0)
    x0 = x0.at[:, 7].add(jnp.linspace(-2, 2, B, dtype=dtype))
    y_ref = jnp.broadcast_to(x0[:, None, :], (B, N, 13))
    carry = jax.vmap(lambda x: init_carry(cfg, x))(x0)

    _, sol = solver.solve_batch(carry, x0, y_ref, y_ref[:, -1])
    _, sol_v = jax.vmap(
        lambda c, x, yr: solver.solve(c, x, yr, yr[-1])
    )(carry, x0, y_ref)
    np.testing.assert_allclose(np.asarray(sol.U), np.asarray(sol_v.U),
                               atol=1e-6)
