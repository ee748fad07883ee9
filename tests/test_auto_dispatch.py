"""qp_method="auto" backend dispatch + the condensed kernels' VMEM-ceiling
fallback (VERDICT r4 weak #1 / next-round item 2).

The crossover table itself is measured on TPU (outputs/roofline/
CROSSOVER_r05.json); here we pin (a) the resolution logic, (b) that an
auto-dispatched solve equals the explicitly-selected backend bitwise, and
(c) that an explicit "pdip" past FUSED_N_MAX resolves to the Riccati
backend with a warning instead of a Mosaic VMEM crash.
"""

import warnings

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpc_quad_ros_tpu.models.augmented import make_mpc_dynamics
from mpc_quad_ros_tpu.models.params import hummingbird_params
from mpc_quad_ros_tpu.ops import MPCConfig, SQPSolver
from mpc_quad_ros_tpu.ops.sqp import (AUTO_RICCATI_MIN_N_TILED,
                                      AUTO_RICCATI_MIN_N_XLA, FUSED_N_MAX,
                                      init_carry)

DTYPE = jnp.float32


def _solver(**kw):
    p = hummingbird_params(dtype=DTYPE)
    cfg = MPCConfig(u_ref=float(p.hover_input), **kw)
    return SQPSolver(cfg, make_mpc_dynamics(p)), cfg


def test_resolution_table():
    s, _ = _solver(qp_method="auto", n_nodes=10)
    assert s._resolve_qp_method(tiled=True) == "pdip"
    assert s._resolve_qp_method(tiled=False) == "pdip"

    s, _ = _solver(qp_method="auto", n_nodes=AUTO_RICCATI_MIN_N_TILED)
    assert s._resolve_qp_method(tiled=True) == "riccati"
    assert s._resolve_qp_method(tiled=False) == "pdip"

    s, _ = _solver(qp_method="auto", n_nodes=AUTO_RICCATI_MIN_N_XLA,
                   t_horizon=float(AUTO_RICCATI_MIN_N_XLA) / 10)
    assert s._resolve_qp_method(tiled=False) == "riccati"

    # explicit choices pass through untouched below the ceiling
    s, _ = _solver(qp_method="riccati", n_nodes=10)
    assert s._resolve_qp_method(tiled=True) == "riccati"
    s, _ = _solver(qp_method="pdip", n_nodes=FUSED_N_MAX)
    assert s._resolve_qp_method(tiled=True) == "pdip"


def test_vmem_ceiling_fallback_warns():
    s, _ = _solver(qp_method="pdip", n_nodes=FUSED_N_MAX + 4,
                   t_horizon=(FUSED_N_MAX + 4) / 10)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert s._resolve_qp_method(tiled=True) == "riccati"
    assert any("VMEM ceiling" in str(x.message) for x in w)
    # the per-scenario XLA path has no VMEM tile — no fallback there
    assert s._resolve_qp_method(tiled=False) == "pdip"


def _inputs(cfg, B=4):
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((B, 13), DTYPE).at[:, 3].set(1.0).at[:, 2].set(3.0)
    x0 = x0.at[:, 7:10].add(jax.random.uniform(key, (B, 3), DTYPE, -2, 2))
    y_ref = jnp.broadcast_to(x0[:, None, :], (B, cfg.n_nodes, 13))
    carry = jax.vmap(lambda x: init_carry(cfg, x))(x0)
    return carry, x0, y_ref


@pytest.mark.parametrize("n_nodes,explicit", [(10, "pdip"), (33, "riccati")])
@pytest.mark.slow
def test_auto_solve_matches_explicit_backend(n_nodes, explicit):
    """auto-dispatched solve_batch (small-B, non-tiled path) == the
    explicitly-selected backend, bitwise (same code path after resolution)."""
    kw = dict(n_nodes=n_nodes, t_horizon=n_nodes / 10.0, qp_iters=4)
    s_auto, cfg = _solver(qp_method="auto", **kw)
    s_exp, _ = _solver(qp_method=explicit, **kw)
    carry, x0, y_ref = _inputs(cfg)
    _, sol_a = jax.jit(lambda c, x, yr: s_auto.solve_batch(c, x, yr, yr[:, -1]))(
        carry, x0, y_ref)
    _, sol_e = jax.jit(lambda c, x, yr: s_exp.solve_batch(c, x, yr, yr[:, -1]))(
        carry, x0, y_ref)
    np.testing.assert_array_equal(np.asarray(sol_a.U), np.asarray(sol_e.U))
    np.testing.assert_array_equal(np.asarray(sol_a.X), np.asarray(sol_e.X))


def test_auto_thresholds_consistent_with_measured_crossover():
    """The dispatch constants must agree with the checked-in measured
    crossover artifact — if a re-measure moves the crossover, this fails
    until the constants (or the artifact) are updated together."""
    import json
    import os

    art = os.path.join(os.path.dirname(__file__), "..",
                       "outputs", "roofline", "CROSSOVER_r05.json")
    if not os.path.exists(art):
        pytest.skip("crossover artifact not present")
    rows = {r["n_nodes"]: r for r in json.load(open(art))}
    for N, r in rows.items():
        f = r.get("fused_us_per_solve")
        rp = r.get("riccati_pallas_us_per_solve")
        if f is None or rp is None:
            continue
        if N < AUTO_RICCATI_MIN_N_TILED:
            assert f <= rp, (N, f, rp)
        else:
            assert rp <= f, (N, f, rp)
    # the condensed kernels' ceiling row is recorded as a guard, not a crash
    assert any(N > FUSED_N_MAX and rows[N].get("fused_us_per_solve") is None
               and "fused_note" in rows[N] for N in rows)
