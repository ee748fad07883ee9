"""Control-sequence parity vs recorded acados runs (BASELINE metric)."""

import glob
import os

import numpy as np
import pytest

from mpc_quad_ros_tpu.bench.parity import replay_reference_log

LOGS = sorted(glob.glob("/root/reference/outputs/gazebo_simulation/data/traj2_v10*gp0.pkl"))


@pytest.mark.skipif(not LOGS, reason="no reference logs")
def test_control_sequence_matches_acados():
    r = replay_reference_log(LOGS[0])
    # same inputs as the acados controller to sub-percent accuracy on [0,1]
    assert r["du_mean"] < 0.005, r
    assert r["du_median"] < 0.002, r
    assert r["du_p95"] < 0.02, r


@pytest.mark.skipif(not LOGS, reason="no reference logs")
def test_cost_scaling_matters():
    """Disabling the acados stage-cost/dt semantics must visibly worsen the
    match — guards against the scaling silently becoming a no-op."""
    from mpc_quad_ros_tpu.models.params import hummingbird_params
    from mpc_quad_ros_tpu.models.augmented import make_mpc_dynamics
    from mpc_quad_ros_tpu.ops import MPCConfig, SQPSolver
    from mpc_quad_ros_tpu.ops.sqp import init_carry
    import pickle
    import jax
    import jax.numpy as jnp

    with open(LOGS[0], "rb") as f:
        d = pickle.load(f)
    X = jnp.asarray(np.array(d["x_odom"]))
    W = np.clip(np.array(d["w_odom"]), 0, 1)
    XR = jnp.asarray(np.array(d["x_ref"]))
    T = X.shape[0]
    p = hummingbird_params(dtype=X.dtype)

    cfg = MPCConfig(n_nodes=5, u_ref=0.16, sqp_iters=2, scale_stage_by_dt=False)
    solver = SQPSolver(cfg, make_mpc_dynamics(p))

    def tick(carry, k):
        idx = jnp.clip(k + 20 * jnp.arange(5), 0, T - 1)
        xr = jnp.take(XR, idx, axis=0)
        carry, sol = solver.solve(carry, X[k], xr, xr[-1], None)
        return carry, sol.U[0]

    _, U = jax.jit(lambda c: jax.lax.scan(tick, c, jnp.arange(300)))(init_carry(cfg, X[0]))
    du_unscaled = np.abs(np.asarray(U) - W[:300]).mean()

    r = replay_reference_log(LOGS[0])
    assert r["du_mean"] < du_unscaled / 3


GP1_LOGS = sorted(glob.glob("/root/reference/outputs/gazebo_simulation/data/traj0_v12*gp1.pkl"))
GP_MODELS = "/root/reference/outputs/gazebo_simulation/gp_models"


@pytest.mark.skipif(not (GP1_LOGS and os.path.isdir(GP_MODELS)), reason="no gp1 artifacts")
def test_gp1_replay_with_reference_model_files():
    """gp1 mode: reference-trained GP model files load and drive the
    augmented MPC; parity is looser (the checked-in models postdate the
    recorded runs — proven by test_gp1_vintage_explanation) but must stay
    within a few percent."""
    r = replay_reference_log(GP1_LOGS[0], gp_path=GP_MODELS)
    # tightened 0.03 -> 0.015 from the round-5 full-matrix sweep
    # (outputs/parity/PARITY_r05.json: this log replays at du_mean 0.0100;
    # the whole traj* gp1 family maxes at 0.0146)
    assert r["du_mean"] < 0.015, r


GP0_TWIN = "/root/reference/outputs/gazebo_simulation/data/traj0_v12_a12_gp0.pkl"


@pytest.mark.skipif(not (GP1_LOGS and os.path.isdir(GP_MODELS)
                         and os.path.exists(GP0_TWIN)), reason="no gp1 artifacts")
def test_gp1_vintage_explanation(tmp_path):
    """The gp1 parity gap is the MODEL FILES' vintage, not our injection
    path (VERDICT weak #4, full numbers in `bench/parity.py`):

    1. the checked-in x-axis GP misfits the gp1 log's OWN empirical drag
       labels several times worse than a GP our `train_gp` fits on the
       adjacent gp0 run — the files cannot be the models that flew the run;
    2. swapping only the model file (same injection path) moves the control
       parity toward gp0 levels — so the injection math is exonerated.
    """
    import jax.numpy as jnp

    from mpc_quad_ros_tpu.models.dataloader import DataLoaderGP
    from mpc_quad_ros_tpu.models.ensemble import GPEnsemble
    from mpc_quad_ros_tpu.models.train import train_gp

    gpe_fresh = train_gp(GP0_TWIN, str(tmp_path), n_training_samples=10, plot=False)
    gpe_ref = GPEnsemble.fromdir(GP_MODELS, "GP")

    # (1) drag-curve agreement with the gp1 log's own labels
    dl = DataLoaderGP(GP1_LOGS[0], 10)
    Xq = jnp.asarray(dl.X.T)[:, :, None]
    y_emp = dl.y.T
    rms = {}
    for name, gpe in (("ref", gpe_ref), ("fresh", gpe_fresh)):
        mu = np.asarray(gpe.predict(Xq)).reshape(3, -1)
        rms[name] = np.sqrt(np.mean((mu - y_emp) ** 2, axis=1))
    # x-axis: checked-in misfit is >2x the fresh fit's (measured: 4.4x)
    assert rms["ref"][0] > 2.0 * rms["fresh"][0], rms

    # (2) same replay, swapped model file only -> parity improves
    r_ref = replay_reference_log(GP1_LOGS[0], gp_path=GP_MODELS)
    r_fresh = replay_reference_log(GP1_LOGS[0], gp_path=str(tmp_path))
    assert r_fresh["du_mean"] < r_ref["du_mean"], (r_fresh, r_ref)
    assert r_fresh["du_mean"] < 0.01, r_fresh
