"""Tests for the auxiliary utils added for full reference-inventory parity:
metrics (`utils.py:240-261, 813-827`), rotation-matrix conversions
(`utils.py:367-376, 443-457`), dataset curation heuristics
(`utils.py:460-745`), the square trajectory (`utils.py:853-894`), the
trajectory plot CLI (`plot_trajectory.py`) and the scripts-farm dispatcher."""

import numpy as np
import pytest

from mpc_quad_ros_tpu.utils import (
    euclidean_dist,
    interpol_mse,
    quaternion_state_mse,
    rotation_matrix_to_euler,
    rotation_matrix_to_quat,
    separate_variables,
    euler_to_quaternion,
    q_to_rot_mat,
    q_dot_q,
    quaternion_inverse,
)


# ---------------------------------------------------------------- metrics --
def test_interpol_mse_same_grid():
    t = np.linspace(0, 1, 50)
    x1 = np.stack([t, t**2], axis=1)
    x2 = x1 + 0.5
    # constant offset of 0.5 in two dims -> norm sqrt(2)/2 every sample
    assert interpol_mse(t, x1, t, x2) == pytest.approx(np.sqrt(2) * 0.5)


def test_interpol_mse_different_grids():
    t1 = np.linspace(0, 1, 101)
    t2 = np.linspace(0, 1, 77)
    f = lambda t: np.stack([np.sin(2 * t), np.cos(3 * t)], axis=1)
    # same underlying curve sampled on different grids -> ~0 error
    assert interpol_mse(t1, f(t1), t2, f(t2)) < 1e-6
    # offset curve -> error equals the offset norm
    assert interpol_mse(t1, f(t1), t2, f(t2) + [0.3, 0.4]) == pytest.approx(0.5, abs=1e-5)


def test_quaternion_state_mse_zero_and_weighted():
    x = np.zeros(13)
    x[3] = 1.0
    assert quaternion_state_mse(x, x, np.ones(12)) == 0.0
    x2 = x.copy()
    x2[0] += 2.0     # 2 m x error
    assert quaternion_state_mse(x, x2, np.ones(12)) == pytest.approx(2.0)
    # mask zeroes out the position error entirely
    mask = np.ones(12)
    mask[0] = 0.0
    assert quaternion_state_mse(x, x2, mask) == 0.0


def test_quaternion_state_mse_attitude_term():
    x = np.zeros(13)
    x[3] = 1.0
    x2 = x.copy()
    q = np.asarray(euler_to_quaternion(0.2, -0.1, 0.3))
    x2[3:7] = q
    # error must equal |vec(q ⊗ q_ref^-1)| with q_ref = identity
    expect = np.linalg.norm(np.asarray(q_dot_q(q, quaternion_inverse(np.array([1.0, 0, 0, 0]))))[1:])
    assert quaternion_state_mse(x2, x, np.ones(12)) == pytest.approx(expect)


def test_euclidean_dist_and_separate_variables():
    assert euclidean_dist([0, 0, 0], [3, 4, 0]) == pytest.approx(5.0)
    assert euclidean_dist([0, 0, 0], [3, 4, 0], thresh=6.0) is True
    traj = np.arange(2 * 13, dtype=float).reshape(2, 13)
    p, q, v, r = separate_variables(traj)
    assert p.shape == (2, 3) and q.shape == (2, 4) and v.shape == (2, 3) and r.shape == (2, 3)
    np.testing.assert_array_equal(np.concatenate([p, q, v, r], axis=1), traj)


# ------------------------------------------------- rotation conversions --
@pytest.mark.parametrize("rpy", [(0.0, 0.0, 0.0), (0.3, -0.2, 1.1),
                                 (3.0, 0.1, -2.9), (-1.5, 1.4, 0.7)])
def test_rotation_matrix_quat_roundtrip(rpy):
    q = np.asarray(euler_to_quaternion(*rpy), dtype=float)
    R = np.asarray(q_to_rot_mat(q), dtype=float)
    q2 = np.asarray(rotation_matrix_to_quat(R), dtype=float)
    # quaternion double cover: q2 == ±q
    assert min(np.linalg.norm(q2 - q), np.linalg.norm(q2 + q)) < 1e-9
    rpy2 = np.asarray(rotation_matrix_to_euler(R), dtype=float)
    R2 = np.asarray(q_to_rot_mat(np.asarray(euler_to_quaternion(*rpy2))), dtype=float)
    np.testing.assert_allclose(R2, R, atol=1e-9)


def test_rotation_matrix_to_quat_batched():
    rng = np.random.default_rng(3)
    qs = rng.normal(size=(16, 4))
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    import jax

    Rs = jax.vmap(q_to_rot_mat)(qs)
    q2 = np.asarray(jax.vmap(rotation_matrix_to_quat)(Rs))
    err = np.minimum(np.linalg.norm(q2 - qs, axis=1), np.linalg.norm(q2 + qs, axis=1))
    assert err.max() < 1e-9


# ------------------------------------------------------ dataset curation --
def test_prune_dataset_caps_and_histogram():
    from mpc_quad_ros_tpu.models import prune_dataset

    rng = np.random.default_rng(0)
    x = rng.normal(size=(500, 3)) * 4
    y = rng.normal(size=(500, 3))
    y[0] = 100.0  # a gross outlier that must land alone in a sparse bin
    idx = prune_dataset(x, y, x_cap=10.0, bins=20, thresh=0.01, plot=False)
    assert 0 not in idx
    assert np.all(np.abs(x[idx]) <= 10.0)
    # tighter cap removes more
    idx2 = prune_dataset(x, y, x_cap=2.0, bins=20, thresh=0.0, plot=False)
    assert np.all(np.abs(x[idx2]) <= 2.0)
    assert len(idx2) < len(idx)


def test_distance_maximizing_points_1d_spread():
    from mpc_quad_ros_tpu.models import distance_maximizing_points

    pts = np.concatenate([np.linspace(-5, 5, 200), [50.0]])[:, None]
    idx = distance_maximizing_points(pts, n_train_points=8)
    assert idx.shape == (8,)
    assert np.all((0 <= idx) & (idx < len(pts)))
    sel = np.sort(pts[idx, 0])
    # selections must cover the data range, not clump
    assert sel.max() > 5.0  # the outlier bin is represented
    assert np.ptp(sel[:-1]) > 5.0


def test_distance_maximizing_points_2d_count_and_validity():
    from mpc_quad_ros_tpu.models import distance_maximizing_points

    rng = np.random.default_rng(1)
    pts = np.concatenate([rng.normal(size=(100, 2)), rng.normal(size=(100, 2)) + 8])
    idx = distance_maximizing_points(pts, n_train_points=10, rng=rng)
    assert idx.shape == (10,)
    assert np.all((0 <= idx) & (idx < 200))
    # both clusters represented
    assert (pts[idx, 0] < 4).any() and (pts[idx, 0] > 4).any()


def test_sample_random_points_excludes_used():
    from mpc_quad_ros_tpu.models import sample_random_points

    rng = np.random.default_rng(2)
    pts = rng.normal(size=(200, 2))
    used = np.arange(10)
    out = sample_random_points(pts, used, 15, rng=rng)
    assert len(out) == 25
    assert len(np.unique(out)) == 25  # no replacement, no reuse of used_idx


# -------------------------------------------------------- square + plot --
def test_square_trajectory_geometry():
    from mpc_quad_ros_tpu.traj import square_trajectory

    x = square_trajectory(n=60, dt=0.1, v=3.0)
    assert x.shape == (60, 13)
    np.testing.assert_array_equal(x[:, 3], 1.0)           # identity quat
    np.testing.assert_allclose(x[-1, :3], [0, 0, 0], atol=1e-9)  # closes
    assert x[:, 0].max() == pytest.approx(2.7)            # v * (n/6-1) * dt


def test_plot_trajectory_cli(tmp_path):
    from mpc_quad_ros_tpu.traj import min_snap_trajectory
    from mpc_quad_ros_tpu.traj.plot import main as plot_main

    wp = np.array([[0, 0, 0], [2, 1, 1], [4, 0, 2]], dtype=float)
    poly = min_snap_trajectory(wp, v_max=4.0, a_max=4.0)
    csv = tmp_path / "poly.csv"
    poly.savecsv(str(csv))
    out = tmp_path / "traj.png"
    assert plot_main([str(csv), "-o", str(out)]) == 0
    assert out.exists()
    # stretchtime slows the trajectory: max speed must drop
    from mpc_quad_ros_tpu.traj.plot import trajectory_stats
    from mpc_quad_ros_tpu.traj.polynomial import PiecewisePolynomial4D

    p = PiecewisePolynomial4D.loadcsv(str(csv))
    v0 = trajectory_stats(p)["velocity"].max()
    v1 = trajectory_stats(p.stretchtime(2.0))["velocity"].max()
    assert v1 == pytest.approx(v0 / 2.0, rel=1e-6)


# ------------------------------------------------------------- scripts --
def test_scripts_list_and_viz(tmp_path, monkeypatch):
    from mpc_quad_ros_tpu.scripts import list_scripts, main as scripts_main

    names = list_scripts()
    assert "run_traj0_gp2" in names and "viz_cov" in names
    assert scripts_main(["--list"]) == 0
    assert scripts_main(["no_such_script"]) == 2

    # viz_plot over an explicit synthetic log
    from mpc_quad_ros_tpu.io.logger import save_dict

    T = 30
    log = {
        "x_odom": np.random.default_rng(0).normal(size=(T, 13)),
        "x_ref": np.zeros((T, 13)),
        "w_odom": np.full((T, 4), 0.3),
        "t_odom": np.arange(T) * 0.1,
    }
    pkl = tmp_path / "log.pkl"
    save_dict(log, str(pkl))
    out = tmp_path / "report.png"
    rc = scripts_main(["viz_plot_python_traj0_gp0", "--data", str(pkl),
                       "--output", str(out)])
    assert rc == 0 and out.exists()
    # missing log -> graceful error
    assert scripts_main(["viz_plot_python_traj9_gp0", "--v_max", "99"]) == 2
