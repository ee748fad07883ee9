"""Trajectory generation tests.

Circle samplers are checked against a direct NumPy transcription of the
documented recurrences (phase accumulation loop); min-snap against its
mathematical properties (interpolation, continuity, rest boundaries, v/a
limits); polynomial eval against numpy.polyval."""

import numpy as np
import jax.numpy as jnp
import pytest

from mpc_quad_ros_tpu.traj import (
    circle_trajectory_accelerating,
    circle_trajectory_constant,
    circle_trajectory_acc_dec,
    min_snap_trajectory,
    random_waypoints,
    PiecewisePolynomial4D,
    sample_polynomial_trajectory,
    save_sampled_csv,
    load_sampled_csv,
    states_from_flat_outputs,
)


def np_circle_accel(radius, v_max, t_max, dt):
    """Loop-form oracle of the accelerating circle recurrence."""
    ts = np.arange(0, t_max, dt)
    n = len(ts)
    w_max = v_max / radius
    p = np.empty((n, 3))
    v = np.empty((n, 3))
    phi = 0.0
    ws = np.empty(n)
    for i in range(n):
        k = ((i + 1) / float(n) * 2) - 1
        dw = (np.sin((k * 2 * np.pi + np.pi * 3 / 2) * 0.5) + 1) / 2
        w = dw * w_max
        ws[i] = w
        phi = phi + w * dt
        p[i] = [radius * np.cos(phi) - radius, radius * np.sin(phi), 0]
        v[i] = [-radius * w * np.sin(phi), radius * w * np.cos(phi), 0]
    return ts, p, v, ws


def test_accelerating_circle_matches_loop_oracle():
    ts, p, v, a = circle_trajectory_accelerating(10.0, 8.0, t_max=30.0, dt=0.1)
    ts_r, p_r, v_r, w_r = np_circle_accel(10.0, 8.0, 30.0, 0.1)
    np.testing.assert_allclose(np.asarray(ts), ts_r, atol=1e-12)
    np.testing.assert_allclose(np.asarray(p), p_r, atol=1e-9)
    np.testing.assert_allclose(np.asarray(v), v_r, atol=1e-9)
    # peak speed approaches v_max
    speeds = np.linalg.norm(np.asarray(v), axis=1)
    assert 0.9 * 8.0 < speeds.max() <= 8.0 + 1e-6


def test_constant_circle_speed():
    ts, p, v, a = circle_trajectory_constant(5.0, 4.0, dt=0.01)
    speeds = np.linalg.norm(np.asarray(v), axis=1)
    np.testing.assert_allclose(speeds, 4.0, atol=1e-9)
    # one full loop: end near start
    assert np.linalg.norm(np.asarray(p[-1]) - np.asarray(p[0])) < 0.2


def test_acc_dec_circle_profile():
    ts, p, v, a = circle_trajectory_acc_dec(5.0, 4.0, dt=0.005)
    speeds = np.linalg.norm(np.asarray(v), axis=1)
    imax = speeds.argmax()
    # peak speed near the middle, close to v_max
    assert abs(imax - len(speeds) / 2) < len(speeds) * 0.05
    assert speeds.max() <= 4.0 * 1.01


def test_minsnap_interpolates_and_respects_limits():
    wp = random_waypoints(hsize=8.0, num_waypoints=6, start_point=(0, 0, 3), seed=42)
    v_max, a_max = 7.0, 6.0
    poly = min_snap_trajectory(wp, v_max, a_max)

    # waypoint interpolation at knot times
    knots = np.concatenate([[0.0], np.cumsum(poly.durations)])
    f = poly.eval_flat(np.clip(knots, 0, poly.duration - 1e-9))
    np.testing.assert_allclose(f["pos"], wp, atol=1e-5)

    # rest boundaries
    f0 = poly.eval_flat(np.array([0.0]))
    fT = poly.eval_flat(np.array([poly.duration - 1e-9]))
    np.testing.assert_allclose(f0["vel"], 0, atol=1e-6)
    np.testing.assert_allclose(f0["acc"], 0, atol=1e-4)
    np.testing.assert_allclose(fT["vel"], 0, atol=1e-3)

    # velocity / acceleration limits (5% slack for the sampling grid)
    t, pos, vel, acc = sample_polynomial_trajectory(poly, 0.01)
    assert np.linalg.norm(vel, axis=1).max() <= v_max * 1.05
    assert np.linalg.norm(acc, axis=1).max() <= a_max * 1.05
    # and the trajectory actually uses the speed budget
    assert np.linalg.norm(vel, axis=1).max() >= v_max * 0.75


def test_minsnap_continuity_at_knots():
    wp = random_waypoints(hsize=5.0, num_waypoints=4, seed=7)
    poly = min_snap_trajectory(wp, 5.0, 5.0)
    knots = np.cumsum(poly.durations)[:-1]
    eps = 1e-6
    for t in knots:
        before = poly.eval_flat(np.array([t - eps]))
        after = poly.eval_flat(np.array([t + eps]))
        np.testing.assert_allclose(before["pos"], after["pos"], atol=1e-4)
        np.testing.assert_allclose(before["vel"], after["vel"], atol=1e-3)
        np.testing.assert_allclose(before["acc"], after["acc"], atol=1e-2)


def test_polynomial_eval_matches_numpy_polyval():
    rng = np.random.default_rng(0)
    coeffs = rng.standard_normal((2, 4, 8))
    durations = np.array([1.3, 0.9])
    poly = PiecewisePolynomial4D(durations, coeffs)
    for t in [0.0, 0.5, 1.2, 1.31, 2.1]:
        f = poly.eval_flat(np.array([t]))
        j = 0 if t < 1.3 else 1
        tau = t - (0.0 if j == 0 else 1.3)
        for ax in range(3):
            expected = np.polyval(coeffs[j, ax][::-1], tau)
            np.testing.assert_allclose(f["pos"][0, ax], expected, atol=1e-10)


def test_flat_output_body_rates_hover():
    """A straight-line constant-velocity segment needs zero body rates."""
    coeffs = np.zeros((1, 4, 8))
    coeffs[0, 0, 1] = 2.0  # x = 2t
    coeffs[0, 2, 0] = 3.0  # z = 3
    poly = PiecewisePolynomial4D(np.array([5.0]), coeffs)
    f = poly.eval(np.array([1.0, 2.0]))
    np.testing.assert_allclose(f["omega"], 0.0, atol=1e-12)
    np.testing.assert_allclose(f["roll"], 0.0, atol=1e-12)
    np.testing.assert_allclose(f["pitch"], 0.0, atol=1e-12)


def test_csv_roundtrip(tmp_path):
    ts, p, v, a = circle_trajectory_accelerating(10.0, 5.0, t_max=3.0, dt=0.1)
    path = str(tmp_path / "traj.csv")
    save_sampled_csv(path, ts, p, v, a)
    x_traj, t = load_sampled_csv(path)
    assert x_traj.shape == (len(np.asarray(ts)), 13)
    np.testing.assert_allclose(x_traj[:, :3], np.asarray(p), atol=1e-5)
    np.testing.assert_allclose(x_traj[:, 3:7], [[1, 0, 0, 0]] * len(t), atol=0)
    np.testing.assert_allclose(x_traj[:, 7:10], np.asarray(v), atol=1e-5)


def test_polycsv_roundtrip(tmp_path):
    wp = random_waypoints(hsize=5.0, num_waypoints=3, seed=1)
    poly = min_snap_trajectory(wp, 5.0, 5.0)
    path = str(tmp_path / "poly.csv")
    poly.savecsv(path)
    poly2 = PiecewisePolynomial4D.loadcsv(path)
    t = np.linspace(0, poly.duration * 0.999, 50)
    # %.6f CSV truncation (reference format) costs ~1e-6 * t^7 per coeff
    np.testing.assert_allclose(poly.eval_flat(t)["pos"], poly2.eval_flat(t)["pos"], atol=0.05)


def test_reference_polynomial_csv_loads():
    """The checked-in genTrajectory output must load and evaluate."""
    import pathlib

    p = pathlib.Path("/root/reference/src/trajectory_generation/polynomial_trajectory/polynomial_representation.csv")
    if not p.exists():
        pytest.skip("reference polynomial csv not present")
    poly = PiecewisePolynomial4D.loadcsv(str(p))
    assert poly.duration > 0
    f = poly.eval(np.linspace(0, poly.duration * 0.99, 20))
    assert np.isfinite(f["pos"]).all() and np.isfinite(f["omega"]).all()
