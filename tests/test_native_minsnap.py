"""Native C++ min-snap vs the pure-Python oracle, plus the gen_trajectory CLI
contract (the genTrajectory subprocess seam of the reference)."""

import os
import subprocess

import numpy as np
import pytest

from mpc_quad_ros_tpu.traj import random_waypoints, min_snap_trajectory
from mpc_quad_ros_tpu.traj.polynomial import PiecewisePolynomial4D
from mpc_quad_ros_tpu.traj.native_minsnap import native_available, native_min_snap_trajectory

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "mpc_quad_ros_tpu", "traj", "native")

pytestmark = pytest.mark.skipif(not native_available(), reason="native lib unavailable")


@pytest.fixture(scope="module", autouse=True)
def _build_cli_binary():
    """The gen_trajectory CLI binary is gitignored (only the sources are
    checked in); build it on demand so a fresh checkout runs green — the
    ctypes binding already does the same for libminsnap.so."""
    if not os.path.exists(os.path.join(NATIVE_DIR, "gen_trajectory")):
        try:
            subprocess.run(["make", "-C", NATIVE_DIR], check=True, timeout=120,
                           capture_output=True, text=True)
        except subprocess.CalledProcessError as e:
            # surface the compiler output — a bare CalledProcessError with
            # captured (swallowed) stderr is undiagnosable from a test report
            pytest.fail(f"native build failed (exit {e.returncode}):\n"
                        f"{e.stdout}\n{e.stderr}")


def test_native_matches_python_oracle():
    for seed in (0, 3, 11):
        wp = random_waypoints(hsize=10.0, num_waypoints=6, start_point=(0, 0, 3), seed=seed)
        py = min_snap_trajectory(wp, 8.0, 6.0, backend="python")
        nat = native_min_snap_trajectory(wp, 8.0, 6.0)
        np.testing.assert_allclose(nat.durations, py.durations, rtol=1e-8)
        t = np.linspace(0, py.duration * 0.999, 200)
        np.testing.assert_allclose(
            nat.eval_flat(t)["pos"], py.eval_flat(t)["pos"], atol=1e-6
        )


def test_native_is_default_backend():
    wp = random_waypoints(hsize=5.0, num_waypoints=4, seed=5)
    auto = min_snap_trajectory(wp, 6.0, 6.0, backend="auto")
    nat = native_min_snap_trajectory(wp, 6.0, 6.0)
    np.testing.assert_allclose(auto.durations, nat.durations, atol=0)


def test_gen_trajectory_cli(tmp_path):
    wp = random_waypoints(hsize=8.0, num_waypoints=5, seed=2)
    wp_csv = tmp_path / "waypoints.csv"
    np.savetxt(wp_csv, wp, fmt="%.6f", delimiter=",")
    out_csv = tmp_path / "poly.csv"

    exe = os.path.join(NATIVE_DIR, "gen_trajectory")
    res = subprocess.run(
        [exe, "-i", str(wp_csv), "-o", str(out_csv), "--v_max", "7", "--a_max", "5"],
        capture_output=True, timeout=60,
    )
    assert res.returncode == 0, res.stderr.decode()

    poly = PiecewisePolynomial4D.loadcsv(str(out_csv))
    assert len(poly.durations) == len(wp) - 1
    # interpolates waypoints (CSV %.6f truncation tolerance)
    knots = np.concatenate([[0.0], np.cumsum(poly.durations)])
    f = poly.eval_flat(np.clip(knots, 0, poly.duration - 1e-9))
    np.testing.assert_allclose(f["pos"], wp, atol=0.05)
    # respects limits
    t = np.arange(0, poly.duration, 0.01)
    ff = poly.eval_flat(t)
    assert np.linalg.norm(ff["vel"], axis=1).max() <= 7 * 1.1


def test_gen_trajectory_cli_errors(tmp_path):
    exe = os.path.join(NATIVE_DIR, "gen_trajectory")
    # missing args
    res = subprocess.run([exe], capture_output=True, timeout=10)
    assert res.returncode == 2
    assert b"usage" in res.stderr
    # single waypoint
    wp_csv = tmp_path / "one.csv"
    wp_csv.write_text("0,0,0\n")
    res = subprocess.run(
        [exe, "-i", str(wp_csv), "-o", str(tmp_path / "o.csv"), "--v_max", "5", "--a_max", "5"],
        capture_output=True, timeout=10,
    )
    assert res.returncode == 1
    assert b"waypoints" in res.stderr
