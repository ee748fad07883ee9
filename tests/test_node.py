"""Controller-node state machine tests: bootstrap line-to-hover, trajectory
request/receive, closed-loop flight at odometry rate, finish detection,
training-run counting — the `mpc_controller_node` behaviors (SURVEY §3.2)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mpc_quad_ros_tpu.models.params import hummingbird_params
from mpc_quad_ros_tpu.node import (
    ControllerNode,
    MotorPower,
    SimLoop,
    Trajectory,
    TrajectoryRequest,
    TrajectoryServer,
)

DT = jnp.float64


def make_node(**kw):
    p = hummingbird_params(dtype=DT)
    server = TrajectoryServer(sample_dt=0.01)
    kw.setdefault("v_max", 4.0)
    kw.setdefault("a_max", 4.0)
    node = ControllerNode(p, server, dtype=DT, **kw)
    return p, node


def test_trajectory_server_types():
    server = TrajectoryServer()
    line = server.handle(TrajectoryRequest("line", np.array([0, 0, 0.0]),
                                           np.array([0, 0, 3.0]), v_max=2, a_max=2))
    assert line.x.shape[1] == 13
    np.testing.assert_allclose(line.x[0, :3], [0, 0, 0], atol=0.05)
    np.testing.assert_allclose(line.x[-1, :3], [0, 0, 3], atol=0.05)

    circ = server.handle(TrajectoryRequest("circle", np.array([0, 0, 3.0]), v_max=5))
    assert circ.x.shape[0] == 3000  # 30 s at 100 Hz

    rnd = server.handle(TrajectoryRequest("random", np.array([0, 0, 3.0]), v_max=5, a_max=5))
    assert np.isfinite(rnd.x).all()

    with pytest.raises(ValueError):
        server.handle(TrajectoryRequest("bogus"))


def test_bootstrap_line_to_hover():
    """Starting away from hover triggers the line trajectory first and the
    line run is not logged or counted (`doing_a_line`)."""
    p, node = make_node(trajectory_type="line")
    x_ground = np.array([0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0], dtype=float)
    cmd = node.pose_received_cb(x_ground, 0.0)
    assert node.doing_a_line
    assert node.trajectory_ready
    assert cmd is not None and cmd.motors.shape == (4,)
    assert node.logger.dictionary == {}  # line flight not logged


def test_starts_directly_when_at_hover():
    p, node = make_node(trajectory_type="circle")
    x_hover = np.array([0, 0, 3, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0], dtype=float)
    node.pose_received_cb(x_hover, 0.0)
    assert not node.doing_a_line
    assert node.trajectory_ready
    assert len(node.x_trajectory) == 3000


def test_ignores_new_trajectory_while_active():
    p, node = make_node(trajectory_type="circle")
    x_hover = np.array([0, 0, 3, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0], dtype=float)
    node.pose_received_cb(x_hover, 0.0)
    first = node.x_trajectory
    node.trajectory_received_cb(Trajectory(np.zeros((5, 13)), np.arange(5.0)))
    assert node.x_trajectory is first  # unchanged (`:517-519`)


def test_closed_loop_line_flight_finishes_and_counts():
    """Fly a short line via SimLoop: must track, finish, count the run, and
    log reference keys."""
    p, node = make_node(trajectory_type="line", v_max=2.0, a_max=2.0, use_gp=2,
                        n_basis_vectors=8)
    # start AT hover so the main trajectory begins immediately; then retarget
    # by monkey-wiring the server to produce a short line away from hover
    server = node.server

    class ShortLineServer(TrajectoryServer):
        def handle(self, req):
            return server.handle(TrajectoryRequest(
                "line", np.array([0, 0, 3.0]), np.array([2.0, 0, 3.0]),
                v_max=2.0, a_max=2.0))

    node.server = ShortLineServer()
    x_hover = np.array([0, 0, 3, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0], dtype=float)
    loop = SimLoop(node, p, x_hover)
    x_final = loop.run(max_ticks=2000)

    assert node.finished
    assert node.number_of_trajectories_finished == 1
    np.testing.assert_allclose(x_final[:3], [2.0, 0, 3.0], atol=0.5)
    d = node.logger.dictionary
    for key in ("x_odom", "x_pred_odom", "x_ref", "w_odom", "t_cpu",
                "cost_solution", "rgp_mu_g_t", "v_body", "a_drag"):
        assert key in d, key
    assert len(d["x_odom"]) > 100


def test_training_counts_multiple_runs():
    p, node = make_node(trajectory_type="line", v_max=2.0, a_max=2.0,
                        training=True, training_trajectories_count=2)
    server = node.server

    class ShortLineServer(TrajectoryServer):
        def __init__(self):
            self.n = 0

        def handle(self, req):
            # alternate 2m out and back so each run ends where the next starts
            self.n += 1
            a, b = ([0, 0, 3.0], [1.0, 0, 3.0]) if self.n % 2 else ([1.0, 0, 3.0], [0, 0, 3.0])
            return server.handle(TrajectoryRequest("line", np.array(a), np.array(b),
                                                   v_max=2.0, a_max=2.0))

    node.server = ShortLineServer()
    x_hover = np.array([0, 0, 3, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0], dtype=float)
    SimLoop(node, p, x_hover).run(max_ticks=3000)
    assert node.number_of_trajectories_finished == 2
    assert node.finished


def test_cmdposition_mode_flies_crazyflie_line():
    """cf_execute parity (`/root/reference/src/cf_execute.py:250-254`): the
    controller publishes the MPC's predicted next position + yaw as a
    PositionCommand and the vehicle is actuated by its own (stand-in) onboard
    position controller — flying the crazyflie preset through a short line."""
    from mpc_quad_ros_tpu.models.params import crazyflie_params
    from mpc_quad_ros_tpu.node import PositionCommand

    p = crazyflie_params(dtype=DT)
    server = TrajectoryServer(sample_dt=0.01)

    class ShortLineServer(TrajectoryServer):
        def handle(self, req):
            return server.handle(TrajectoryRequest(
                "line", np.array([0, 0, 3.0]), np.array([1.0, 0, 3.0]),
                v_max=1.0, a_max=1.0))

    published = []
    node = ControllerNode(p, ShortLineServer(), dtype=DT, v_max=1.0, a_max=1.0,
                          actuation="position",
                          publish_control=published.append)
    x_hover = np.array([0, 0, 3, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0], dtype=float)
    loop = SimLoop(node, p, x_hover)          # kinematic tracking (cf-sim double)
    x_final = loop.run(max_ticks=2000)

    assert node.finished
    assert all(isinstance(c, PositionCommand) for c in published)
    # the published setpoint is the MPC's one-step-ahead position
    assert published[0].pos.shape == (3,)
    # the vehicle genuinely flew the line (not just ended inside the finish ball)
    assert x_final[0] > 0.7, x_final
    np.testing.assert_allclose(x_final[:3], [1.0, 0, 3.0], atol=0.3)


def test_cmdposition_dynamic_tracking_climbs():
    """The dynamic onboard-controller stand-in option: a pure climb (no tilt
    bandwidth in the loop) tracks the MPC's predicted positions against the
    full rigid-body plant."""
    from mpc_quad_ros_tpu.models.params import crazyflie_params
    from mpc_quad_ros_tpu.node import PositionCommand

    p = crazyflie_params(dtype=DT)
    server = TrajectoryServer(sample_dt=0.01)

    class ClimbServer(TrajectoryServer):
        def handle(self, req):
            return server.handle(TrajectoryRequest(
                "line", np.array([0, 0, 3.0]), np.array([0, 0, 3.8]),
                v_max=1.0, a_max=1.0))

    node = ControllerNode(p, ClimbServer(), dtype=DT, v_max=1.0, a_max=1.0,
                          actuation="position")
    x_hover = np.array([0, 0, 3, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0], dtype=float)
    loop = SimLoop(node, p, x_hover, position_tracking="dynamic")
    x_final = loop.run(max_ticks=2000)
    assert x_final[2] > 3.5, x_final


def test_position_controller_motors_hovers():
    """The onboard-controller stand-in holds a hover setpoint: thrust ~ the
    hover activation, torques ~ 0."""
    from mpc_quad_ros_tpu.models.params import crazyflie_params
    from mpc_quad_ros_tpu.node import position_controller_motors

    p = crazyflie_params(dtype=DT)
    x = jnp.asarray([0, 0, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0], dtype=DT)
    u = np.asarray(position_controller_motors(
        x, jnp.asarray([0.0, 0.0, 1.0], DT), jnp.asarray(0.0, DT), p))
    np.testing.assert_allclose(u, float(p.hover_input), atol=1e-6)


def test_live_viz_hook_streams_frames(tmp_path):
    """The rviz-equivalent live hook (`mpc_controller_node.py:639-734`):
    every control tick delivers a LiveFrame with the reference chunk, the
    MPC-optimal horizon and the target marker; LiveFlightView renders them
    to an image and an animation."""
    from mpc_quad_ros_tpu.io.viz import LiveFlightView
    from mpc_quad_ros_tpu.node import LiveFrame

    view = LiveFlightView(stride=20)
    p, node = make_node(trajectory_type="line", v_max=2.0, a_max=2.0,
                        live_callback=view)
    server = node.server

    class ShortLineServer(TrajectoryServer):
        def handle(self, req):
            return server.handle(TrajectoryRequest(
                "line", np.array([0, 0, 3.0]), np.array([2.0, 0, 3.0]),
                v_max=2.0, a_max=2.0))

    node.server = ShortLineServer()
    x_hover = np.array([0, 0, 3, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0], dtype=float)
    SimLoop(node, p, x_hover).run(max_ticks=2000)

    assert node.finished and len(view.frames) > 5
    f = view.frames[-1]
    assert isinstance(f, LiveFrame)
    assert f.x_ref_chunk.shape == (node.cfg.n_nodes, 13)
    assert f.x_horizon.shape == (node.cfg.n_nodes + 1, 13)
    assert f.target.shape == (3,)
    png = view.save_frame(str(tmp_path / "live.png"))
    assert (tmp_path / "live.png").exists()
    view.frames = view.frames[:4]     # keep the animation cheap
    view.to_animation(str(tmp_path / "live.gif"), fps=5)
    assert (tmp_path / "live.gif").stat().st_size > 0


def test_simple_z_controller_hygiene():
    """cf test-node parity: stale and undersampled odometry is dropped; the
    P-law pushes toward the target altitude."""
    from mpc_quad_ros_tpu.node import SimpleZController

    ctrl = SimpleZController(target_z=1.0, kp=0.4, hover=0.3)
    x_low = np.zeros(13); x_low[2] = 0.5
    # normal message accepted
    mp = ctrl.odometry_cb(x_low, timestamp=1.0)
    assert mp is not None and mp.m[0] > 0.3  # below target -> above hover
    # undersampled (too soon) dropped
    assert ctrl.odometry_cb(x_low, timestamp=1.005) is None
    # stale (old stamp vs now) dropped
    assert ctrl.odometry_cb(x_low, timestamp=1.05, now=2.0) is None
    # above target -> below hover
    x_high = np.zeros(13); x_high[2] = 2.0
    mp2 = ctrl.odometry_cb(x_high, timestamp=1.2)
    assert mp2.m[0] < 0.3
