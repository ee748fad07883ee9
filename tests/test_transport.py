"""Socket transport for the node seam (TCPROS stand-in): pub/sub fan-out,
RPC round trip, and a full closed loop with the trajectory service and the
control publisher running over real sockets."""

import time

import numpy as np
import jax.numpy as jnp

from mpc_quad_ros_tpu.io.transport import (
    TcpPublisher,
    TcpRpcClient,
    TcpRpcServer,
    TcpSubscriber,
)
from mpc_quad_ros_tpu.models.params import hummingbird_params
from mpc_quad_ros_tpu.node import (
    ControlCommand,
    ControllerNode,
    SimLoop,
    TrajectoryRequest,
    TrajectoryServer,
)


def _wait_for(pred, timeout=5.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(0.01)
    return False


def test_pubsub_roundtrip_dataclasses():
    pub = TcpPublisher()
    got_a, got_b = [], []
    sub_a = TcpSubscriber(pub.host, pub.port, got_a.append)
    sub_b = TcpSubscriber(pub.host, pub.port, got_b.append)
    assert _wait_for(lambda: len(pub._clients) == 2)

    cmd = ControlCommand(bodyrates=np.array([0.1, 0.2, 0.3]),
                         collective_thrust=9.81,
                         motors=np.array([0.1, 0.2, 0.3, 0.4]), stamp=1.5)
    for _ in range(3):
        pub.publish(cmd)
    assert _wait_for(lambda: len(got_a) == 3 and len(got_b) == 3)
    np.testing.assert_array_equal(got_a[0].motors, cmd.motors)
    assert got_b[-1].stamp == 1.5

    # a dead subscriber must not break publishing
    sub_a.close()
    time.sleep(0.05)
    pub.publish(cmd)
    assert _wait_for(lambda: len(got_b) == 4)
    pub.close()
    sub_b.close()


def test_rpc_trajectory_service_roundtrip():
    server = TcpRpcServer(TrajectoryServer(sample_dt=0.01).handle)
    client = TcpRpcClient(server.host, server.port)
    traj = client.call(TrajectoryRequest("line", np.array([0, 0, 0.0]),
                                         np.array([0, 0, 2.0]), v_max=2, a_max=2))
    assert traj.x.shape[1] == 13
    np.testing.assert_allclose(traj.x[-1, :3], [0, 0, 2.0], atol=0.05)

    # remote exception propagates as a local error
    import pytest

    with pytest.raises(RuntimeError, match="unknown trajectory"):
        client.call(TrajectoryRequest("bogus"))
    client.close()
    server.close()


def test_closed_loop_over_sockets():
    """The full ROS-topology twin: the trajectory generator behind an RPC
    socket, control commands streamed out through a pub/sub socket, and the
    controller + plant closing the loop — `mpc_controller_node` <->
    `trajectory_generator_node` over real transports."""
    DT = jnp.float64
    p = hummingbird_params(dtype=DT)
    base = TrajectoryServer(sample_dt=0.01)

    class ShortLine(TrajectoryServer):
        def handle(self, req):
            return base.handle(TrajectoryRequest(
                "line", np.array([0, 0, 3.0]), np.array([1.5, 0, 3.0]),
                v_max=2.0, a_max=2.0))

    rpc = TcpRpcServer(ShortLine().handle)
    traj_client = TcpRpcClient(rpc.host, rpc.port)

    pub = TcpPublisher()
    received = []
    sub = TcpSubscriber(pub.host, pub.port, received.append)
    assert _wait_for(lambda: len(pub._clients) == 1)

    node = ControllerNode(p, traj_client, dtype=DT, v_max=2.0, a_max=2.0,
                          publish_control=pub)
    x_hover = np.array([0, 0, 3, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0], dtype=float)
    x_final = SimLoop(node, p, x_hover).run(max_ticks=2000)

    assert node.finished
    np.testing.assert_allclose(x_final[:3], [1.5, 0, 3.0], atol=0.5)
    assert _wait_for(lambda: len(received) > 100)
    assert isinstance(received[0], ControlCommand)

    pub.close()
    sub.close()
    traj_client.close()
    rpc.close()
