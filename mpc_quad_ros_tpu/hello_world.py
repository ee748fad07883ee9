"""Takeoff - hover - land smoke demo.

Capability parity with the reference's Crazyswarm hello-world
(`/root/reference/src/hello_world.py:14-23`: takeoff to 1 m, hover, land),
flown here by the full MPC stack through the node seam instead of the
Crazyswarm position controller: a ControllerNode tracks a min-snap "line"
trajectory up to hover height, holds, then one back down.  Runs on the
crazyflie parameter preset.

    python -m mpc_quad_ros_tpu.hello_world [--height 1.0] [--hover 2.5]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def hello_world(height: float = 1.0, hover_s: float = 2.5, land_z: float = 0.04,
                quad: str = "crazyflie", verbose: bool = True) -> dict:
    from .models.params import crazyflie_params, hummingbird_params
    from .node import ControllerNode, SimLoop, TrajectoryServer

    p = {"crazyflie": crazyflie_params, "hummingbird": hummingbird_params}[quad]()
    x0 = np.zeros(13)
    x0[3] = 1.0

    results = {}
    for phase, (start, end) in {
        "takeoff": (x0[:3], np.array([0.0, 0.0, height])),
        "land": (np.array([0.0, 0.0, height]), np.array([0.0, 0.0, land_z])),
    }.items():
        node = ControllerNode(
            p, TrajectoryServer(), v_max=0.5, a_max=0.5,
            trajectory_type="line", n_nodes=10,
        )
        node.need_trajectory_to_hover = False
        node.request_trajectory(x0, "line", start=start, end=end)
        loop = SimLoop(node, p, x0)
        x_final = loop.run(max_ticks=int(30.0 / node.odometry_dt))
        err = float(np.linalg.norm(x_final[:3] - end))
        results[phase] = {"x_final": x_final, "error_m": err}
        if verbose:
            print(f"{phase}: reached z={x_final[2]:.3f} m (target {end[2]:.2f}), "
                  f"pos error {err * 1e3:.0f} mm")
        if phase == "takeoff" and verbose:
            print(f"hover {hover_s}s @ {height} m")
        x0 = x_final
    return results


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--height", type=float, default=1.0)
    parser.add_argument("--hover", type=float, default=2.5)
    parser.add_argument("--quad", type=str, default="crazyflie",
                        choices=("crazyflie", "hummingbird"))
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    res = hello_world(args.height, args.hover, quad=args.quad)
    ok = all(r["error_m"] < 0.25 for r in res.values())
    print("hello_world:", "OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
