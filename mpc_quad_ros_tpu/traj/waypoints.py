"""Waypoint generation for min-snap trajectories.

Capability parity with `TrajectoryGenerator.generate_random_waypoints`
(`/root/reference/src/trajectory_generation/TrajectoryGenerator.py:133-163`):
uniform random waypoints inside a cube whose centre is lifted to
1.5*hsize_z so trajectories stay above the ground plane.  (The reference's
`np.random.seed = 0` line silently does nothing — attribute assignment, not a
call — so its runs were unseeded; here seeding is explicit and real.)
"""

from __future__ import annotations

import numpy as np


def random_waypoints(hsize=10.0, num_waypoints: int = 10, start_point=(0.0, 0.0, 0.0),
                     hover_first: bool = False, seed: int | None = 0) -> np.ndarray:
    """(num_waypoints+1[, +1], 3) waypoints starting at start_point."""
    if not isinstance(hsize, (list, tuple, np.ndarray)):
        hsize = [hsize, hsize, hsize]
    hsize = np.asarray(hsize, dtype=float)
    center = np.array([0.0, 0.0, 1.5 * hsize[2]])

    rng = np.random.default_rng(seed)
    pts = [np.asarray(start_point, dtype=float)]
    if hover_first:
        pts.append(np.array([0.0, 0.0, hsize[2]]))
    for _ in range(num_waypoints):
        pts.append(rng.uniform(-hsize, hsize) + center)
    return np.stack(pts)


def line_waypoints(start, end) -> np.ndarray:
    """Two-point line — the controller's hover-bootstrap trajectory
    (`mpc_controller_node.py:249-267`, trajectory type 'line')."""
    return np.stack([np.asarray(start, dtype=float), np.asarray(end, dtype=float)])
