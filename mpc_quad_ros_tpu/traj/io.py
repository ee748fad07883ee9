"""Sampled-trajectory CSV IO and 13-state expansion.

CSV format parity with the reference (`TrajectoryGenerator.py:72-74, 208-244`):
columns `t,x,y,z,vx,vy,vz,ax,ay,az` with `%.6f` formatting and a `#`-prefixed
header, so files are interchangeable with the reference pipeline.
"""

from __future__ import annotations

import numpy as np

HEADER = "t,x,y,z,vx,vy,vz,ax,ay,az"


def save_sampled_csv(path: str, t, pos, vel, acc) -> None:
    data = np.concatenate(
        [np.asarray(t).reshape(-1, 1), np.asarray(pos), np.asarray(vel), np.asarray(acc)], axis=1
    )
    np.savetxt(path, data, fmt="%.6f", delimiter=",", header=HEADER)


def load_sampled_csv(path: str):
    """Load a sampled CSV back into (x_traj (T,13), t (T,)) — identity
    quaternion and zero body rates, exactly like
    `TrajectoryGenerator.load_trajectory` (`TrajectoryGenerator.py:223-244`)."""
    data = np.genfromtxt(path, delimiter=",")
    t = data[:, 0]
    return states_from_flat_outputs(data[:, 1:4], data[:, 4:7]), t


def states_from_flat_outputs(pos, vel) -> np.ndarray:
    """(T,3) pos + (T,3) vel -> (T,13) reference states with q = [1,0,0,0],
    body rates = 0 (the reference never commands attitude through the
    reference trajectory — the MPC's attitude weights pull toward identity)."""
    pos = np.asarray(pos)
    vel = np.asarray(vel)
    T = pos.shape[0]
    q = np.tile(np.array([1.0, 0.0, 0.0, 0.0]), (T, 1))
    r = np.zeros((T, 3))
    return np.concatenate([pos, q, vel, r], axis=1)
