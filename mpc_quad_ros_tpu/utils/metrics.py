"""Trajectory-comparison metrics.

Capability parity with the metric helpers in the reference's
`/root/reference/src/utils/utils.py`: `interpol_mse` (utils.py:240-261),
`quaternion_state_mse` (utils.py:813-827), `euclidean_dist` (utils.py:264-283)
and `separate_variables` (utils.py:836-850).  These are post-hoc analysis
helpers, so they are plain numpy (host side) — the compute path never calls
them.
"""

from __future__ import annotations

import numpy as np


def interpol_mse(t_1, x_1, t_2, x_2, n_interp_samples: int = 1000) -> float:
    """Mean Euclidean error between two trajectories sampled on (possibly)
    different time grids (`utils.py:240-261`).

    When the grids coincide this is the plain mean row-norm of the
    difference; otherwise both are cubic-interpolated onto a common uniform
    grid spanning the overlap.
    """
    t_1, x_1 = np.asarray(t_1), np.asarray(x_1)
    t_2, x_2 = np.asarray(t_2), np.asarray(x_2)
    if t_1.shape == t_2.shape and np.all(t_1 == t_2):
        return float(np.mean(np.linalg.norm(x_1 - x_2, axis=1)))

    assert x_1.shape[1] == x_2.shape[1]
    t_min = max(t_1[0], t_2[0])
    t_max = min(t_1[-1], t_2[-1])
    t_interp = np.linspace(t_min, t_max, n_interp_samples)

    from scipy.interpolate import interp1d

    x1_s = np.stack([interp1d(t_1, x_1[:, d], kind="cubic")(t_interp)
                     for d in range(x_1.shape[1])], axis=1)
    x2_s = np.stack([interp1d(t_2, x_2[:, d], kind="cubic")(t_interp)
                     for d in range(x_2.shape[1])], axis=1)
    return float(np.mean(np.linalg.norm(x1_s - x2_s, axis=1)))


def quaternion_state_mse(x, x_ref, mask) -> float:
    """Weighted error norm of a 13-state vs a reference state, with the
    attitude error measured as the vector part of q ⊗ q_ref⁻¹
    (`utils.py:813-827`).  `mask` is 12-dim: (p_xyz, q_xyz, v_xyz, r_xyz).
    """
    x, x_ref = np.asarray(x, dtype=float), np.asarray(x_ref, dtype=float)
    q, qr = x[3:7], x_ref[3:7]
    # q ⊗ qr⁻¹, vector part (w, x, y, z convention)
    qr_inv = np.array([qr[0], -qr[1], -qr[2], -qr[3]])
    w1, v1 = q[0], q[1:4]
    w2, v2 = qr_inv[0], qr_inv[1:4]
    q_err_vec = w1 * v2 + w2 * v1 + np.cross(v1, v2)
    e = np.concatenate((x[:3] - x_ref[:3], q_err_vec, x[7:10] - x_ref[7:10],
                        x[10:] - x_ref[10:]))
    return float(np.sqrt(e @ (np.asarray(mask, dtype=float) * e)))


def euclidean_dist(x, y, thresh: float | None = None):
    """Pairwise Euclidean distance between two points; if `thresh` is given,
    returns whether the distance is below it (`utils.py:264-283`)."""
    d = float(np.linalg.norm(np.asarray(x, dtype=float) - np.asarray(y, dtype=float)))
    if thresh is None:
        return d
    return d < thresh


def separate_variables(traj):
    """Split an (N,13) state trajectory into [pos (N,3), quat (N,4),
    vel (N,3), rate (N,3)] (`utils.py:836-850`)."""
    traj = np.asarray(traj)
    return [traj[:, :3], traj[:, 3:7], traj[:, 7:10], traj[:, 10:]]
