"""Analytic circle reference trajectories.

Capability parity with the reference's three circle samplers
(`/root/reference/src/trajectory_generation/TrajectoryGenerator.py:41-130`):
accelerating (sine angular-velocity profile), constant speed, and
accelerate-then-decelerate.  The reference accumulates the phase in a Python
loop (`phi = phi + w[i]*dt`); here the same recurrence is a `cumsum`, so the
whole trajectory is one vectorised expression (jit/vmap-friendly for
per-scenario randomised speeds).

All samplers return (t, pos, vel, acc) arrays with shapes (T,), (T,3), (T,3),
(T,3) — identical numbers to the reference's CSV columns.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _assemble(ts, w, phi, radius, start_point, acc_centripetal=None, dtype=None):
    cos, sin = jnp.cos(phi), jnp.sin(phi)
    zeros = jnp.zeros_like(ts)
    offset = jnp.asarray(start_point) + jnp.asarray([-radius, 0.0, 0.0])
    p = jnp.stack([radius * cos, radius * sin, zeros], axis=-1) + offset
    v = jnp.stack([-radius * w * sin, radius * w * cos, zeros], axis=-1)
    if acc_centripetal is None:
        a = jnp.zeros_like(p)
    else:
        a = acc_centripetal
    return ts, p, v, a


def circle_trajectory_accelerating(radius, v_max, t_max=10.0, dt=0.01,
                                   start_point=(0.0, 0.0, 0.0)):
    """Sine-profiled 0 -> w_max -> 0 angular velocity circle
    (`TrajectoryGenerator.sample_circle_trajectory_accelerating`,
    `TrajectoryGenerator.py:41-74`).  Matches the reference sample-for-sample:
    w_i = w_max * (sin((k_i*2π + 3π/2)*freq)+1)/2 with k_i = (i+1)/T*2 - 1,
    phi_i = Σ_{j<=i} w_j dt, and acc is the centripetal term only."""
    ts = jnp.arange(0.0, t_max, dt)
    n = ts.shape[0]
    w_max = v_max / radius
    freq = 0.5
    k = (jnp.arange(1, n + 1) / n) * 2.0 - 1.0
    dw = (jnp.sin((k * 2 * jnp.pi + jnp.pi * 3 / 2) * freq) + 1.0) / 2.0
    w = dw * w_max
    phi = jnp.cumsum(w * dt)
    cos, sin = jnp.cos(phi), jnp.sin(phi)
    acc = jnp.stack([-radius * w * w * cos, -radius * w * w * sin, jnp.zeros_like(w)], axis=-1)
    return _assemble(ts, w, phi, radius, start_point, acc)


def circle_trajectory_constant(radius, v_max, dt=0.01, start_point=(0.0, 0.0, 0.0)):
    """Constant-speed single loop (`TrajectoryGenerator.py:78-100`): zero
    logged acceleration, duration = one full circle."""
    w_max = v_max / radius
    t_max = 2 * jnp.pi / w_max
    ts = jnp.arange(0.0, float(t_max), dt)
    w = jnp.full_like(ts, w_max)
    phi = jnp.cumsum(w * dt)
    return _assemble(ts, w, phi, radius, start_point, None)


def circle_trajectory_acc_dec(radius, v_max, dt=0.01, start_point=(0.0, 0.0, 0.0)):
    """Accelerate to w_max at mid-time then decelerate
    (`TrajectoryGenerator.py:102-130`): piecewise-constant angular
    acceleration ±w_max²/(2π), w and phi as running sums."""
    w_max = v_max / radius
    acc_mag = w_max * w_max / 2.0 / np.pi
    t_mid = w_max / acc_mag
    t_max = 2 * t_mid
    ts = jnp.arange(0.0, float(t_max), dt)
    acc_w = jnp.where(ts < t_mid, acc_mag, -acc_mag)
    w = jnp.cumsum(acc_w * dt)
    phi = jnp.cumsum(w * dt)
    cos, sin = jnp.cos(phi), jnp.sin(phi)
    acc = jnp.stack([-radius * acc_w * cos, -radius * acc_w * sin, jnp.zeros_like(w)], axis=-1)
    return _assemble(ts, w, phi, radius, start_point, acc)


def square_trajectory(n: int = 10, dt: float = 0.1, v: float = 3.0) -> np.ndarray:
    """Six-segment axis-aligned square reference at constant speed `v`
    (`/root/reference/src/utils/utils.py:853-894`): hold, +x, +y, -x, -y,
    hold.  Returns an (N,13) state array (identity attitude, zero rates) like
    the reference's 13-state trajectory format.
    """
    t_section = np.arange(0.0, n * dt / 6.0, dt)
    dirs = np.array([[0, 0, 0], [v, 0, 0], [0, v, 0], [-v, 0, 0],
                     [0, -v, 0], [0, 0, 0]], dtype=float)
    p0 = np.zeros(3)
    segs = []
    for d in dirs:
        seg = p0[None, :] + d[None, :] * t_section[:, None]
        segs.append(seg)
        p0 = seg[-1]
    p = np.concatenate(segs, axis=0)
    x = np.zeros((p.shape[0], 13))
    x[:, 3] = 1.0
    x[:, 0:3] = p
    x[:, 7:10] = dirs[-1]
    return x
