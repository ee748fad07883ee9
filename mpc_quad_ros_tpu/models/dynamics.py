"""13-state quadrotor rigid-body dynamics as pure jnp functions.

Capability parity with the reference plant `Quadrotor3D`
(`/root/reference/src/quad.py:166-381`): nominal dynamics, quadratic aero +
linear rotor drag, RK4 integration with NO quaternion renormalisation
(the reference deliberately comments it out, `quad.py:188` — we reproduce that
for parity, with an opt-in `normalize_quat` for long-horizon stability).

Design: everything is a function of (x, u, params) with x: (..., 13) =
[pos(3), quat wxyz(4), vel(3), rate(3)], u: (..., 4) ∈ [0,1].  All functions
broadcast over leading batch dims and differentiate cleanly (the MPC layer
takes jacfwd of `rk4_step`), replacing both the numpy plant and the CasADi
symbolic twin of the reference with a single traced implementation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.rotations import q_to_rot_mat, quaternion_derivative, quaternion_inverse, unit_quat, v_dot_q
from .params import QuadParams


def a_drag_body(x: jnp.ndarray, p: QuadParams) -> jnp.ndarray:
    """Aerodynamic drag acceleration in BODY frame (`quad.py:256-277`):
    a = -(aero_drag * v_b^2 * sign(v_b) + rotor_drag * v_b) / mass."""
    v_b = v_dot_q(x[..., 7:10], quaternion_inverse(x[..., 3:7]))
    quad_term = p.aero_drag[..., None] if p.aero_drag.ndim == x.ndim - 1 else p.aero_drag
    a = -quad_term * v_b**2 * jnp.sign(v_b) / p.mass[..., None]
    a = a - p.rotor_drag * v_b / p.mass[..., None]
    return a


def _f_core(x: jnp.ndarray, u: jnp.ndarray, p: QuadParams, a_extra_world: jnp.ndarray) -> jnp.ndarray:
    """Shared rigid-body core: nominal dynamics + an extra world-frame
    acceleration term added to v̇ (drag / GP correction / disturbance)."""
    q = x[..., 3:7]
    v = x[..., 7:10]
    w = x[..., 10:13]

    f_thrust = u * p.rotor_functionality * p.max_thrust[..., None]  # (..., 4)
    thrust_sum = jnp.sum(f_thrust, axis=-1)

    dpos = v
    datt = quaternion_derivative(q, w)

    # thrust acceleration rotated to world (`quad.py:344-346`)
    rot = q_to_rot_mat(q)
    a_thrust_world = rot[..., :, 2] * (thrust_sum / p.mass)[..., None]

    # payload term (`quad.py:353` — reproduced as-is, including its quirk)
    a_payload = -(p.payload_mass / p.mass)[..., None] * p.g

    dvel = -p.g + a_payload + a_thrust_world + a_extra_world

    J0, J1, J2 = p.J[..., 0], p.J[..., 1], p.J[..., 2]
    tx = jnp.sum(f_thrust * p.y_f, axis=-1)
    ty = -jnp.sum(f_thrust * p.x_f, axis=-1)
    tz = jnp.sum(f_thrust * p.z_l_tau, axis=-1)
    drate = jnp.stack(
        [
            (tx + (J1 - J2) * w[..., 1] * w[..., 2]) / J0,
            (ty + (J2 - J0) * w[..., 2] * w[..., 0]) / J1,
            (tz + (J0 - J1) * w[..., 0] * w[..., 1]) / J2,
        ],
        axis=-1,
    )
    return jnp.concatenate([dpos, datt, dvel, drate], axis=-1)


def f_nominal(x: jnp.ndarray, u: jnp.ndarray, p: QuadParams) -> jnp.ndarray:
    """Nominal (drag-free) dynamics ẋ = f(x, u) — the MPC model without GP
    augmentation (`quad_opt.py:187-209`)."""
    return _f_core(x, u, p, jnp.zeros_like(x[..., 7:10]))


def f_with_drag(x: jnp.ndarray, u: jnp.ndarray, p: QuadParams) -> jnp.ndarray:
    """Ground-truth plant dynamics including aero + rotor drag
    (`quad.py:280-357` with drag=True)."""
    a_d_world = v_dot_q(a_drag_body(x, p), x[..., 3:7])
    return _f_core(x, u, p, a_d_world)


def f_disturbed(x: jnp.ndarray, u: jnp.ndarray, p: QuadParams, f_d: jnp.ndarray, t_d: jnp.ndarray) -> jnp.ndarray:
    """Plant dynamics with body-frame force and torque disturbances
    (`quad.py:280-381` f_d/t_d arguments)."""
    a_d_world = v_dot_q(a_drag_body(x, p) + f_d / p.mass[..., None], x[..., 3:7])
    dx = _f_core(x, u, p, a_d_world)
    dtau = t_d / p.J
    return dx.at[..., 10:13].add(dtau)


def rk4_step(f, x: jnp.ndarray, u: jnp.ndarray, dt, normalize_quat: bool = False) -> jnp.ndarray:
    """Classic RK4 with zero-order-hold control (`quad.py:181-190`).

    `normalize_quat=False` matches the reference bit-for-bit (it skips
    renormalisation); set True for long free-running rollouts.
    """
    k1 = f(x, u)
    k2 = f(x + dt / 2 * k1, u)
    k3 = f(x + dt / 2 * k2, u)
    k4 = f(x + dt * k3, u)
    x_out = x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
    if normalize_quat:
        x_out = x_out.at[..., 3:7].set(unit_quat(x_out[..., 3:7]))
    return x_out


def plant_step(x: jnp.ndarray, u: jnp.ndarray, p: QuadParams, dt) -> jnp.ndarray:
    """One physics step of the true plant (drag on, control clamped to [0,1]
    like `quad.update`, `quad.py:242-253`)."""
    u = jnp.clip(u, 0.0, 1.0)
    return rk4_step(lambda xx, uu: f_with_drag(xx, uu, p), x, u, dt)


def plant_substeps(x: jnp.ndarray, u: jnp.ndarray, p: QuadParams, dt, n_sub: int) -> jnp.ndarray:
    """`n_sub` physics RK4 sub-steps under a held control — the reference's
    inner simulation loop (`execute_trajectory.py:234-243`: 20 x 5 ms per
    100 ms MPC tick), expressed as a scan for the XLA scheduler."""
    u = jnp.clip(u, 0.0, 1.0)

    def body(carry, _):
        return rk4_step(lambda xx, uu: f_with_drag(xx, uu, p), carry, u, dt), None

    x_out, _ = jax.lax.scan(body, x, None, length=n_sub)
    return x_out


def compute_a_drag_target(x_now: jnp.ndarray, x_pred_prev: jnp.ndarray, dt) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Online drag-learning target (`utils/utils.py:934-950`):
    v_body of the measured state, and the acceleration error
    (v_body(x_now) - v_body(x_pred_prev)) / dt used as the RGP regression
    label.  Returns (v_body (...,3), a_drag (...,3))."""
    v_body = v_dot_q(x_now[..., 7:10], quaternion_inverse(x_now[..., 3:7]))
    v_body_pred = v_dot_q(x_pred_prev[..., 7:10], quaternion_inverse(x_pred_prev[..., 3:7]))
    a_drag = (v_body - v_body_pred) / dt
    return v_body, a_drag
