"""Quadrotor physical parameters as a pytree.

Capability parity with the reference `Quadrotor3D` parameter handling
(`/root/reference/src/quad.py:24-97, 385-435`): default research-quad values,
the RotorS hummingbird (from its xacro description) and Crazyflie 2.0 presets.
Unlike the reference (mutable object attributes), parameters live in an
immutable NamedTuple so they can be traced, vmapped over (per-scenario
randomised drag/mass/fault profiles) and donated through jit without
recompilation.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp


class QuadParams(NamedTuple):
    """All physical constants of the 13-state quadrotor model.

    Every leaf is an array so a leading batch dimension can be added for
    per-scenario heterogeneity (fleet learning / domain randomisation).
    """

    mass: jnp.ndarray          # [kg]
    J: jnp.ndarray             # (3,) diagonal inertia [kg m^2]
    max_thrust: jnp.ndarray    # [N] per-rotor max thrust
    x_f: jnp.ndarray           # (4,) rotor x positions [m]
    y_f: jnp.ndarray           # (4,) rotor y positions [m]
    z_l_tau: jnp.ndarray       # (4,) signed yaw-torque arms [m]
    g: jnp.ndarray             # (3,) gravity vector [m/s^2]
    aero_drag: jnp.ndarray     # scalar (or (3,)) quadratic aero-drag coeff [kg/m]
    rotor_drag: jnp.ndarray    # (3,) linear rotor-drag coeffs [kg/m/s? — reference units]
    rotor_functionality: jnp.ndarray  # (4,) 1=healthy, <1 = degraded rotor (fault injection)
    payload_mass: jnp.ndarray  # [kg] payload disturbance (0 when absent)

    @property
    def hover_input(self) -> jnp.ndarray:
        """Motor activation for static hover (uniform across rotors)."""
        return self.mass * self.g[..., 2] / (4.0 * self.max_thrust)


def _mk(dtype, **kw) -> QuadParams:
    return QuadParams(**{k: jnp.asarray(v, dtype=dtype) for k, v in kw.items()})


def default_params(payload: bool = False, dtype=jnp.float32) -> QuadParams:
    """The reference's default `Quadrotor3D` constants (`quad.py:40-94`)."""
    length = 0.08 / 2
    c = 0.013
    return _mk(
        dtype,
        mass=0.03,
        J=[0.03, 0.03, 0.06],
        max_thrust=20.0,
        x_f=[length, 0.0, -length, 0.0],
        y_f=[0.0, length, 0.0, -length],
        z_l_tau=[-c, c, -c, c],
        g=[0.0, 0.0, 9.81],
        aero_drag=0.008,
        rotor_drag=[0.3, 0.3, 0.0],
        rotor_functionality=[1.0, 1.0, 1.0, 1.0],
        payload_mass=0.3 if payload else 0.0,
    )


def default_v1_params(payload: bool = False, dtype=jnp.float32) -> QuadParams:
    """The reference's EARLIER `Quadrotor3D` defaults — the values left
    commented out at `quad.py:57-61` (mass 1.0, arm 0.47/2) with the same
    J/c/drag constants.  Several recorded python-sim logs (traj2_*,
    trajectory_v15_*) predate the crazyflie-style re-parameterization and
    reproduce `x_pred_odom` to machine precision ONLY under these values
    (bench/parity_matrix.py infers the vintage per log)."""
    length = 0.47 / 2
    c = 0.013
    return _mk(
        dtype,
        mass=1.0,
        J=[0.03, 0.03, 0.06],
        max_thrust=20.0,
        x_f=[length, 0.0, -length, 0.0],
        y_f=[0.0, length, 0.0, -length],
        z_l_tau=[-c, c, -c, c],
        g=[0.0, 0.0, 9.81],
        aero_drag=0.008,
        rotor_drag=[0.3, 0.3, 0.0],
        rotor_functionality=[1.0, 1.0, 1.0, 1.0],
        payload_mass=0.3 if payload else 0.0,
    )


def hummingbird_params(payload: bool = False, dtype=jnp.float32) -> QuadParams:
    """RotorS hummingbird, '+' rotor configuration.

    Values from `config/hummingbird.xacro` as loaded by
    `quad.set_parameters_from_file` (`quad.py:385-417`):
    mass = body + 4 rotors, max_thrust = max_rot_velocity^2 * motor_constant,
    and for the '+' frame z_l_tau is negated relative to the 'x' frame.
    """
    mass = 0.68 + 4 * 0.009
    length = 0.17
    c = 0.016
    max_thrust = 838.0**2 * 8.54858e-6
    return _mk(
        dtype,
        mass=mass,
        J=[0.007, 0.007, 0.012],
        max_thrust=max_thrust,
        x_f=[length, 0.0, -length, 0.0],
        y_f=[0.0, length, 0.0, -length],
        z_l_tau=[c, -c, c, -c],
        g=[0.0, 0.0, 9.81],
        aero_drag=0.008,
        rotor_drag=[0.3, 0.3, 0.0],
        rotor_functionality=[1.0, 1.0, 1.0, 1.0],
        payload_mass=0.3 if payload else 0.0,
    )


def crazyflie_params(payload: bool = False, dtype=jnp.float32) -> QuadParams:
    """Crazyflie 2.0 preset, 'x' configuration (`quad.py:419-435`)."""
    length = 0.04
    c = 0.016
    h = math.cos(math.pi / 4) * length
    return _mk(
        dtype,
        mass=0.027,
        J=[1.8e-5, 1.8e-5, 3.3e-5],
        max_thrust=0.3,
        x_f=[h, -h, -h, h],
        y_f=[-h, -h, h, h],
        z_l_tau=[-c, c, -c, c],
        g=[0.0, 0.0, 9.81],
        aero_drag=0.008,
        rotor_drag=[0.3, 0.3, 0.0],
        rotor_functionality=[1.0, 1.0, 1.0, 1.0],
        payload_mass=0.3 if payload else 0.0,
    )


def params_from_xacro(path: str, quad_name: str = "hummingbird", payload: bool = False, dtype=jnp.float32) -> QuadParams:
    """Load parameters from a RotorS-style xacro file (`quad.py:385-417`)."""
    from ..utils.xacro import parse_xacro_properties

    attrib = parse_xacro_properties(path)
    mass = float(attrib["mass"]) + 4 * float(attrib["mass_rotor"])
    inertia = attrib["body_inertia"][0]
    J = [float(inertia["ixx"]), float(inertia["iyy"]), float(inertia["izz"])]
    length = float(attrib["arm_length"])
    max_thrust = float(attrib["max_rot_velocity"]) ** 2 * float(attrib["motor_constant"])
    c = float(attrib["moment_constant"])

    if quad_name != "hummingbird":  # 'x' configuration
        h = math.cos(math.pi / 4) * length
        x_f, y_f = [h, -h, -h, h], [-h, -h, h, h]
        z_l_tau = [-c, c, -c, c]
    else:  # '+' configuration (negated z arms, `quad.py:413-417`)
        x_f, y_f = [length, 0.0, -length, 0.0], [0.0, length, 0.0, -length]
        z_l_tau = [c, -c, c, -c]

    return _mk(
        dtype,
        mass=mass,
        J=J,
        max_thrust=max_thrust,
        x_f=x_f,
        y_f=y_f,
        z_l_tau=z_l_tau,
        g=[0.0, 0.0, 9.81],
        aero_drag=0.008,
        rotor_drag=[0.3, 0.3, 0.0],
        rotor_functionality=[1.0, 1.0, 1.0, 1.0],
        payload_mass=0.3 if payload else 0.0,
    )


def randomize_params(base: QuadParams, key, n: int, drag_scale_range=(0.5, 2.0), mass_scale_range=(1.0, 1.0)) -> QuadParams:
    """Batch of n randomised parameter sets for scenario sweeps (domain
    randomisation over aero/rotor drag and optionally mass).  Returns a
    QuadParams whose leaves gained a leading (n,) axis."""
    import jax

    k1, k2, k3 = jax.random.split(key, 3)
    tile = lambda a: jnp.broadcast_to(jnp.asarray(a), (n,) + jnp.shape(jnp.asarray(a)))
    # draw scales in the BASE dtype — jax.random's default is f64 under x64,
    # which would silently promote every downstream rollout carry
    sdtype = jnp.asarray(base.mass).dtype
    lo, hi = drag_scale_range
    drag_s = jax.random.uniform(k1, (n,), minval=lo, maxval=hi, dtype=sdtype)
    rotor_s = jax.random.uniform(k2, (n,), minval=lo, maxval=hi, dtype=sdtype)
    mlo, mhi = mass_scale_range
    mass_s = jax.random.uniform(k3, (n,), minval=mlo, maxval=mhi, dtype=sdtype)
    return QuadParams(
        mass=tile(base.mass) * mass_s,
        J=tile(base.J),
        max_thrust=tile(base.max_thrust),
        x_f=tile(base.x_f),
        y_f=tile(base.y_f),
        z_l_tau=tile(base.z_l_tau),
        g=tile(base.g),
        aero_drag=tile(base.aero_drag) * drag_s,
        rotor_drag=tile(base.rotor_drag) * rotor_s[:, None],
        rotor_functionality=tile(base.rotor_functionality),
        payload_mass=tile(base.payload_mass),
    )
