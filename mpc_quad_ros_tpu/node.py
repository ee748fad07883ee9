"""Controller / trajectory-generator "nodes" — the ROS seam without ROS.

Capability parity with the reference's two ROS nodes and custom messages:

- `TrajectoryRequest` / `Trajectory` / `MotorPower` mirror the custom msgs
  (`/root/reference/msg/Trajectory_request.msg`, `msg/Trajectory.msg`,
  `msg/MotorPowerStamped.msg`).
- `TrajectoryServer` answers requests with sampled 13-state trajectories
  (line / static / random / circle), like `trajectory_generator_node.py:99-233`.
- `ControllerNode` runs the 100 Hz odometry-callback control loop of
  `mpc_controller_node.py:228-407` — including the bootstrap state machine
  (line-to-hover, `:249-267`), reference-chunk downsampling by the control
  frequency factor (`:278-280`), online RGP regression with the previous
  prediction (`:304-318`), trajectory-finished detection with the epsilon
  ball (`:372-399`), training-run counting, and per-tick logging with the
  reference's keys.

Transport is dependency-injected: instead of rospy publishers the node calls
plain callables (`publish_control`, `request_trajectory` -> server).  Attach
a real transport (ROS bridge, UDP, Crazyswarm) at this seam; the built-in
`SimLoop` wires it to the internal plant at odometry rate — Gazebo-sim
semantics without Gazebo.

The per-tick compute (solve + predict + regress) is one jit-compiled step;
the state machine stays in Python because it is host-side control flow at
100 Hz, far off the compute path.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .io.logger import Logger
from .models.augmented import make_mpc_dynamics
from .models.dynamics import compute_a_drag_target, plant_substeps
from .models.ensemble import GPEnsemble
from .models.rgp import rgp_regress
from .ops import MPCConfig, SQPSolver
from .ops.sqp import init_carry


# --------------------------------------------------------------------------- #
# messages (msg/*.msg parity)
# --------------------------------------------------------------------------- #
@dataclasses.dataclass
class TrajectoryRequest:
    """`msg/Trajectory_request.msg`: type + start/end (+enables) + limits."""

    type: str                      # 'line' | 'static' | 'random' | 'circle'
    start_point: np.ndarray | None = None
    end_point: np.ndarray | None = None
    v_max: float = 10.0
    a_max: float = 10.0


@dataclasses.dataclass
class Trajectory:
    """`msg/Trajectory.msg`: timestamped 13-state samples."""

    x: np.ndarray                  # (T, 13)
    t: np.ndarray                  # (T,)


@dataclasses.dataclass
class MotorPower:
    """`msg/MotorPowerStamped.msg`: per-motor commands."""

    m: np.ndarray                  # (4,) in [0, 1]
    stamp: float = 0.0


@dataclasses.dataclass
class ControlCommand:
    """The RPG-autopilot-style command published on the gazebo path
    (`mpc_controller_node.py:590-615`): body rates + collective thrust."""

    bodyrates: np.ndarray          # (3,)
    collective_thrust: float       # [m/s^2]
    motors: np.ndarray             # (4,) raw [0,1] activations
    stamp: float = 0.0


@dataclasses.dataclass
class LiveFrame:
    """Per-tick live-visualization payload — the data the reference streams
    to rviz during flight (`mpc_controller_node.py:639-734`: reference-chunk
    path, MPC-optimal path, target marker).  Delivered through
    `ControllerNode(live_callback=...)`; render with `io.viz.LiveFlightView`
    or any custom sink (websocket, file, ...)."""

    t: float
    x: np.ndarray                  # (13,) measured state
    x_ref_chunk: np.ndarray        # (N, 13) current reference chunk
    x_horizon: np.ndarray          # (N+1, 13) MPC-optimal state trajectory
    target: np.ndarray             # (3,) trajectory endpoint marker


@dataclasses.dataclass
class PositionCommand:
    """The Crazyswarm `cmdPosition` actuation path
    (`/root/reference/src/cf_execute.py:250-254`): the vehicle's ONBOARD
    position controller tracks the MPC's predicted next position + yaw
    instead of receiving motor powers / body rates directly."""

    pos: np.ndarray                # (3,) world position setpoint
    yaw: float                     # [rad]
    motors: np.ndarray             # (4,) the MPC's motor plan (logged, unused)
    stamp: float = 0.0


# --------------------------------------------------------------------------- #
class TrajectoryServer:
    """Answers TrajectoryRequest with a sampled Trajectory
    (`trajectory_generator_node.py:137-233`)."""

    def __init__(self, sample_dt: float = 0.01, seed: int = 0):
        self.sample_dt = sample_dt
        self.seed = seed

    def handle(self, req: TrajectoryRequest) -> Trajectory:
        from .traj import (
            circle_trajectory_accelerating,
            line_waypoints,
            min_snap_trajectory,
            random_waypoints,
            sample_polynomial_trajectory,
            states_from_flat_outputs,
        )

        if req.type == "circle":
            ts, pos, vel, acc = circle_trajectory_accelerating(
                10.0, req.v_max, t_max=30.0, dt=self.sample_dt,
                start_point=tuple(req.start_point) if req.start_point is not None else (0, 0, 0),
            )
            return Trajectory(states_from_flat_outputs(np.asarray(pos), np.asarray(vel)),
                              np.asarray(ts))

        if req.type == "line":
            wp = line_waypoints(req.start_point, req.end_point)
        elif req.type == "random":
            wp = random_waypoints(hsize=10.0, num_waypoints=6,
                                  start_point=req.start_point, seed=self.seed)
            self.seed += 1
        elif req.type == "static":
            wp = np.asarray([req.start_point, req.end_point]) if req.end_point is not None else None
            if wp is None:
                raise ValueError("static request needs waypoints")
        else:
            raise ValueError(f"unknown trajectory type {req.type}")

        poly = min_snap_trajectory(wp, req.v_max, req.a_max)
        ts, pos, vel, acc = sample_polynomial_trajectory(poly, self.sample_dt)
        return Trajectory(states_from_flat_outputs(pos, vel), ts)


# --------------------------------------------------------------------------- #
class ControllerNode:
    """The odometry-driven MPC controller (`mpc_controller_node.py:68-407`)."""

    HOVER_POS = np.array([0.0, 0.0, 3.0])          # (`mpc_controller_node.py:121`)
    EPSILON_TRAJECTORY_FINISHED = 1.0              # [m] (`:120`)

    def __init__(
        self,
        quad_params,
        trajectory_server: TrajectoryServer,
        publish_control: Optional[Callable] = None,
        use_gp: int = 0,
        gpe: Optional[GPEnsemble] = None,
        v_max: float = 10.0,
        a_max: float = 10.0,
        trajectory_type: str = "circle",
        t_lookahead: float = 1.0,
        n_nodes: int = 5,
        n_basis_vectors: int = 20,
        odometry_dt: float = 0.01,
        training: bool = False,
        training_trajectories_count: int = 1,
        logger: Optional[Logger] = None,
        dtype=jnp.float32,
        actuation: str = "motors",
        live_callback: Optional[Callable] = None,
    ):
        if actuation not in ("motors", "position"):
            raise ValueError(f"unknown actuation mode {actuation!r}")
        self.actuation = actuation
        self.live_callback = live_callback
        self.p = quad_params
        self.server = trajectory_server
        self.publish_control = publish_control or (lambda cmd: None)
        self.v_max, self.a_max = v_max, a_max
        self.trajectory_type = trajectory_type
        self.odometry_dt = odometry_dt
        self.training = training
        self.trajectories_count_desired = training_trajectories_count if training else 1
        self.logger = logger or Logger()
        self.dtype = dtype

        cfg = MPCConfig(n_nodes=n_nodes, t_horizon=t_lookahead, u_ref=0.16)
        self.cfg = cfg
        self.solver = SQPSolver(cfg, make_mpc_dynamics(quad_params))
        self.control_freq_factor = int(round(cfg.dt / odometry_dt))

        # --- GPE (`initialize_MPC`, `mpc_controller_node.py:192-226`) ---
        self.use_gp = use_gp
        if use_gp == 2 and gpe is None:
            gpe = GPEnsemble.fromrange([(-v_max, v_max)] * 3, n_basis_vectors, dtype=dtype)
        self.gpe = gpe
        self.rgp_state = gpe.state if (gpe is not None and gpe.type == "RGP") else None
        self.gp_state = gpe.state if (gpe is not None and gpe.type == "GP") else None

        # --- state machine flags (`mpc_controller_node.py:126-135`) ---
        self.need_trajectory_to_hover = True
        self.trajectory_ready = False
        self.doing_a_line = False
        self.number_of_trajectories_finished = 0
        self.idx_traj = 0
        self.x_trajectory: Optional[np.ndarray] = None
        self.t_trajectory: Optional[np.ndarray] = None
        self.x_pred_prev: Optional[np.ndarray] = None
        self.solver_carry = None
        self.finished = False

        # one jitted compute step shared by every callback
        self._step = jax.jit(self._compute_step)

    # ------------------------------------------------------------------ #
    def _compute_step(self, carry, x, x_ref, rgp_state, x_pred_prev):
        aug = rgp_state if self.use_gp == 2 else (self.gp_state if self.use_gp == 1 else None)
        carry, sol = self.solver.solve(carry, x, x_ref, x_ref[-1], aug)
        u = sol.U[0]
        x_pred = self.solver.discrete_dynamics(x, u, self.odometry_dt, None)
        if self.use_gp == 2:
            v_body, a_drag = compute_a_drag_target(x, x_pred_prev, self.odometry_dt)
            rgp_state = jax.vmap(rgp_regress)(rgp_state, v_body[:, None], a_drag[:, None])
        else:
            v_body = a_drag = None
        return carry, u, sol.X, sol.cost, x_pred, rgp_state, v_body, a_drag

    # ------------------------------------------------------------------ #
    def request_trajectory(self, x: np.ndarray, traj_type: str, start=None, end=None):
        """(`request_trajectory`/`publish_trajectory_request`, `:430-506`)"""
        req = TrajectoryRequest(
            type=traj_type,
            start_point=np.asarray(start if start is not None else x[:3], dtype=float),
            end_point=np.asarray(end, dtype=float) if end is not None else None,
            v_max=self.v_max, a_max=self.a_max,
        )
        self.trajectory_received_cb(self.server.handle(req))

    def trajectory_received_cb(self, traj: Trajectory):
        """(`trajectory_received_cb`, `mpc_controller_node.py:511-553`)"""
        if self.trajectory_ready:
            return  # ignore new trajectories while one is active (`:517-519`)
        self.x_trajectory = np.asarray(traj.x)
        self.t_trajectory = np.asarray(traj.t)
        self.idx_traj = 0
        self.trajectory_ready = True

    # ------------------------------------------------------------------ #
    def pose_received_cb(self, x: np.ndarray, timestamp: float = 0.0):
        """100 Hz odometry callback (`pose_received_cb`, `:228-407`).
        Returns the ControlCommand applied, or None while idle."""
        x = np.asarray(x, dtype=float)

        if self.need_trajectory_to_hover:
            self.need_trajectory_to_hover = False
            self.trajectory_ready = False
            if np.linalg.norm(x[0:3] - self.HOVER_POS) > self.EPSILON_TRAJECTORY_FINISHED:
                self.doing_a_line = True
                self.request_trajectory(x, "line", start=x[:3], end=self.HOVER_POS)
            else:
                self.request_trajectory(x, self.trajectory_type)

        if not self.trajectory_ready or self.finished:
            return None

        xj = jnp.asarray(x, dtype=self.dtype)
        if self.solver_carry is None:
            self.solver_carry = init_carry(self.cfg, xj)
        if self.x_pred_prev is None:
            self.x_pred_prev = x

        # reference chunk with downsampling (`:278-280`)
        idx = np.clip(self.idx_traj + self.control_freq_factor * np.arange(self.cfg.n_nodes),
                      0, len(self.x_trajectory) - 1)
        x_ref = jnp.asarray(self.x_trajectory[idx], dtype=self.dtype)

        t0 = time.perf_counter()
        (self.solver_carry, u, x_opt, cost, x_pred, rgp_state, v_body, a_drag) = self._step(
            self.solver_carry, xj, x_ref,
            self.rgp_state if self.rgp_state is not None else _EMPTY_RGP,
            jnp.asarray(self.x_pred_prev, dtype=self.dtype),
        )
        elapsed = time.perf_counter() - t0
        if self.use_gp == 2:
            self.rgp_state = rgp_state

        u_np = np.asarray(u)
        if self.actuation == "position":
            # cmdPosition mode (`cf_execute.py:250-254`): publish the MPC's
            # predicted next position + yaw for an external/onboard position
            # controller to track
            q1 = np.asarray(x_opt[1, 3:7])
            yaw = float(np.arctan2(2 * (q1[0] * q1[3] + q1[1] * q1[2]),
                                   1 - 2 * (q1[2] ** 2 + q1[3] ** 2)))
            cmd = PositionCommand(pos=np.asarray(x_opt[1, :3]), yaw=yaw,
                                  motors=np.clip(u_np, 0.0, 1.0),
                                  stamp=timestamp)
        else:
            cmd = ControlCommand(
                bodyrates=np.asarray(x_opt[1, 10:13]),
                collective_thrust=float(u_np.sum() * float(self.p.max_thrust) / float(self.p.mass)),
                motors=np.clip(u_np, 0.0, 1.0),
                stamp=timestamp,
            )
        self.publish_control(cmd)

        if self.live_callback is not None:
            # rviz-equivalent live stream (`mpc_controller_node.py:639-734`)
            self.live_callback(LiveFrame(
                t=timestamp, x=x, x_ref_chunk=np.asarray(x_ref),
                x_horizon=np.asarray(x_opt),
                target=self.x_trajectory[-1, :3].copy(),
            ))

        self.idx_traj += 1
        x_pred_np = np.asarray(x_pred)

        if not self.doing_a_line:
            self.logger.log({
                "x_odom": x, "x_pred_odom": x_pred_np, "x_ref": self.x_trajectory[idx[0]],
                "t_odom": timestamp, "w_odom": u_np, "t_cpu": elapsed,
                "elapsed_during_mpc": elapsed, "cost_solution": float(cost),
                "rgp_mu_g_t": (np.asarray(self.rgp_state.mu_g) if self.use_gp == 2 else None),
                "v_body": (np.asarray(v_body) if v_body is not None else None),
                "a_drag": (np.asarray(a_drag) if a_drag is not None else None),
                # full posterior keys (`execute_trajectory.py:270-273`)
                "rgp_basis_vectors": (np.asarray(self.rgp_state.X) if self.use_gp == 2 else None),
                "rgp_C_g_t": (np.asarray(self.rgp_state.C_g) if self.use_gp == 2 else None),
                "rgp_theta": (np.asarray(self.rgp_state.theta) if self.use_gp == 2 else None),
            })
        self.x_pred_prev = x_pred_np

        # trajectory-finished check (`:372-399`)
        if (self.idx_traj + 1 >= len(self.x_trajectory)
                and np.linalg.norm(x[0:3] - self.x_trajectory[-1, 0:3])
                < self.EPSILON_TRAJECTORY_FINISHED):
            self.trajectory_ready = False
            if self.doing_a_line:
                self.logger.clear_memory()
                self.doing_a_line = False
                self.request_trajectory(x, self.trajectory_type)
            else:
                self.number_of_trajectories_finished += 1
                if self.logger.filepath:
                    self.logger.save_log()
                if self.number_of_trajectories_finished >= self.trajectories_count_desired:
                    self.finished = True
                else:
                    self.request_trajectory(x, self.trajectory_type)
        return cmd


# placeholder aug for the jitted step when no RGP is attached (never read)
import jax.numpy as _jnp
from .models.rgp import rgp_init as _rgp_init

_EMPTY_RGP = jax.tree.map(
    lambda a: _jnp.broadcast_to(a, (3,) + a.shape), _rgp_init(_jnp.linspace(-1, 1, 2))
)


# --------------------------------------------------------------------------- #
class SimpleZController:
    """Minimal altitude P-controller publishing motor powers — parity with the
    Crazyflie hardware test node (`cf_controller_node.py:26-75`), including
    its odometry hygiene: drop stale messages and undersample to the control
    rate."""

    def __init__(self, target_z: float = 1.0, kp: float = 0.4, hover: float = 0.3,
                 publish: Optional[Callable] = None, min_dt: float = 0.02,
                 max_age: float = 0.5):
        self.target_z = target_z
        self.kp = kp
        self.hover = hover
        self.publish = publish or (lambda mp: None)
        self.min_dt = min_dt        # undersample threshold (`cf_controller_node.py:27-32`)
        self.max_age = max_age      # stale-message threshold
        self.last_t = -np.inf

    def odometry_cb(self, x: np.ndarray, timestamp: float, now: Optional[float] = None):
        now = timestamp if now is None else now
        if now - timestamp > self.max_age:      # stale
            return None
        if timestamp - self.last_t < self.min_dt:  # undersampled
            return None
        self.last_t = timestamp
        u = float(np.clip(self.hover + self.kp * (self.target_z - x[2]), 0.0, 1.0))
        mp = MotorPower(m=np.full(4, u), stamp=timestamp)
        self.publish(mp)
        return mp


def position_controller_motors(x, pos_cmd, yaw_cmd, p,
                               kp=jnp.asarray((6.0, 6.0, 8.0)),
                               kd=jnp.asarray((4.5, 4.5, 5.5)),
                               k_rot=150.0, k_rate=24.0):
    # gain separation: attitude loop (wn = sqrt(k_rot) ~ 12 rad/s, zeta ~ 1)
    # must sit well above the position loop (wn = sqrt(kp) ~ 2.5 rad/s) —
    # an underdamped/slow attitude loop limit-cycles the position cascade
    """Geometric position controller: (state, position setpoint, yaw) ->
    motor activations in [0, 1].  The stand-in for the Crazyflie ONBOARD
    controller behind `cf.cmdPosition` (`cf_execute.py:250-254`) when the
    cmdPosition actuation mode flies against the internal plant.

    Standard Lee-style cascade: PD position -> desired world acceleration ->
    desired body z / full attitude from the yaw setpoint -> rotation-error P
    body-rate law -> torques via the diagonal inertia -> per-motor thrusts
    through the inverse of the rotor mixing implied by the plant's geometry
    (`models/dynamics.py:_f_core`: T = sum f, tx = f.y_f, ty = -f.x_f,
    tz = f.z_l_tau).  Pure jnp, jit/vmap friendly.
    """
    from .utils.rotations import q_to_rot_mat

    pos, q, vel, w = x[0:3], x[3:7], x[7:10], x[10:13]
    dtype = x.dtype

    a_des = kp.astype(dtype) * (pos_cmd - pos) - kd.astype(dtype) * vel
    f_des = p.mass * (a_des + p.g)                  # desired world force (N)

    R = q_to_rot_mat(q)
    z_b = R[:, 2]
    thrust = jnp.dot(f_des, z_b)                    # collective along body z

    # desired attitude from f_des + yaw
    z_des = f_des / jnp.maximum(jnp.linalg.norm(f_des), 1e-6)
    x_c = jnp.stack([jnp.cos(yaw_cmd), jnp.sin(yaw_cmd), jnp.zeros_like(yaw_cmd)])
    y_des = jnp.cross(z_des, x_c)
    y_des = y_des / jnp.maximum(jnp.linalg.norm(y_des), 1e-6)
    x_des = jnp.cross(y_des, z_des)
    R_des = jnp.stack([x_des, y_des, z_des], axis=1)

    # rotation error (vee of the skew part) -> body-rate P law -> torques
    E = R_des.T @ R - R.T @ R_des
    e_R = 0.5 * jnp.stack([E[2, 1], E[0, 2], E[1, 0]])
    tau = p.J * (-k_rot * e_R - k_rate * w)

    # inverse mixing: [T, tx, ty, tz] -> per-rotor thrusts -> activations
    ones = jnp.ones_like(p.x_f)
    A = jnp.stack([ones, p.y_f, -p.x_f, p.z_l_tau], axis=0)    # (4, 4)
    wrench = jnp.stack([thrust, tau[0], tau[1], tau[2]])
    f_rotors = jnp.linalg.solve(A, wrench)
    return jnp.clip(f_rotors / p.max_thrust, 0.0, 1.0)


class SimLoop:
    """Wire a ControllerNode to the internal plant at odometry rate —
    Gazebo-in-the-loop semantics without Gazebo (the reference's test seam,
    SURVEY §4.6).  In the node's `position` actuation mode the loop runs the
    onboard-controller stand-in (`position_controller_motors`) between the
    PositionCommand and the plant, mirroring how Crazyswarm's cmdPosition is
    tracked by the vehicle's own cascade (`cf_execute.py:250-254`)."""

    def __init__(self, node: ControllerNode, plant_params, x0: np.ndarray,
                 sim_substeps: int = 2, position_tracking: str = "kinematic"):
        """position_tracking (PositionCommand actuation only):
        'kinematic' — first-order tracker with the MPC node spacing as time
        constant, velocity consistent by construction; the faithful double of
        Crazyswarm's simulated `cmdPosition` (the reference's cf sim is
        kinematic: it moves the vehicle to setpoints, `cf_execute.py:253-254`).
        'dynamic' — run the onboard-controller stand-in
        (`position_controller_motors`) against the full rigid-body plant."""
        self.node = node
        self.p = plant_params
        self.x = np.asarray(x0, dtype=float)
        self.sim_substeps = sim_substeps
        self.position_tracking = position_tracking
        dt_sub = node.odometry_dt / sim_substeps
        self._plant = jax.jit(
            lambda x, u: plant_substeps(x, u, plant_params, dt_sub, sim_substeps)
        )
        # cmdPosition tracking: onboard-controller stand-in + plant, fused
        self._plant_pos = jax.jit(
            lambda x, pc, yc: plant_substeps(
                x, position_controller_motors(x, pc, yc, plant_params),
                plant_params, dt_sub, sim_substeps)
        )

    def _track_kinematic(self, cmd: "PositionCommand") -> np.ndarray:
        """Crazyswarm-sim-style tracking: close a fraction dt/dt_node of the
        gap to the commanded (one-node-ahead) position per odometry tick, so
        the vehicle paces the MPC's prediction horizon exactly; attitude is
        level at the commanded yaw, velocity is the implied gap-closing rate."""
        x = self.x.copy()
        gap = np.asarray(cmd.pos) - x[:3]
        dt_node = self.node.cfg.dt
        frac = min(1.0, self.node.odometry_dt / dt_node)
        x[:3] = x[:3] + frac * gap
        x[3:7] = [np.cos(cmd.yaw / 2), 0.0, 0.0, np.sin(cmd.yaw / 2)]
        x[7:10] = gap / dt_node
        x[10:13] = 0.0
        return x

    def run(self, max_ticks: int = 10000) -> np.ndarray:
        t = 0.0
        dtype = self.node.dtype
        for k in range(max_ticks):
            cmd = self.node.pose_received_cb(self.x, timestamp=t)
            if self.node.finished:
                break
            if isinstance(cmd, PositionCommand):
                if self.position_tracking == "kinematic":
                    self.x = self._track_kinematic(cmd)
                else:
                    self.x = np.asarray(
                        self._plant_pos(jnp.asarray(self.x, dtype=dtype),
                                        jnp.asarray(cmd.pos, dtype=dtype),
                                        jnp.asarray(cmd.yaw, dtype=dtype))
                    )
            elif cmd is not None:
                self.x = np.asarray(
                    self._plant(jnp.asarray(self.x, dtype=dtype),
                                jnp.asarray(cmd.motors, dtype=dtype))
                )
            t += self.node.odometry_dt
        return self.x
