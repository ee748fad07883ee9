"""SQP-RTI nonlinear MPC over the quadrotor horizon — the acados replacement.

Reproduces the semantics of the reference's acados OCP
(`/root/reference/src/quad_opt.py:89-156`):

- LINEAR_LS cost, W = diag([q_pos(3), q_quat(4), q_vel(3), q_rate(3), r(4)])
  with the reference's quaternion weight-averaging quirk (`quad_opt.py:126`),
  terminal W_e = diag(q) * terminal_cost.
- ERK (single-step RK4) shooting integrator (`solver_options.integrator_type
  = 'ERK'`).
- Gauss-Newton Hessian (exact for LINEAR_LS).
- SQP_RTI: one linearize->QP->update iteration per tick, warm-started from
  the previous solution (no shift — acados' default primal warm start).
- u in [0, 1] box constraints (`quad_opt.py:142-144`), handled by the
  condensed box-QP solvers in `ops/qp.py` (the HPIPM stand-in).

TPU-first design: the whole solve is one pure function of
(carry, x0, y_ref, model-args).  Linearization uses jacfwd through the RK4
shooting map (replacing CasADi codegen + acados C sensitivities); full
condensing is two scans + einsums; the QP is a fixed-iteration batched
kernel.  vmap gives thousands of scenario solves per chip; `lax.scan` chains
ticks; pjit/shard_map spreads the batch over a mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .qp import solve_box_qp_pdip, solve_box_qp_projected_newton

# Interpret-mode override for the Pallas pipelines.  None = infer from the
# default backend (`jax.default_backend() != "tpu"`).  `parallel.mesh.
# make_mesh` sets this True when it falls back to a virtual-CPU mesh while
# the process default backend is a (single-chip) TPU — the container's
# sitecustomize ignores JAX_PLATFORMS once backends are initialized, so the
# default-backend heuristic would try to lower Mosaic kernels for the CPU
# mesh and fail ("Only interpret mode is supported on CPU backend").
INTERPRET_OVERRIDE: Optional[bool] = None


def _interpret_mode() -> bool:
    if INTERPRET_OVERRIDE is not None:
        return INTERPRET_OVERRIDE
    return jax.default_backend() != "tpu"


# ---- measured backend-crossover table (TPU v5e-lite, B=256, 12 IPM iters;
# outputs/roofline/CROSSOVER_r05.json) ----
# Batched Pallas pipelines: the condensed hybrid kernel wins at short
# horizons (N=10: 0.34 us/solve vs the Riccati kernel's 1.11); the O(N)-VMEM
# lanes-batched Riccati-IPM kernel wins from N~18 (N=20: 1.99 vs 2.78;
# N=40: 4.28 vs 16.26; interpolated crossing ~N=17).  Per-scenario XLA
# paths cross much later (the vmapped Riccati scan pays XLA loop overhead):
# condensed pdip N=20 149 vs 294 us, N=40 883 vs 589.
AUTO_RICCATI_MIN_N_TILED = 18    # batched Pallas: riccati from N >= 18
AUTO_RICCATI_MIN_N_XLA = 32      # per-scenario XLA: riccati from N >= 32
# VMEM ceiling of the condensed kernels: the fused/hybrid kernel holds the
# (N*nu, N*nu, 128)-f32 condensed-Hessian tile (+ live condensing state) in
# VMEM; past this horizon Mosaic cannot schedule it and the compile fails
# (N=80: H tile alone is 52 MB).  Measured: N=40 compiles and runs, N=80
# does not.  `solve_batch` falls back to the Riccati backend instead of
# crashing — see `_resolve_qp_method`.
FUSED_N_MAX = 40


def _fold_aug(aug):
    """Fold a GP/RGP augmentation into its solve-invariant form (the
    per-solve constant K_x⁻¹ mu_g product) so the RK4 linearization doesn't
    recompute it per stage/tangent.  No-op for None/unknown model pytrees."""
    if aug is None:
        return None
    from ..models.augmented import fold_drag

    return fold_drag(aug)


class MPCConfig(NamedTuple):
    """Static MPC problem definition (hashable — safe as a jit static arg is
    NOT needed; all fields are arrays or Python ints consumed at trace time)."""

    n_nodes: int = 10            # N (`execute_trajectory.py:123`)
    t_horizon: float = 1.0       # [s] (`execute_trajectory.py:122`)
    q_cost: tuple = (10.0, 10.0, 10.0, 0.1, 0.1, 0.1, 0.05, 0.05, 0.05, 0.05, 0.05, 0.05)
    r_cost: tuple = (0.1, 0.1, 0.1, 0.1)
    terminal_cost: float = 1.0   # (`quad_opt.py:44`)
    u_lb: float = 0.0
    u_ub: float = 1.0
    u_ref: float = 0.16          # hover reference control (`quad_opt.py:277,304`)
    sqp_iters: int = 1           # 1 == RTI; >1 == full SQP per tick
    qp_iters: int = 12
    qp_method: str = "pdip"      # "pdip" | "projected_newton" | "riccati" | "auto"
    # "pdip" (fused condensed Pallas pipeline) is fastest at the reference's
    # N=10; "riccati" (lanes-batched Pallas Riccati IPM, O(N) VMEM) wins
    # from N~20 and is the only Pallas path from N~80 (measured crossover:
    # ops/riccati.py module docstring, outputs/roofline/CROSSOVER_r05.json).
    # "auto" picks from the measured table per path (condensed below the
    # crossover horizon, Riccati above — `_resolve_qp_method`); explicit
    # "pdip" past the condensed kernels' VMEM ceiling (N > FUSED_N_MAX)
    # falls back to "riccati" with a warning instead of a Mosaic OOM crash.
    shift_warm_start: bool = False
    # False matches acados' default (plain primal warm start, what the
    # reference ran); True shifts the plan one stage per tick (standard RTI
    # practice) — markedly more stable for long horizons on fast references.
    scale_stage_by_dt: bool = True
    # acados integrates the LINEAR_LS Lagrange term over each shooting
    # interval: stage cost x dt, terminal cost unscaled.  Replaying reference
    # logs confirms it (mean |du| vs acados drops 0.024 -> 0.0015 with the
    # scaling on).  Set False for an unscaled discrete-sum cost.
    pipeline: str = "hybrid"
    # Batched-solve kernel strategy for B >= 128:
    # - "hybrid" (default, fastest — 12.6 ms/16384 solves on v5e-lite): the
    #   standalone lin kernel writes scenario-major tangent tiles which feed
    #   ONE fused condense+IPM+expand kernel; one J HBM round-trip
    #   (~1.1 MB/tile), H/M stay in VMEM.  Chosen by measurement: the
    #   all-in-one kernel's in-body linearization runs 3.5x slower than the
    #   standalone lin kernel (VMEM/register pressure from the condensing
    #   state — round-4 probe, outputs/roofline/ROOFLINE.md).
    # - "fused" runs the whole Gauss-Newton step as ONE Pallas kernel with
    #   zero HBM traffic between phases (15.4 ms — the lin inefficiency
    #   outweighs the traffic saving at N=10).
    # - "split" chains the three per-phase kernels (13.6 ms; kept as the
    #   numerical cross-check).
    # All three are bitwise-identical in z/U (shared kernel bodies,
    # tests/test_pipeline_equivalence.py).
    warm_start_duals: bool = False
    # Carry the IPM dual state (zl, zu) across RTI ticks and seed the QP from
    # it — the role HPIPM's warm start plays inside acados SQP_RTI
    # (`quad_opt.py:147-151`).  MEASURED NEGATIVE on this workload, hence
    # default False: on a 40-tick RTI chain with an aggressive transient
    # (hover -> 4 m step at v=2.5, f32, N=10) the active set flips between
    # ticks and a warm-started IPM crawls along the boundary — max chain KKT
    # 1.0 vs cold 8.1e-4 at 12 iters; centred warm starts (z=0 pushed 0.01
    # into the box, duals mu0/slack) and guarded dual-informed active-set
    # polish steps were also measured and do not beat 12 cold iterations at
    # equal factorization count (cold+polish: KKT unchanged on the hard
    # ticks; see CLAUDE.md numerics notes).  The plumbing is kept because
    # warm starts DO pay on near-steady chains — measured on a 40-tick
    # regulation chain (0.5 m step): warm@6 iters max KKT 4.2e-4 == cold@12's
    # 4.2e-4, warm@8 2.7e-4 < cold@12 — half the factorizations at equal
    # accuracy.  Opt in per deployment after measuring YOUR tick-to-tick
    # active-set churn.

    @property
    def dt(self) -> float:
        return self.t_horizon / self.n_nodes

    @property
    def stage_scale(self) -> float:
        return self.dt if self.scale_stage_by_dt else 1.0

    def q_diagonal(self) -> jnp.ndarray:
        """12 Euler-style weights -> 13 quaternion-state weights with the
        reference's mean-insertion quirk (`quad_opt.py:122-126`)."""
        q = jnp.asarray(self.q_cost)
        return jnp.concatenate([q[:3], jnp.mean(q[3:6])[None], q[3:]])

    def weight_tuples(self) -> tuple:
        """(stage-q, terminal-q, control-r) diagonals as static Python float
        tuples — compile-time constants for the Pallas condense kernel."""
        import numpy as _np

        q = _np.asarray(self.q_cost, dtype=_np.float64)
        qd = _np.concatenate([q[:3], [q[3:6].mean()], q[3:]])
        q_stage = tuple(float(v) for v in qd * self.stage_scale)
        q_term = tuple(float(v) for v in qd * self.terminal_cost)
        rw = tuple(float(v) * self.stage_scale for v in self.r_cost)
        return q_stage, q_term, rw


class SolverCarry(NamedTuple):
    """Warm-started primal trajectory + IPM dual state — the RTI state
    carried across ticks (acados keeps the same pair inside HPIPM)."""

    X: jnp.ndarray  # (N+1, 13)
    U: jnp.ndarray  # (N, 4)
    zl: Optional[jnp.ndarray] = None  # (N*nu,) lower-bound multipliers
    zu: Optional[jnp.ndarray] = None  # (N*nu,) upper-bound multipliers


class MPCSolution(NamedTuple):
    X: jnp.ndarray          # (N+1, 13) QP-updated state trajectory
    U: jnp.ndarray          # (N, 4) optimal controls
    cost: jnp.ndarray       # LS cost of the returned trajectory
    kkt_residual: jnp.ndarray  # projected-gradient norm of the QP solution


def init_carry(cfg: MPCConfig, x0: jnp.ndarray, u0: Optional[jnp.ndarray] = None) -> SolverCarry:
    N = cfg.n_nodes
    X = jnp.broadcast_to(x0, (N + 1,) + x0.shape).astype(x0.dtype)
    if u0 is None:
        u0 = jnp.full((4,), cfg.u_ref, dtype=x0.dtype)
    U = jnp.broadcast_to(u0, (N, 4)).astype(x0.dtype)
    zl = zu = None
    if cfg.warm_start_duals:
        # unit duals == the IPM's cold-start value; the first solve behaves
        # like a (floored) cold start and every later tick inherits real duals
        zl = jnp.ones((N * 4,), dtype=x0.dtype)
        zu = jnp.ones((N * 4,), dtype=x0.dtype)
    return SolverCarry(X=X, U=U, zl=zl, zu=zu)


class SQPSolver:
    """Gauss-Newton SQP(-RTI) on the quadrotor OCP.

    `dynamics`: continuous-time model ẋ = f(x, u, aug) — `aug` is an
    arbitrary pytree of per-tick parameters (e.g. the RGP state whose mu_g
    was updated online), the analogue of acados' runtime parameter vector
    (`quad_opt.py:400-404`) except that here it is just a traced argument,
    so "re-specializing the controller" needs no rebuild (the reference's
    broken `retrain_controller`, `mpc_controller_node.py:410-426`, is free).
    """

    def __init__(self, cfg: MPCConfig, dynamics: Callable):
        self.cfg = cfg
        self.f = dynamics
        self._lin_pallas = None   # lazily-built Pallas linearize kernel
        self._fused_step = None   # lazily-built fused SQP-step kernel

    # ------------------------------------------------------------------ #
    def discrete_dynamics(self, x: jnp.ndarray, u: jnp.ndarray, dt, aug=None) -> jnp.ndarray:
        """Single RK4 step of the model — `quad_opt.discrete_dynamics`
        (`quad_opt.py:353-377`)."""
        f = lambda xx, uu: self.f(xx, uu, aug)
        k1 = f(x, u)
        k2 = f(x + dt / 2 * k1, u)
        k3 = f(x + dt / 2 * k2, u)
        k4 = f(x + dt * k3, u)
        return x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)

    # ------------------------------------------------------------------ #
    def _linearize(self, X: jnp.ndarray, U: jnp.ndarray, aug):
        """Per-node discretization + sensitivities along the warm-start
        trajectory: x+ = F(x, u), A = dF/dx, B = dF/du, defect r = F(x̄,ū) - x̄+."""
        cfg = self.cfg
        step = lambda x, u: self.discrete_dynamics(x, u, cfg.dt, aug)

        def node(x, u):
            xp = step(x, u)
            A = jax.jacfwd(step, argnums=0)(x, u)
            B = jax.jacfwd(step, argnums=1)(x, u)
            return xp, A, B

        xp, A, B = jax.vmap(node)(X[:-1], U)
        r = xp - X[1:]
        return A, B, r

    # ------------------------------------------------------------------ #
    def _condense(self, A, B, r, dx0):
        """Full condensing: Δx_k = M_k Δu + d_k with
        d_{k+1} = A_k d_k + r_k, M_{k+1} = A_k M_k + B_k E_k.
        Returns M: (N+1, nx, nz), d: (N+1, nx)."""
        N = self.cfg.n_nodes
        nx, nu = A.shape[-1], B.shape[-1]
        nz = N * nu
        dtype = A.dtype

        def body(carry, inp):
            M_k, d_k = carry
            A_k, B_k, r_k, k = inp
            # place B_k into columns [k*nu, (k+1)*nu) — static unroll over k
            E = jnp.zeros((nx, nz), dtype=dtype)
            E = jax.lax.dynamic_update_slice(E, B_k, (0, k * nu))
            M_next = A_k @ M_k + E
            d_next = A_k @ d_k + r_k
            return (M_next, d_next), (M_next, d_next)

        M0 = jnp.zeros((nx, nz), dtype=dtype)
        (_, _), (M_tail, d_tail) = jax.lax.scan(
            body, (M0, dx0), (A, B, r, jnp.arange(N))
        )
        M = jnp.concatenate([M0[None], M_tail], axis=0)
        d = jnp.concatenate([dx0[None], d_tail], axis=0)
        return M, d

    # ------------------------------------------------------------------ #
    def _resolve_qp_method(self, tiled: bool) -> str:
        """Effective QP backend for this (cfg, path) pair.

        "auto" dispatches on the measured crossover table (module constants
        above): the condensed pipelines below the crossover horizon, the
        O(N) Riccati backend above it — with different crossover points for
        the lanes-batched Pallas path (tiled=True, crossover N~18) and the
        per-scenario XLA path (crossover N~32).  An EXPLICIT "pdip" past the
        condensed kernels' VMEM ceiling (tiled, N > FUSED_N_MAX) falls back
        to "riccati" with a warning — the fused kernel's (N*nu)^2 VMEM tile
        cannot be scheduled there and the compile would die with an opaque
        Mosaic error (VERDICT r4 weak #1)."""
        m = self.cfg.qp_method
        N = self.cfg.n_nodes
        if m == "auto":
            lim = AUTO_RICCATI_MIN_N_TILED if tiled else AUTO_RICCATI_MIN_N_XLA
            return "pdip" if N < lim else "riccati"
        if m == "pdip" and tiled and N > FUSED_N_MAX:
            import warnings

            warnings.warn(
                f"qp_method='pdip' at n_nodes={N} exceeds the condensed "
                f"Pallas kernels' VMEM ceiling (N={FUSED_N_MAX}); using the "
                f"O(N) Riccati backend instead (qp_method='riccati' or "
                f"'auto' silences this).", stacklevel=3)
            return "riccati"
        return m

    # ------------------------------------------------------------------ #
    def _gn_step(self, X, U, zl, zu, x0, y_ref, y_ref_N, aug):
        """One Gauss-Newton iteration: linearize -> condense -> box QP -> update.
        (zl, zu) are the carried IPM duals (None = cold start / not carried);
        returns the post-solve duals alongside the updated trajectory."""
        cfg = self.cfg
        N = cfg.n_nodes
        nu = U.shape[-1]

        method = self._resolve_qp_method(tiled=False)
        if method == "riccati":
            Xn, Un, kkt = self._gn_step_riccati(X, U, x0, y_ref, y_ref_N, aug)
            return Xn, Un, zl, zu, kkt

        H, g, lb, ub, M, d = self._assemble(X, U, x0, y_ref, y_ref_N, aug)

        if method == "pdip":
            if cfg.warm_start_duals and zl is not None:
                z, zl, zu = solve_box_qp_pdip(H, g, lb, ub, iters=cfg.qp_iters,
                                              zl0=zl, zu0=zu, return_duals=True)
            else:
                z = solve_box_qp_pdip(H, g, lb, ub, iters=cfg.qp_iters)
        else:
            z = solve_box_qp_projected_newton(H, g, lb, ub, iters=cfg.qp_iters)

        from .qp import qp_kkt_residual

        kkt = qp_kkt_residual(H, g, lb, ub, z)

        U_new = U + z.reshape(N, nu)
        X_new = X + d + jnp.einsum("kxz,z->kx", M, z)
        return X_new, U_new, zl, zu, kkt

    # ------------------------------------------------------------------ #
    def solve(self, carry: SolverCarry, x0: jnp.ndarray, y_ref: jnp.ndarray,
              y_ref_N: jnp.ndarray, aug=None) -> tuple[SolverCarry, MPCSolution]:
        """One MPC solve (the `run_optimization` analogue, `quad_opt.py:321-350`).

        carry   : warm-started primal trajectory (RTI state)
        x0      : (13,) measured state (== the lbx=ubx=x0 pin)
        y_ref   : (N, 13) stage state references (`set_reference_trajectory`)
        y_ref_N : (13,) terminal reference
        aug     : per-tick model parameters (None | RGP state | GP state)
        Returns (next warm-start carry, solution).
        """
        cfg = self.cfg
        aug = _fold_aug(aug)
        X, U, zl, zu = carry.X, carry.U, carry.zl, carry.zu
        if cfg.shift_warm_start:
            X = jnp.concatenate([X[1:], X[-1:]], axis=0)
            U = jnp.concatenate([U[1:], U[-1:]], axis=0)
            if zl is not None:
                nu = U.shape[-1]
                zl = jnp.concatenate([zl[nu:], zl[-nu:]])
                zu = jnp.concatenate([zu[nu:], zu[-nu:]])

        def one_iter(carry_xu, _):
            X, U, zl, zu = carry_xu
            X, U, zl, zu, kkt = self._gn_step(X, U, zl, zu, x0, y_ref, y_ref_N, aug)
            return (X, U, zl, zu), kkt

        (X, U, zl, zu), kkts = jax.lax.scan(
            one_iter, (X, U, zl, zu), None, length=cfg.sqp_iters)

        cost = self.ls_cost(X, U, y_ref, y_ref_N)
        sol = MPCSolution(X=X, U=U, cost=cost, kkt_residual=kkts[-1])
        return SolverCarry(X=X, U=U, zl=zl, zu=zu), sol

    # ------------------------------------------------------------------ #
    def _gn_step_riccati(self, X, U, x0, y_ref, y_ref_N, aug):
        """Gauss-Newton step via the sparse Riccati-factorized interior
        point (`ops/riccati.solve_ocp_box_riccati_ipm`) — O(N) per IPM
        iteration, for long horizons where condensing's dense N*nu QP gets
        expensive.  Box bounds are handled EXACTLY (each IPM Newton system
        is solved by a Riccati sweep with barrier-modified per-stage R_k —
        the same structure HPIPM exploits inside acados,
        `/root/reference/src/quad_opt.py:147-151`); the historical
        feedforward-clamping approximation and its +36% stall on saturated
        instances are gone (`tests/test_riccati.py` pins bound-active N=40
        agreement with the condensed IPM)."""
        from .riccati import solve_ocp_box_riccati_ipm

        cfg = self.cfg
        N = cfg.n_nodes
        nu = U.shape[-1]
        dtype = X.dtype

        q = cfg.q_diagonal().astype(dtype) * cfg.stage_scale
        rw = jnp.asarray(cfg.r_cost, dtype=dtype) * cfg.stage_scale
        p_term_diag = cfg.q_diagonal().astype(dtype) * cfg.terminal_cost

        A, B, r = self._linearize(X, U, aug)
        dx0 = x0 - X[0]

        # stage-k cost references x_k (k = 0..N-1); the k=0 state term is
        # constant w.r.t. the decisions (Δx_0 is pinned) and harmless
        q_lin = q[None, :] * (X[:-1] - y_ref)
        r_lin = rw[None, :] * (U - cfg.u_ref)
        p_term = p_term_diag * (X[N] - y_ref_N)

        dU, dX, _, _ = solve_ocp_box_riccati_ipm(
            A, B, r, q, q_lin, rw, r_lin, p_term_diag, p_term, dx0=dx0,
            u_lb=cfg.u_lb - U, u_ub=cfg.u_ub - U, iters=cfg.qp_iters,
        )
        return self._riccati_finish(U, x0, y_ref, y_ref_N, aug, dU)

    # ------------------------------------------------------------------ #
    def _riccati_finish(self, U, x0, y_ref, y_ref_N, aug, dU):
        """Globalization + honest KKT shared by the per-scenario and the
        batched (Pallas) Riccati backends.

        On long horizons a full Newton step from a stale linearization
        diverges (the LQR forward pass extrapolates far outside the
        linearization's validity).  Backtracking line search on the TRUE
        nonlinear-rollout cost, with the accepted trajectory taken from the
        nonlinear rollout (keeps the next linearization consistent).  Fixed
        candidate set -> vmap/scan friendly."""
        cfg = self.cfg
        dtype = U.dtype
        alphas = jnp.asarray([1.0, 0.5, 0.25, 0.1], dtype=dtype)

        def rollout(U_c):
            def body(x, u):
                xn = self.discrete_dynamics(x, u, cfg.dt, aug)
                return xn, xn
            _, Xs = jax.lax.scan(body, x0, U_c)
            return jnp.concatenate([x0[None], Xs], axis=0)

        def candidate(alpha):
            U_c = jnp.clip(U + alpha * dU, cfg.u_lb, cfg.u_ub)
            X_c = rollout(U_c)
            return U_c, X_c, self.ls_cost(X_c, U_c, y_ref, y_ref_N)

        U_cand, X_cand, costs = jax.vmap(candidate)(alphas)
        best = jnp.argmin(costs)
        U_best, X_best = U_cand[best], X_cand[best]

        # TRUE projected-gradient KKT residual of the nonlinear problem at the
        # accepted point: grad_U J(U) through the rollout (reverse-mode over
        # the N-step scan), projected onto the u box.  Stronger than the
        # condensed path's QP-subproblem residual — it measures stationarity
        # of the actual returned trajectory, which is the honest metric for a
        # backend whose line search may accept alpha < 1.
        grad_U = jax.grad(
            lambda Uc: self.ls_cost(rollout(Uc), Uc, y_ref, y_ref_N)
        )(U_best)
        proj = jnp.clip(U_best - grad_U, cfg.u_lb, cfg.u_ub) - U_best
        kkt = jnp.max(jnp.abs(proj))
        return X_best, U_best, kkt

    # ------------------------------------------------------------------ #
    def _assemble(self, X, U, x0, y_ref, y_ref_N, aug):
        """Linearize + condense + GN Hessian/gradient for ONE scenario —
        everything except the QP solve of `_gn_step` (shared by the batched
        Pallas path)."""
        A, B, r = self._linearize(X, U, aug)
        return self._cost_from_lin(X, U, x0, y_ref, y_ref_N, A, B, r)

    def _cost_from_lin(self, X, U, x0, y_ref, y_ref_N, A, B, r):
        """Condensing + GN Hessian/gradient from precomputed sensitivities —
        the linearization-independent tail of `_assemble` (shared with the
        SoA batch path)."""
        cfg = self.cfg
        N = cfg.n_nodes
        nu = U.shape[-1]
        nz = N * nu
        dtype = X.dtype

        q = cfg.q_diagonal().astype(dtype) * cfg.stage_scale
        rw = jnp.asarray(cfg.r_cost, dtype=dtype) * cfg.stage_scale
        p = cfg.q_diagonal().astype(dtype) * cfg.terminal_cost

        dx0 = x0 - X[0]
        M, d = self._condense(A, B, r, dx0)

        ex = X + d - jnp.concatenate([y_ref, y_ref_N[None]], axis=0)
        eu = U - jnp.full_like(U, cfg.u_ref)

        Mx = M[:N]
        hp = jax.lax.Precision.HIGHEST
        H = jnp.einsum("kxi,x,kxj->ij", Mx, q, Mx, precision=hp) + jnp.einsum(
            "xi,x,xj->ij", M[N], p, M[N], precision=hp
        )
        H = H + jnp.kron(jnp.eye(N, dtype=dtype), jnp.diag(rw))
        # f32 MXU accumulation leaves H asymmetric by ~1e-3 relative; Cholesky
        # consumers that read full columns (the Pallas IPM kernel) need the
        # symmetric part explicitly (XLA's cholesky reads only the lower
        # triangle, which silently symmetrizes).
        H = 0.5 * (H + H.T)
        g = jnp.einsum("kxi,x,kx->i", Mx, q, ex[:N], precision=hp) + jnp.einsum(
            "xi,x,x->i", M[N], p, ex[N], precision=hp
        )
        g = g + (eu * rw).reshape(nz)

        lb = cfg.u_lb - U.reshape(nz)
        ub = cfg.u_ub - U.reshape(nz)
        return H, g, lb, ub, M, d

    def _assemble_batch_soa(self, X, U, x0, y_ref, y_ref_N, aug):
        """Batch assemble with the lane-major (SoA) linearization: the whole
        (B, N) node batch is flattened into the trailing lane axis of one
        RK4-sensitivity evaluation (`models/dynamics_soa.py`) instead of
        vmapping jacfwd per scenario (~5x on the linearize phase at B=4096)."""
        from ..models.augmented import FoldedDrag
        from ..models.dynamics_soa import linearize_rk4_soa

        cfg = self.cfg
        N = cfg.n_nodes
        B = X.shape[0]

        aug_cols = None
        if aug is not None:
            # per-scenario model leaves -> trailing flattened (B*N) columns
            def cols(a):
                a = jnp.moveaxis(a, 0, -1)                       # (..., B)
                a = jnp.broadcast_to(a[..., None], a.shape + (N,))
                return a.reshape(a.shape[:-2] + (B * N,))

            aug_cols = FoldedDrag(*(cols(leaf) for leaf in aug))

        Xl = X[:, :-1].reshape(B * N, 13)
        Ul = U.reshape(B * N, 4)
        if getattr(self.f, "params", None) is not None:
            # fused-in-VMEM Pallas linearization (interpret mode off-TPU)
            if self._lin_pallas is None:
                from .pallas.lin_kernel import make_linearizer_pallas

                self._lin_pallas = make_linearizer_pallas(self.f.params, cfg.dt)
            xp, A, Bm = self._lin_pallas(
                Xl, Ul, aug_cols, interpret=_interpret_mode()
            )
            xp = xp.reshape(B * N, 13)
        else:
            xp, A, Bm = linearize_rk4_soa(self.f.soa, Xl, Ul, cfg.dt, aug_cols)
        nu = U.shape[-1]
        nz = N * nu
        A = A.reshape(B, N, 13, 13)
        Bm = Bm.reshape(B, N, 13, nu)
        r = xp.reshape(B, N, 13) - X[:, 1:]

        # condensing + GN cost in the lanes-batched Pallas kernel
        from .pallas.condense_kernel import condense_cost_pallas

        q_stage, q_term, rw_t = cfg.weight_tuples()
        ex0 = X - jnp.concatenate([y_ref, y_ref_N[:, None]], axis=1)
        interpret = _interpret_mode()
        H, g, M, d = condense_cost_pallas(
            A, Bm, r, x0 - X[:, 0], ex0, q=q_stage, p=q_term, rw=rw_t,
            interpret=interpret,
        )
        rw = jnp.asarray(cfg.r_cost, dtype=X.dtype) * cfg.stage_scale
        g = g + ((U - cfg.u_ref) * rw).reshape(B, nz)
        lb = jnp.broadcast_to(cfg.u_lb - U.reshape(B, nz), (B, nz))
        ub = jnp.broadcast_to(cfg.u_ub - U.reshape(B, nz), (B, nz))
        return H, g, lb, ub, M, d

    def _gn_step_batch_tiled(self, X, U, zl, zu, x0, y_ref, y_ref_N, aug):
        """One batched Gauss-Newton step with ZERO layout changes between the
        Pallas stages: the lin kernel's raw tangent tiles feed the condense
        kernel column-wise, whose H/g tiles feed the QP kernel, all in the
        lanes-last (…, 128) layout.  The 26-92 MB lane-crossing transposes of
        A/B, H and the condensing map M — which dominated the phase-split
        pipeline — never happen; only the small (B, N, 13) boundary arrays
        are retiled.  Requires B % 128 == 0."""
        from ..models.augmented import FoldedDrag
        from .pallas.condense_kernel import condense_cost_from_J_tiled
        from .pallas.qp_kernel import solve_box_qp_pdip_pallas_tiled

        cfg = self.cfg
        N = cfg.n_nodes
        B = X.shape[0]
        nu = U.shape[-1]
        nz = N * nu
        ntb = B // 128
        dtype = X.dtype
        interp = _interpret_mode()

        if self._lin_pallas is None:
            from .pallas.lin_kernel import make_linearizer_pallas

            self._lin_pallas = make_linearizer_pallas(self.f.params, cfg.dt)

        # n-major flatten (column = n*B + b) so each lane tile is one
        # scenario block for a fixed stage
        Xl = X[:, :-1].transpose(1, 0, 2).reshape(N * B, 13)
        Ul = U.transpose(1, 0, 2).reshape(N * B, nu)
        aug_cols = None
        if aug is not None:
            def cols(a):
                a = jnp.moveaxis(a, 0, -1)                       # (..., B)
                base = a.shape[:-1]
                a = jnp.broadcast_to(a[..., None, :], base + (N, B))
                return a.reshape(base + (N * B,))                # col = n*B + b

            aug_cols = FoldedDrag(*(cols(leaf) for leaf in aug))

        xp_t, J_t = self._lin_pallas(Xl, Ul, aug_cols, interpret=interp,
                                     tiled_out=True)
        # tile index t = n*ntb + tb -> regroup to scenario-major tiles; the
        # inner (13, 128) blocks stay contiguous (cheap leading-dim transpose)
        J_t = J_t.reshape(N, ntb, 17, 13, 128).transpose(1, 0, 2, 3, 4)
        xp_t = xp_t.reshape(N, ntb, 13, 128).transpose(1, 0, 2, 3)

        def tile(a):
            """(B, ...) -> (ntb, ..., 128)"""
            a = a.reshape((ntb, 128) + a.shape[1:])
            return jnp.moveaxis(a, 1, -1)

        def untile(at):
            """(ntb, ..., 128) -> (B, ...)"""
            return jnp.moveaxis(at, -1, 1).reshape((B,) + at.shape[1:-1])

        X_t = tile(X)                                            # (ntb, N+1, 13, L)
        r_t = xp_t - X_t[:, 1:]
        ex0_t = X_t - tile(jnp.concatenate([y_ref, y_ref_N[:, None]], axis=1))
        dx0_t = tile(x0 - X[:, 0])                               # (ntb, 13, L)

        q_s, q_term, rw_s = cfg.weight_tuples()
        Ht, gt, Mt, dt_ = condense_cost_from_J_tiled(
            J_t, r_t, dx0_t, ex0_t, q=q_s, p=q_term, rw=rw_s, nu=nu,
            interpret=interp,
        )

        Uf_t = tile(U.reshape(B, nz))                            # (ntb, nz, L)
        rw = jnp.tile(jnp.asarray(cfg.r_cost, dtype) * cfg.stage_scale, N)
        gt = gt + (Uf_t - cfg.u_ref) * rw[None, :, None]
        lbt = cfg.u_lb - Uf_t
        ubt = cfg.u_ub - Uf_t

        warm = cfg.warm_start_duals and zl is not None
        if warm:
            zt, zlt, zut = solve_box_qp_pdip_pallas_tiled(
                Ht, gt, lbt, ubt, iters=cfg.qp_iters, interpret=interp,
                zl0t=tile(zl), zu0t=tile(zu), return_duals=True)
            zl, zu = untile(zlt), untile(zut)
        else:
            zt = solve_box_qp_pdip_pallas_tiled(Ht, gt, lbt, ubt,
                                                iters=cfg.qp_iters,
                                                interpret=interp)

        # projected-gradient KKT residual, computed in the tiled layout
        grad_t = jnp.einsum("tijl,tjl->til", Ht, zt) + gt
        proj_t = jnp.clip(zt - grad_t, lbt, ubt) - zt
        kkt = jnp.max(jnp.abs(untile(proj_t)), axis=-1)          # (B,)

        U_new = U + untile(zt).reshape(B, N, nu)
        Xd_t = dt_ + jnp.einsum("tkxzl,tzl->tkxl", Mt, zt)
        X_new = X + untile(Xd_t)
        return X_new, U_new, zl, zu, kkt

    def _gn_step_batch_fused(self, X, U, zl, zu, x0, y_ref, y_ref_N, aug):
        """One batched Gauss-Newton step as ONE fused Pallas kernel
        (`ops/pallas/sqp_fused_kernel.py`): linearization, condensing, the
        interior-point box QP, the KKT residual and the dX = Mz + d expansion
        all stay in VMEM per 128-scenario tile — no H/M/J HBM round-trips
        between phases (the split pipeline spent ~40% of the step there).
        Requires B % 128 == 0."""
        from .pallas.sqp_fused_kernel import make_fused_sqp_step

        cfg = self.cfg
        N = cfg.n_nodes
        B = X.shape[0]
        nu = U.shape[-1]
        nz = N * nu
        ntb = B // 128
        dtype = X.dtype
        interp = _interpret_mode()

        if self._fused_step is None:
            self._fused_step = make_fused_sqp_step(self.f.params, cfg.dt)

        def tile(a):
            a = a.reshape((ntb, 128) + a.shape[1:])
            return jnp.moveaxis(a, 1, -1)

        def untile(at):
            return jnp.moveaxis(at, -1, 1).reshape((B,) + at.shape[1:-1])

        X_t = tile(X)                                    # (ntb, N+1, 13, L)
        U_t = tile(U)                                    # (ntb, N, nu, L)
        ex0_t = X_t - tile(jnp.concatenate([y_ref, y_ref_N[:, None]], axis=1))
        dx0_t = tile(x0 - X[:, 0])
        Uf_t = tile(U.reshape(B, nz))
        rw_full = jnp.tile(jnp.asarray(cfg.r_cost, dtype) * cfg.stage_scale, N)
        gu_t = (Uf_t - cfg.u_ref) * rw_full[None, :, None]
        lbt = cfg.u_lb - Uf_t
        ubt = cfg.u_ub - Uf_t
        # the folded drag is per SCENARIO here — no N-stage broadcast
        aug_leaves = tuple(tile(leaf) for leaf in aug) if aug is not None else None

        warm = cfg.warm_start_duals and zl is not None
        duals = (tile(zl), tile(zu)) if warm else None

        q_s, q_term, rw_s = cfg.weight_tuples()
        zt, Xd_t, kkt_t, zlt, zut = self._fused_step(
            X_t, U_t, dx0_t, ex0_t, gu_t, lbt, ubt, aug_leaves,
            q_s, q_term, rw_s, cfg.qp_iters, interpret=interp, duals=duals)
        if warm:
            zl, zu = untile(zlt), untile(zut)

        U_new = U + untile(zt).reshape(B, N, nu)
        X_new = X + untile(Xd_t)
        kkt = untile(kkt_t)[:, 0]
        return X_new, U_new, zl, zu, kkt

    def _gn_step_batch_hybrid(self, X, U, zl, zu, x0, y_ref, y_ref_N, aug):
        """One batched Gauss-Newton step as lin kernel + ONE J-fed fused
        kernel (condense + IPM QP + KKT + dX expansion).  The round-4 probe
        (outputs/roofline/ROOFLINE.md) measured the all-in-one fused
        kernel's in-body linearization at ~7.4 ms/call at B=16384 vs
        2.08 ms for the standalone lin kernel — the condensing state's
        VMEM/register pressure wrecks the lin phase.  This pipeline pays
        one J round-trip through HBM (~1.1 MB/tile) to keep both phases at
        standalone efficiency; H and the condensing map still never leave
        VMEM/SSA.  Numerics bitwise == fused/split (shared kernel bodies;
        tests/test_pipeline_equivalence.py)."""
        from ..models.augmented import FoldedDrag
        from .pallas.sqp_fused_kernel import fused_sqp_from_J

        cfg = self.cfg
        N = cfg.n_nodes
        B = X.shape[0]
        nu = U.shape[-1]
        nz = N * nu
        ntb = B // 128
        dtype = X.dtype
        interp = _interpret_mode()

        if self._lin_pallas is None:
            from .pallas.lin_kernel import make_linearizer_pallas

            self._lin_pallas = make_linearizer_pallas(self.f.params, cfg.dt)

        Xl = X[:, :-1].transpose(1, 0, 2).reshape(N * B, 13)
        Ul = U.transpose(1, 0, 2).reshape(N * B, nu)
        aug_cols = None
        if aug is not None:
            # per-SCENARIO leaves, trailing B: every stage tile of a
            # scenario block reads the same aug tile via the kernel's input
            # BlockSpec index map — no (3, nb, N*B) broadcast materialized
            aug_cols = FoldedDrag(*(jnp.moveaxis(leaf, 0, -1) for leaf in aug))

        # the lin kernel writes its tiles scenario-major directly
        # (out_layout BlockSpec index map) — no HBM regroup copy
        xp_t, J_t = self._lin_pallas(Xl, Ul, aug_cols, interpret=interp,
                                     tiled_out=True, out_layout=(N, ntb),
                                     aug_per_scenario=True)
        J_t = J_t.reshape(ntb, N, 17, 13, 128)
        xp_t = xp_t.reshape(ntb, N, 13, 128)

        def tile(a):
            a = a.reshape((ntb, 128) + a.shape[1:])
            return jnp.moveaxis(a, 1, -1)

        def untile(at):
            return jnp.moveaxis(at, -1, 1).reshape((B,) + at.shape[1:-1])

        X_t = tile(X)
        r_t = xp_t - X_t[:, 1:]
        ex0_t = X_t - tile(jnp.concatenate([y_ref, y_ref_N[:, None]], axis=1))
        dx0_t = tile(x0 - X[:, 0])

        Uf_t = tile(U.reshape(B, nz))
        rw_full = jnp.tile(jnp.asarray(cfg.r_cost, dtype) * cfg.stage_scale, N)
        gu_t = (Uf_t - cfg.u_ref) * rw_full[None, :, None]
        lbt = cfg.u_lb - Uf_t
        ubt = cfg.u_ub - Uf_t

        warm = cfg.warm_start_duals and zl is not None
        duals = (tile(zl), tile(zu)) if warm else None

        q_s, q_term, rw_s = cfg.weight_tuples()
        zt, Xd_t, kkt_t, zlt, zut = fused_sqp_from_J(
            J_t, r_t, dx0_t, ex0_t, gu_t, lbt, ubt, duals,
            q_s, q_term, rw_s, cfg.qp_iters, interpret=interp)
        if warm:
            zl, zu = untile(zlt), untile(zut)

        U_new = U + untile(zt).reshape(B, N, nu)
        X_new = X + untile(Xd_t)
        kkt = untile(kkt_t)[:, 0]
        return X_new, U_new, zl, zu, kkt

    def _gn_step_batch_riccati(self, X, U, x0, y_ref, y_ref_N, aug):
        """Batched long-horizon Gauss-Newton step: Pallas lin kernel ->
        lanes-batched Riccati-IPM kernel (`ops/pallas/riccati_kernel.py`) ->
        per-scenario line search on the true rollout cost
        (`_riccati_finish`).  O(N) compute/memory in the horizon — no
        (N*nu)^2 condensed Hessian tile, so it scales to horizons where the
        fused condensed kernel exhausts VMEM (`bench.suite --what
        riccati_crossover` for the measured crossover).  Requires
        B % 128 == 0 (`solve_batch` pads)."""
        from ..models.augmented import FoldedDrag
        from .pallas.riccati_kernel import solve_ocp_box_riccati_ipm_pallas_tiled

        cfg = self.cfg
        N = cfg.n_nodes
        B = X.shape[0]
        nu = U.shape[-1]
        ntb = B // 128
        dtype = X.dtype
        interp = _interpret_mode()

        if self._lin_pallas is None:
            from .pallas.lin_kernel import make_linearizer_pallas

            self._lin_pallas = make_linearizer_pallas(self.f.params, cfg.dt)

        # n-major flatten (column = n*B + b), exactly as the tiled condensed
        # pipeline — the lin kernel's tangent tiles ARE the [A|B] columns the
        # Riccati kernel contracts over (zero repacking)
        Xl = X[:, :-1].transpose(1, 0, 2).reshape(N * B, 13)
        Ul = U.transpose(1, 0, 2).reshape(N * B, nu)
        aug_cols = None
        if aug is not None:
            # per-scenario aug tiles via the kernel's BlockSpec index map
            # (no N-stage broadcast) — see _gn_step_batch_hybrid
            aug_cols = FoldedDrag(*(jnp.moveaxis(leaf, 0, -1) for leaf in aug))

        xp_t, J_t = self._lin_pallas(Xl, Ul, aug_cols, interpret=interp,
                                     tiled_out=True, out_layout=(N, ntb),
                                     aug_per_scenario=True)
        J_t = J_t.reshape(ntb, N, 17, 13, 128)
        xp_t = xp_t.reshape(ntb, N, 13, 128)

        def tile(a):
            a = a.reshape((ntb, 128) + a.shape[1:])
            return jnp.moveaxis(a, 1, -1)

        def untile(at):
            return jnp.moveaxis(at, -1, 1).reshape((B,) + at.shape[1:-1])

        X_t = tile(X)
        c_t = xp_t - X_t[:, 1:]                                  # defects
        dx0_t = tile(x0 - X[:, 0])

        q_s, q_term, rw_s = cfg.weight_tuples()
        qv = jnp.asarray(q_s, dtype)
        rv = jnp.asarray(rw_s, dtype)
        pv = jnp.asarray(q_term, dtype)
        qlin_t = tile(qv[None, None, :] * (X[:, :-1] - y_ref))
        rlin_t = tile(rv[None, None, :] * (U - cfg.u_ref))
        plin_t = tile(pv[None, :] * (X[:, -1] - y_ref_N))
        lb_t = tile(cfg.u_lb - U)
        ub_t = tile(cfg.u_ub - U)

        dUt, _ = solve_ocp_box_riccati_ipm_pallas_tiled(
            J_t, c_t, dx0_t, qlin_t, rlin_t, plin_t, lb_t, ub_t,
            q=q_s, p_term=q_term, rdiag=rw_s, nu=nu, iters=cfg.qp_iters,
            interpret=interp)
        dU = untile(dUt)

        if aug is None:
            return jax.vmap(
                lambda U1, x01, yr, yrN, dU1: self._riccati_finish(
                    U1, x01, yr, yrN, None, dU1)
            )(U, x0, y_ref, y_ref_N, dU)
        return jax.vmap(
            lambda U1, x01, yr, yrN, a1, dU1: self._riccati_finish(
                U1, x01, yr, yrN, a1, dU1)
        )(U, x0, y_ref, y_ref_N, aug, dU)

    def solve_batch(self, carry: SolverCarry, x0: jnp.ndarray, y_ref: jnp.ndarray,
                    y_ref_N: jnp.ndarray, aug=None) -> tuple[SolverCarry, MPCSolution]:
        """Batch-major solve: all leading dims are the scenario batch B.

        Linearization/condensing is vmapped; the condensed QPs are solved by
        the Pallas lanes-batched IPM kernel (`ops/pallas/qp_kernel.py`) —
        ~15x faster than vmapped XLA Cholesky at B=4096 on v5e.  Numerics
        match `solve` (same algorithm, same iteration counts).
        """
        import jax as _jax

        from .pallas.qp_kernel import solve_box_qp_pdip_pallas
        from .qp import qp_kkt_residual

        cfg = self.cfg
        aug = _fold_aug(aug)
        N = cfg.n_nodes
        Bsz, _, nu = carry.U.shape
        nz = N * nu

        from ..models.augmented import FoldedDrag

        use_soa = getattr(self.f, "soa", None) is not None and (
            aug is None or isinstance(aug, FoldedDrag)
        )

        # Large batches take the zero-relayout tiled pipeline; non-multiples
        # of the 128-lane tile are padded with replicas of scenario 0 and
        # sliced back after the solve (<= 127 wasted lanes).
        tiled = (use_soa and Bsz >= 128
                 and getattr(self.f, "params", None) is not None)
        B_orig = Bsz
        if tiled and Bsz % 128 != 0:
            Bp = ((Bsz + 127) // 128) * 128

            def pad(a):
                return jnp.concatenate(
                    [a, jnp.broadcast_to(a[:1], (Bp - Bsz,) + a.shape[1:])], axis=0
                )

            carry = jax.tree.map(pad, carry)
            x0, y_ref, y_ref_N = pad(x0), pad(y_ref), pad(y_ref_N)
            aug = jax.tree.map(pad, aug) if aug is not None else None
            Bsz = Bp

        X, U, zl, zu = carry.X, carry.U, carry.zl, carry.zu
        warm = cfg.warm_start_duals and zl is not None
        qp_method = self._resolve_qp_method(tiled=tiled)

        def one_iter(carry_xu, _):
            X, U, zl, zu = carry_xu
            if qp_method == "riccati":
                # long-horizon sparse backend: lanes-batched Riccati IPM
                # (Pallas) when the tiled pipeline conditions hold, vmapped
                # XLA-scan Riccati otherwise; IPM duals are not carried (the
                # Riccati path re-derives them per solve)
                if tiled:
                    Xn, Un, kkt = self._gn_step_batch_riccati(
                        X, U, x0, y_ref, y_ref_N, aug)
                elif aug is None:
                    Xn, Un, kkt = _jax.vmap(
                        lambda X1, U1, x01, yr, yrN: self._gn_step_riccati(
                            X1, U1, x01, yr, yrN, None)
                    )(X, U, x0, y_ref, y_ref_N)
                else:
                    Xn, Un, kkt = _jax.vmap(self._gn_step_riccati)(
                        X, U, x0, y_ref, y_ref_N, aug)
                return (Xn, Un, zl, zu), kkt
            if tiled:
                step = {"fused": self._gn_step_batch_fused,
                        "hybrid": self._gn_step_batch_hybrid,
                        "split": self._gn_step_batch_tiled}.get(
                            cfg.pipeline, self._gn_step_batch_tiled)
                X_new, U_new, zl, zu, kkt = step(X, U, zl, zu, x0, y_ref,
                                                 y_ref_N, aug)
                return (X_new, U_new, zl, zu), kkt
            if use_soa:
                H, g, lb, ub, M, d = self._assemble_batch_soa(X, U, x0, y_ref, y_ref_N, aug)
            elif aug is None:
                H, g, lb, ub, M, d = _jax.vmap(
                    lambda X, U, x0, yr, yrN: self._assemble(X, U, x0, yr, yrN, None)
                )(X, U, x0, y_ref, y_ref_N)
            else:
                H, g, lb, ub, M, d = _jax.vmap(self._assemble)(X, U, x0, y_ref, y_ref_N, aug)

            interpret = _interpret_mode()
            # H is symmetric already on both routes here: `_assemble` applies
            # 0.5*(H+Hᵀ) itself and the SoA condense kernel accumulates
            # symmetric outer products — skip the wrapper's re-symmetrization
            # so this path stays bitwise-identical to the tiled/fused
            # pipelines (see tests/test_pipeline_equivalence.py).
            if warm:
                z, zl, zu = solve_box_qp_pdip_pallas(
                    H, g, lb, ub, iters=cfg.qp_iters, interpret=interpret,
                    zl0=zl, zu0=zu, return_duals=True, symmetrize=False)
            else:
                z = solve_box_qp_pdip_pallas(H, g, lb, ub, iters=cfg.qp_iters,
                                             interpret=interpret,
                                             symmetrize=False)
            kkt = _jax.vmap(qp_kkt_residual)(H, g, lb, ub, z)
            U_new = U + z.reshape(Bsz, N, nu)
            X_new = X + d + jnp.einsum("bkxz,bz->bkx", M, z)
            return (X_new, U_new, zl, zu), kkt

        (X, U, zl, zu), kkts = jax.lax.scan(
            one_iter, (X, U, zl, zu), None, length=cfg.sqp_iters)

        cost = _jax.vmap(self.ls_cost)(X, U, y_ref, y_ref_N)
        if Bsz != B_orig:
            X, U, cost = X[:B_orig], U[:B_orig], cost[:B_orig]
            kkts = kkts[:, :B_orig]
            if zl is not None:
                zl, zu = zl[:B_orig], zu[:B_orig]
        sol = MPCSolution(X=X, U=U, cost=cost, kkt_residual=kkts[-1])
        return SolverCarry(X=X, U=U, zl=zl, zu=zu), sol

    # ------------------------------------------------------------------ #
    def ls_cost(self, X, U, y_ref, y_ref_N) -> jnp.ndarray:
        """LINEAR_LS cost value of a trajectory (acados `get_cost` analogue)."""
        cfg = self.cfg
        dtype = X.dtype
        q = cfg.q_diagonal().astype(dtype) * cfg.stage_scale
        rw = jnp.asarray(cfg.r_cost, dtype=dtype) * cfg.stage_scale
        p = cfg.q_diagonal().astype(dtype) * cfg.terminal_cost
        ex = X[:-1] - y_ref
        eu = U - cfg.u_ref
        eN = X[-1] - y_ref_N
        return 0.5 * (
            jnp.sum(ex**2 * q) + jnp.sum(eu**2 * rw) + jnp.sum(eN**2 * p)
        )
