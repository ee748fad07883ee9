"""Riccati-recursion LQR step — the long-horizon alternative to condensing.

Full condensing (the default path, matching acados FULL_CONDENSING_HPIPM at
the reference's N=10) scales O(N^2) in memory and O(N^3 nu^3) in the QP
factorization.  For long horizons the sparse form wins: one backward Riccati
sweep O(N (nx+nu)^3) and a forward rollout, both `lax.scan`s (SURVEY §5.7's
"scan-over-horizon Riccati" design note).

Box constraints are handled by clamping the feedforward at rollout time
(projected-LQR approximation — exact when no bound is active, conservative
otherwise).  Measured against the condensed IPM at full SQP convergence
(N=10, f64, hover->climb instances; `tests/test_riccati.py`):
  interior (0.3 m climb):       identical to 1e-13
  mildly active (0.5 m):        same active set, |du| < 1e-2, cost +0.16%
  heavily saturated (1.5 m):    stalls at cost +36% — truthfully reported
                                through the nonlinear projected-gradient
                                kkt_residual (see `sqp._gn_step_riccati`)
For bound-tight problems at small N use the condensed IPM path; this backend
targets long-horizon planning sweeps where bounds are rarely slammed.

Measured crossover (v5e-lite, B=256 vmapped `solve`, f32, warm chains;
`bench.suite --what riccati_crossover`): in the generic vmapped-XLA path the
Riccati backend is faster at EVERY horizon — 2.5x at the reference N=10
(33 us vs 80 us per solve), 3.9x at N=20, 12.8x at N=40, 14.9x at N=160.
The condensed path's production advantage at N=10 is its fused Pallas
pipeline (`solve_batch`, ~1.8 us/solve at B=4096), which only exists for the
condensed form; for horizons beyond the fused kernel's dims, Riccati is the
right backend from N=10 up.

Equations (standard time-varying LQR with affine terms):
    P_N = Q_N,  p_N = q_N
    K_k = (R + BᵀPB)^-1 Bᵀ(PA)
    k_k = (R + BᵀPB)^-1 (r + Bᵀ(P c + p))
    P_k = Q + AᵀPA - AᵀPB K_k
    p_k = q + Aᵀ(P c + p) - K_kᵀ(r + Bᵀ(P c + p))
with dynamics Δx' = A Δx + B Δu + c and stage cost
    1/2 Δxᵀ Q Δx + qᵀΔx + 1/2 ΔuᵀRΔu + rᵀΔu.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def riccati_step(A, B, c, Q_diag, q_lin, R_diag, r_lin, P_term_diag, p_term,
                 dx0=None, u_lb=None, u_ub=None):
    """Solve the time-varying affine LQR and return (dU, dX).

    A: (N, nx, nx), B: (N, nx, nu), c: (N, nx) defects
    Q_diag: (nx,) stage state weights, q_lin: (N, nx) stage linear terms
    R_diag: (nu,), r_lin: (N, nu)
    P_term_diag: (nx,), p_term: (nx,) terminal quadratic/linear terms
    dx0: (nx,) initial-state offset (x_measured - x̄_0); zeros if None
    u_lb/u_ub: (N, nu) bounds on du (None = unconstrained)
    """
    N, nx, nu = B.shape
    dtype = A.dtype
    Q = jnp.diag(Q_diag.astype(dtype))
    R = jnp.diag(R_diag.astype(dtype))

    def backward(carry, inp):
        P, p = carry
        A_k, B_k, c_k, q_k, r_k = inp
        PA = P @ A_k
        PB = P @ B_k
        Pc_p = P @ c_k + p
        G = R + B_k.T @ PB                      # (nu, nu)
        G = 0.5 * (G + G.T)
        K = jnp.linalg.solve(G, B_k.T @ PA)     # (nu, nx)
        kff = jnp.linalg.solve(G, r_k + B_k.T @ Pc_p)
        P_new = Q + A_k.T @ PA - A_k.T @ PB @ K
        P_new = 0.5 * (P_new + P_new.T)
        p_new = q_k + A_k.T @ Pc_p - K.T @ (r_k + B_k.T @ Pc_p)
        return (P_new, p_new), (K, kff)

    P_T = jnp.diag(P_term_diag.astype(dtype))
    (_, _), (Ks, ks) = jax.lax.scan(
        backward, (P_T, p_term),
        (A, B, c, q_lin, r_lin),
        reverse=True,
    )

    def forward(dx, inp):
        A_k, B_k, c_k, K_k, k_k, lb_k, ub_k = inp
        du = -K_k @ dx - k_k
        if u_lb is not None:
            du = jnp.clip(du, lb_k, ub_k)
        dx_next = A_k @ dx + B_k @ du + c_k
        return dx_next, (du, dx_next)

    lb = u_lb if u_lb is not None else jnp.zeros((N, nu), dtype)
    ub = u_ub if u_ub is not None else jnp.zeros((N, nu), dtype)
    dx0 = jnp.zeros((nx,), dtype) if dx0 is None else dx0.astype(dtype)
    _, (dU, dX_tail) = jax.lax.scan(forward, dx0, (A, B, c, Ks, ks, lb, ub))
    dX = jnp.concatenate([dx0[None], dX_tail], axis=0)
    return dU, dX
