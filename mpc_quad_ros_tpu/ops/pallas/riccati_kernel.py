"""Pallas TPU kernel: lanes-batched Riccati-factorized box-IPM (long horizons).

The batched counterpart of `ops/riccati.solve_ocp_box_riccati_ipm` — the
sparse-form QP backend whose Newton systems are solved EXACTLY by one
backward/forward Riccati sweep with barrier-modified per-stage control
Hessians (the structure HPIPM itself exploits inside acados; reference
`/root/reference/src/quad_opt.py:147-151`).  The condensed fused kernel
(`sqp_fused_kernel.py`) carries a dense (N*nu, N*nu, 128) Hessian tile in
VMEM and pays O((N*nu)^3/3) per IPM factorization — both explode with the
horizon (measured: 21.6 us/solve at N=40, VMEM-OOM compile failure by N=80
on v5e; `bench.suite --what riccati_crossover`,
outputs/roofline/CROSSOVER_r05.json).  This kernel keeps the OCP sparse:
per 128-lane
scenario tile it stores only the per-stage sensitivities (N, 17, nx, L) and
runs `iters` IPM iterations, each one Riccati sweep — O(N (nx+nu)^3) compute
and O(N) memory in the horizon.

Layout/design (same house rules as the other kernels here):

- the SCENARIO batch lives in the 128-wide lane axis; stage/state/control
  dims are sublane/outer dims, every contraction is an unrolled FMA sweep
  over (·, ·, 128) blocks;
- stage loops are `lax.fori_loop`s with DYNAMIC LEADING-DIM indexing into
  VMEM refs (J_ref[0, k], K_scr[k]) — the loop body is O(1) in N, so the
  kernel program size does not grow with the horizon (unlike the statically
  unrolled condensed kernels);
- the backward sweep works in a TRANSPOSED formulation: the lin kernel's
  tangent tile J[k, c] IS column c of [A_k | B_k], so A^T-products contract
  directly over those columns with zero repacking;
- all control flow is fixed-iteration, lane-masked (vmap/pjit friendly);
  P is re-symmetrized every stage (via the bitwise-exact transpose of the
  accumulated product — NOT a second FMA sweep, see the note at the G
  computation) to stop f32 asymmetry drift over long horizons.

Numerical oracle: `ops.riccati.solve_ocp_box_riccati_ipm` (same barrier
schedule mu = 0.1*gap, same fraction-to-the-boundary damping, same strictly
feasible primal iterate, same fixed iteration count) — pinned vs the f64
oracle in `tests/test_riccati_kernel.py` per the repo's
each-vs-f64-oracle comparison rule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_TILE = 128


def _riccati_ipm_kernel(J_ref, c_ref, dx0_ref, qlin_ref, rlin_ref, plin_ref,
                        lb_ref, ub_ref, du_out, dX_out,
                        K_scr, kff_scr, du_scr, ddu_scr, dX_scr, rhat_scr,
                        *, N: int, nx: int, nu: int, q: tuple, p_term: tuple,
                        rdiag: tuple, iters: int):
    """One tile = LANE_TILE scenarios, lanes-last.

    J: (1, N, nx+nu, nx, L) — J[0, k, c] is column c of [A_k | B_k];
    c: (1, N, nx, L) defects;  dx0: (1, nx, L);
    qlin: (1, N, nx, L) stage linear state cost;  rlin: (1, N, nu, L);
    plin: (1, nx, L) terminal linear term;  lb/ub: (1, N, nu, L) du bounds.
    Outputs: du (1, N, nu, L), dX (1, N+1, nx, L).
    Scratch (VMEM): K (N, nu, nx, L), kff/du/ddu/rhat (N, nu, L),
    dX (N+1, nx, L).
    """
    dtype = J_ref.dtype
    L = LANE_TILE

    lb = lb_ref[0]                                     # (N, nu, L)
    ub = ub_ref[0]
    width = ub - lb

    # constant diagonal-weight masks (static floats -> hoisted constants)
    xi = jax.lax.broadcasted_iota(jnp.int32, (nx, nx, L), 0)
    xj = jax.lax.broadcasted_iota(jnp.int32, (nx, nx, L), 1)
    Qmat = jnp.zeros((nx, nx, L), dtype)
    Pmat_T = jnp.zeros((nx, nx, L), dtype)
    for i in range(nx):
        m = (xi == i) & (xj == i)
        Qmat = Qmat + jnp.where(m, q[i], 0.0).astype(dtype)
        Pmat_T = Pmat_T + jnp.where(m, p_term[i], 0.0).astype(dtype)
    gi = jax.lax.broadcasted_iota(jnp.int32, (nu, nu, L), 0)
    gj = jax.lax.broadcasted_iota(jnp.int32, (nu, nu, L), 1)
    gcol_i = jax.lax.broadcasted_iota(jnp.int32, (nu, L), 0)

    n_all = 2 * N * nu

    def rollout(du_full, X_out_ref=None):
        """dX_scr <- affine rollout of du with defects; optionally mirrored
        into the dX output ref."""
        dx0 = dx0_ref[0]
        dX_scr[0] = dx0
        if X_out_ref is not None:
            X_out_ref[0, 0] = dx0
        du_scr[:] = du_full

        def fwd(k, dx):
            Jk = J_ref[0, k]                           # (nx+nu, nx, L)
            duk = du_scr[k]                            # (nu, L)
            dxn = c_ref[0, k]
            for j in range(nx):
                dxn = dxn + Jk[j] * dx[j][None, :]
            for a in range(nu):
                dxn = dxn + Jk[nx + a] * duk[a][None, :]
            dX_scr[k + 1] = dxn
            if X_out_ref is not None:
                X_out_ref[0, k + 1] = dxn
            return dxn

        jax.lax.fori_loop(0, N, fwd, dx0)

    def backward(i, Pp):
        """One reverse stage of the barrier-modified Riccati sweep; the
        fori runs i = 0..N-1 with k = N-1-i."""
        P, p = Pp
        k = N - 1 - i
        Jk = J_ref[0, k]                               # (nx+nu, nx, L)

        # Wt = A^T P  (Wt[c, i'] = (PA)[i', c]);  Vt = B^T P
        Wt = jnp.zeros((nx, nx, L), dtype)
        Vt = jnp.zeros((nu, nx, L), dtype)
        for j in range(nx):
            Pj = P[j]                                  # (nx, L)
            Wt = Wt + Jk[:nx, j][:, None, :] * Pj[None, :, :]
            Vt = Vt + Jk[nx:, j][:, None, :] * Pj[None, :, :]

        # G = sym(B^T P B) + diag(rdiag + barrier d_k).  The second product
        # order is the EXACT transpose of the first (IEEE multiplication
        # commutes bitwise and the j-accumulation order matches), so
        # symmetrize with a swapaxes instead of a second FMA sweep —
        # bitwise-identical at ~half the FLOPs (same below for T and U2;
        # the (d0,d1,L) transpose measured free, bench/probe_hybrid).
        G = jnp.zeros((nu, nu, L), dtype)
        S = jnp.zeros((nu, nx, L), dtype)
        for j in range(nx):
            Bj = Jk[nx:, j]                            # (nu, L) = Bt[:, j]
            Vj = Vt[:, j]                              # (nu, L)
            Wj = Wt[:, j]                              # (nx, L)
            G = G + Bj[:, None, :] * Vj[None, :, :]
            S = S + Bj[:, None, :] * Wj[None, :, :]    # S = B^T P A
        G = 0.5 * (G + jnp.swapaxes(G, 0, 1))
        dk = dbar_scr_read(k)                          # barrier diagonal
        for a in range(nu):
            G = G + jnp.where((gi == a) & (gj == a),
                              rdiag[a] + dk[a][None, :], 0.0).astype(dtype)

        # 4x4 lane-batched Cholesky of G + joint solve for [K | kff]
        rhs2 = rhat_scr[k]                             # r_hat_k
        pvec = p
        for j in range(nx):
            rhs2 = rhs2 + Jk[nx:, j] * pvec[j][None, :]    # + B^T p
        RHS = jnp.concatenate([S, rhs2[:, None, :]], axis=1)   # (nu, nx+1, L)

        gcols = []
        gdiags = []
        for jc in range(nu):
            colA = G[:, jc, :]                         # (nu, L)
            for kk in range(jc):
                colA = colA - gcols[kk] * gcols[kk][jc][None, :]
            dg = jnp.sqrt(jnp.maximum(colA[jc], 1e-12))
            col = jnp.where(gcol_i > jc, colA / dg[None, :],
                            jnp.where(gcol_i == jc, dg[None, :], 0.0))
            gcols.append(col)
            gdiags.append(dg)
        Ys = []
        for jc in range(nu):                           # fwd: Lg Y = RHS
            yj = RHS[jc]
            for kk in range(jc):
                yj = yj - gcols[kk][jc][None, :] * Ys[kk]
            Ys.append(yj / gdiags[jc][None, :])
        Zs = [None] * nu
        for jc in range(nu - 1, -1, -1):               # back: Lg^T Z = Y
            zj = Ys[jc]
            for kk in range(jc + 1, nu):
                zj = zj - gcols[jc][kk][None, :] * Zs[kk]
            Zs[jc] = zj / gdiags[jc][None, :]
        K = jnp.stack([Zs[a][:nx] for a in range(nu)], axis=0)   # (nu, nx, L)
        kff = jnp.stack([Zs[a][nx] for a in range(nu)], axis=0)  # (nu, L)
        K_scr[k] = K
        kff_scr[k] = kff

        # P' = Q + sym(A^T P A) - sym(S^T K);  p' = q_hat + A^T p - K^T rhs2
        # (sym via bitwise-exact transpose — see the G note above)
        T = jnp.zeros((nx, nx, L), dtype)
        for j in range(nx):
            Aj = Jk[:nx, j]                            # (nx, L) = At[:, j]
            Wj = Wt[:, j]
            T = T + Aj[:, None, :] * Wj[None, :, :]    # A^T P A
        U2 = jnp.zeros((nx, nx, L), dtype)
        for a in range(nu):
            U2 = U2 + S[a][:, None, :] * K[a][None, :, :]   # S^T K
        P_new = Qmat + 0.5 * (T + jnp.swapaxes(T, 0, 1)) \
            - 0.5 * (U2 + jnp.swapaxes(U2, 0, 1))

        dxk = dX_scr[k]
        qhat = jnp.stack([q[i2] * dxk[i2] for i2 in range(nx)], axis=0) \
            + qlin_ref[0, k]
        p_new = qhat
        for j in range(nx):
            p_new = p_new + Jk[:nx, j] * pvec[j][None, :]   # + A^T p
        for a in range(nu):
            p_new = p_new - K[a] * rhs2[a][None, :]         # - K^T rhs2
        return (P_new, p_new)

    # barrier diagonal lives in ddu_scr between the prep pass and the
    # backward sweep (ddu is only produced afterwards) — a small scratch
    # reuse that keeps VMEM at 6 scratch arrays
    def dbar_scr_read(k):
        return ddu_scr[k]

    def ipm_iter(_, carry):
        du, sl, su, zl, zu = carry                     # all (N, nu, L)

        # chained single-axis reductions (multi-axis reduce is fragile in
        # Mosaic over non-lane dims)
        gap = (jnp.sum(jnp.sum(sl * zl, axis=0), axis=0)
               + jnp.sum(jnp.sum(su * zu, axis=0), axis=0)) / n_all   # (L,)
        mu3 = (0.1 * gap)[None, None, :]

        rollout(du)                                    # dX_scr <- rollout(du)

        # barrier-modified control diagonal + IPM-corrected control gradient
        dbar = zl / sl + zu / su
        # rdiag*du via static per-control scaling (rdiag are Python floats)
        ru = jnp.concatenate(
            [du[:, a:a + 1, :] * rdiag[a] for a in range(nu)], axis=1)
        rhat = ru + rlin_ref[0] - zl + zu \
            - (mu3 - sl * zl) / sl + (mu3 - su * zu) / su
        rhat_scr[:] = rhat
        ddu_scr[:] = dbar                              # read as dbar_scr_read

        # terminal boundary
        dxN = dX_scr[N]
        p_init = jnp.stack([p_term[i2] * dxN[i2] for i2 in range(nx)], axis=0) \
            + plin_ref[0]

        jax.lax.fori_loop(0, N, backward, (Pmat_T, p_init))

        # forward Newton rollout (zero defects, ddx_0 = 0)
        def fwdN(k, ddx):
            Jk = J_ref[0, k]
            Kk = K_scr[k]                              # (nu, nx, L)
            dduk = -kff_scr[k]
            for j in range(nx):
                dduk = dduk - Kk[:, j] * ddx[j][None, :]
            ddu_scr[k] = dduk
            ddxn = jnp.zeros((nx, L), dtype)
            for j in range(nx):
                ddxn = ddxn + Jk[j] * ddx[j][None, :]
            for a in range(nu):
                ddxn = ddxn + Jk[nx + a] * dduk[a][None, :]
            return ddxn

        jax.lax.fori_loop(0, N, fwdN, jnp.zeros((nx, L), dtype))
        ddu = ddu_scr[:]                               # (N, nu, L)

        dzl = (mu3 - sl * zl - zl * ddu) / sl
        dzu = (mu3 - su * zu + zu * ddu) / su

        def max_step(v, dv):
            ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0),
                              jnp.inf)
            return jnp.minimum(
                1.0, 0.995 * jnp.min(jnp.min(ratio, axis=0), axis=0))

        alpha = jnp.minimum(
            jnp.minimum(max_step(sl, ddu), max_step(su, -ddu)),
            jnp.minimum(max_step(zl, dzl), max_step(zu, dzu)),
        )[None, None, :]

        du = du + alpha * ddu
        sl = du - lb
        su = ub - du
        eps = 1e-10 * jnp.maximum(width, 1.0)
        sl = jnp.maximum(sl, eps)
        su = jnp.maximum(su, eps)
        zl = jnp.maximum(zl + alpha * dzl, 1e-12)
        zu = jnp.maximum(zu + alpha * dzu, 1e-12)
        return (du, sl, su, zl, zu)

    # strictly interior cold start — mirrors the oracle exactly
    du = 0.5 * (lb + ub)
    zl = jnp.ones_like(du)
    zu = jnp.ones_like(du)
    sl = du - lb
    su = ub - du

    du, sl, su, zl, zu = jax.lax.fori_loop(
        0, iters, ipm_iter, (du, sl, su, zl, zu))

    du = jnp.clip(du, lb, ub)
    du_out[0] = du
    rollout(du, X_out_ref=dX_out)


@functools.partial(jax.jit, static_argnames=("q", "p_term", "rdiag", "nu",
                                             "iters", "interpret"))
def solve_ocp_box_riccati_ipm_pallas_tiled(Jt, ct, dx0t, qlint, rlint, plint,
                                           lbt, ubt, q: tuple, p_term: tuple,
                                           rdiag: tuple, nu: int = 4,
                                           iters: int = 12,
                                           interpret: bool = False):
    """Tiled lanes-last entry (zero-relayout from the lin kernel's tangent
    tiles).  Jt: (nt, N, nx+nu, nx, L); ct (defects): (nt, N, nx, L);
    dx0t: (nt, nx, L); qlint: (nt, N, nx, L); rlint: (nt, N, nu, L);
    plint: (nt, nx, L); lbt/ubt: (nt, N, nu, L).  q/p_term/rdiag are static
    per-dim weight tuples.  Returns (dUt (nt, N, nu, L),
    dXt (nt, N+1, nx, L))."""
    nt, N, NTAN, nx, L = Jt.shape
    dtype = Jt.dtype
    assert NTAN == nx + nu

    kernel = functools.partial(_riccati_ipm_kernel, N=N, nx=nx, nu=nu,
                               q=tuple(q), p_term=tuple(p_term),
                               rdiag=tuple(rdiag), iters=iters)

    def spec(shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape, lambda i: (i,) + (0,) * nd,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            spec((N, NTAN, nx, LANE_TILE)),
            spec((N, nx, LANE_TILE)),
            spec((nx, LANE_TILE)),
            spec((N, nx, LANE_TILE)),
            spec((N, nu, LANE_TILE)),
            spec((nx, LANE_TILE)),
            spec((N, nu, LANE_TILE)),
            spec((N, nu, LANE_TILE)),
        ],
        out_specs=(spec((N, nu, LANE_TILE)), spec((N + 1, nx, LANE_TILE))),
        out_shape=(
            jax.ShapeDtypeStruct((nt, N, nu, LANE_TILE), dtype),
            jax.ShapeDtypeStruct((nt, N + 1, nx, LANE_TILE), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((N, nu, nx, LANE_TILE), dtype),      # K
            pltpu.VMEM((N, nu, LANE_TILE), dtype),          # kff
            pltpu.VMEM((N, nu, LANE_TILE), dtype),          # du
            pltpu.VMEM((N, nu, LANE_TILE), dtype),          # ddu / dbar
            pltpu.VMEM((N + 1, nx, LANE_TILE), dtype),      # dX
            pltpu.VMEM((N, nu, LANE_TILE), dtype),          # rhat
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024)
        ),
        interpret=interpret,
    )(Jt, ct, dx0t, qlint, rlint, plint, lbt, ubt)
