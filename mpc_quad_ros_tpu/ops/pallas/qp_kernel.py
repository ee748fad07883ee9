"""Pallas TPU kernel: lanes-batched box-QP primal-dual interior point.

The HPIPM-replacement hot path.  XLA's batched `cholesky` on (B, 40, 40)
problems costs ~20 ms per factorization at B=4096 on v5e — 12 IPM iterations
made the QP ~90% of the MPC solve.  This kernel flips the layout: the BATCH
dimension lives in the 128-wide lane axis, so one kernel instance solves 128
QPs simultaneously, the Cholesky/triangular recurrences run sequentially over
the tiny nz(=40) problem dimension, and every arithmetic op vectorises across
lanes and sublanes.  The whole IPM — factorization, two triangular solves,
fraction-to-the-boundary, barrier update — stays fused in VMEM with no HBM
round-trips between iterations.

All row/column addressing is done with masked full-array selects/updates
(broadcasted_iota comparisons) — no dynamic sublane indexing, which TPU
Mosaic does not support efficiently.

Same algorithm and iteration count as `ops.qp.solve_box_qp_pdip`, which is
the numerical oracle in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_TILE = 128


WS_GAMMA = 0.01   # warm-start primal interiority margin (fraction of width)
WS_FLOOR = 1e-3   # warm-start dual floor (in the Jacobi-scaled system)


def ipm_box_solve(H, g, lb, ub, zl0, zu0, *, nz: int, iters: int,
                  warm: bool, panel: int = 8):
    """The lanes-batched box-QP primal-dual IPM core, shared VERBATIM by the
    three Pallas consumers (`_qp_kernel` here, the fully-fused and the
    J-fed fused SQP kernels in `sqp_fused_kernel.py`) — one definition is
    what keeps the pipelines bitwise-identical
    (tests/test_pipeline_equivalence.py).

    All operands lanes-last: H (nz, nz, L), vectors (nz, L).  Includes the
    Jacobi scaling (s = diag(H)^-1/2), the cold/warm start, `iters` fixed
    IPM iterations with the shrinking panel Cholesky + panel-live
    substitutions, and the unscaling.  Returns (z, zl, zu) in the ORIGINAL
    (unscaled) system.

    warm: zl0/zu0 carry the previous tick's duals; the primal starts at 0
    pushed into the box instead of the midpoint (the RTI update re-centres
    the QP at z = 0, see `ops/qp.py`).
    """
    dtype = H.dtype

    # index grids
    r3 = jax.lax.broadcasted_iota(jnp.int32, (nz, nz, LANE_TILE), 0)      # dim-0 idx
    k3 = jax.lax.broadcasted_iota(jnp.int32, (nz, nz, LANE_TILE), 1)      # dim-1 idx

    # Jacobi scaling in VMEM: with s = diag(H)^-1/2 solve in z' = z/s over
    # H' = s H s (unit diagonal) — keeps f32 pivots well-conditioned without
    # an extra HBM pass over H in the wrapper
    dH = jnp.sum(jnp.where(r3 == k3, H, 0.0), axis=1)                     # (nz, L)
    s = jax.lax.rsqrt(jnp.maximum(dH, 1e-12))
    H = H * s[:, None, :] * s[None, :, :]
    g = g * s
    lb = lb / s
    ub = ub / s
    width = ub - lb

    if warm:
        # duals live in the scaled system as zl' = zl * s (stationarity
        # s(Hz+g) - s zl + s zu = 0); floor keeps the first steps off the
        # central-path boundary
        z = jnp.clip(jnp.zeros_like(g), lb + WS_GAMMA * width,
                     ub - WS_GAMMA * width)
        zl = jnp.maximum(zl0 * s, WS_FLOOR)
        zu = jnp.maximum(zu0 * s, WS_FLOOR)
    else:
        z = 0.5 * (lb + ub)
        zl = jnp.ones_like(z)
        zu = jnp.ones_like(z)
    sl = z - lb
    su = ub - z

    PANEL = panel                  # panel width for the blocked Cholesky
    # (8 is the measured optimum at nz=40 — r05 probe swept {4, 8, 10, 20})
    n_panels = (nz + PANEL - 1) // PANEL

    def ipm_iter(_, carry):
        z, sl, su, zl, zu = carry

        gap = (jnp.sum(sl * zl, axis=0) + jnp.sum(su * zu, axis=0)) / (2 * nz)
        mu = (0.1 * gap)[None, :]                                  # (1, L)

        Hz = jnp.sum(H * z[None, :, :], axis=1)                    # (nz, L)
        r = Hz + g - zl + zu
        # one reciprocal per slack, multiplied everywhere after: VPU divides
        # are many-pass ops, ~an order costlier than FMAs — this cuts the
        # iteration's (nz, L) divides from 6 to 2 (bounded reassociation,
        # both Pallas pipelines changed in lockstep so fused == tiled stays
        # bitwise; tests/test_pipeline_equivalence.py)
        sl_inv = 1.0 / sl
        su_inv = 1.0 / su
        d = zl * sl_inv + zu * su_inv
        rhs = -r + (mu - sl * zl) * sl_inv - (mu - su * zu) * su_inv

        # ---- panel-blocked right-looking Cholesky of M = H + diag(d) ----
        # "Shrinking" formulation (round-3 roofline work): R holds only the
        # not-yet-factored trailing submatrix and shrinks in BOTH dims each
        # panel, so trailing updates are plain symmetric rank-1 FMAs on
        # (rem, rem, L) tiles — no (nz, rem, PANEL, L) 4D temporary, no
        # concatenate churn, and each panel's update touches only the live
        # rows (~half the FLOPs of full-height updates).  Columns are
        # zero-padded back to nz for the substitutions (one concat per
        # column).  Measured -21% on the standalone 12-iter kernel at
        # B=16384 on v5e-lite (8.58 -> 6.80 ms) vs the previous
        # stack/concatenate version; z agrees to one f32 ulp (the trailing
        # sum order changes).
        eye = jnp.where(r3 == k3, 1.0, 0.0).astype(dtype)
        A = H + eye * d[:, None, :]
        panel_data = []                            # (c0, pw, live pcols)
        diags = []                                 # 1/L[j, j], each (L,)
        R = A
        for t in range(n_panels):
            c0 = t * PANEL
            pw = min(PANEL, nz - c0)
            hh = nz - c0                           # live height of R
            i2h = jax.lax.broadcasted_iota(jnp.int32, (hh, LANE_TILE), 0)
            P = R[:, :pw, :]                       # (hh, pw, L) static slice
            pcols = []
            for jj in range(pw):
                colA = P[:, jj, :]                 # (hh, L); diagonal at row jj
                for kk in range(jj):               # left-looking within panel
                    colA = colA - pcols[kk] * pcols[kk][jj][None, :]
                # rsqrt + multiplies instead of sqrt + an (hh, L) divide —
                # the column scale and both substitutions reuse the
                # reciprocal diagonal (diag itself = colA[jj] * dinv)
                dinv = jax.lax.rsqrt(jnp.maximum(colA[jj], 1e-12))  # (L,)
                col = jnp.where(i2h > jj, colA * dinv[None, :],
                                jnp.where(i2h == jj,
                                          (colA[jj] * dinv)[None, :], 0.0))
                pcols.append(col)
                diags.append(dinv)
            panel_data.append((c0, pw, pcols))
            if t + 1 < n_panels:
                Rrest = R[pw:, pw:, :]             # (hh-pw, hh-pw, L)
                for pp in range(pw):
                    cp = pcols[pp][pw:]            # (hh-pw, L)
                    Rrest = Rrest - cp[:, None, :] * cp[None, :, :]
                R = Rrest

        # ---- forward substitution: L y = rhs, panel-live: the residual
        # shrinks with the live columns (solved rows are dropped), so no
        # full-height zero-padded columns and no masked sweeps exist at all
        # (~40% of the substitution FLOPs of the full-height form) ----
        ys = []
        res = rhs                                  # height nz - c0 at panel t
        for (c0, pw, pcols) in panel_data:
            for jj in range(pw):
                yj = res[jj] * diags[c0 + jj]      # (L,)
                ys.append(yj)
                res = res - pcols[jj] * yj[None, :]
            if res.shape[0] > pw:
                res = res[pw:]
        # ---- back substitution: L^T dz = y, reverse panel order; each
        # column's below-panel tail dots the already-solved dz block, the
        # within-panel part is a short scalar-row recurrence ----
        dz_tail = None                             # solved rows below panel
        for (c0, pw, pcols) in reversed(panel_data):
            tails = []
            for jj in range(pw):
                if dz_tail is None:
                    tails.append(jnp.zeros((LANE_TILE,), dtype))
                else:
                    tails.append(jnp.sum(pcols[jj][pw:] * dz_tail, axis=0))
            rows = [None] * pw
            for jj in range(pw - 1, -1, -1):
                dot = tails[jj]
                for kk in range(jj + 1, pw):
                    dot = dot + pcols[jj][kk] * rows[kk]
                rows[jj] = (ys[c0 + jj] - dot) * diags[c0 + jj]
            panel_dz = jnp.stack(rows, axis=0)     # (pw, L)
            dz_tail = panel_dz if dz_tail is None else jnp.concatenate(
                [panel_dz, dz_tail], axis=0)
        dz = dz_tail                               # (nz, L)

        # ---- dual steps + fraction-to-the-boundary ----
        dzl = (mu - sl * zl - zl * dz) * sl_inv
        dzu = (mu - su * zu + zu * dz) * su_inv

        def max_step(v, dv):
            ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
            return jnp.minimum(1.0, 0.995 * jnp.min(ratio, axis=0))

        alpha = jnp.minimum(
            jnp.minimum(max_step(sl, dz), max_step(su, -dz)),
            jnp.minimum(max_step(zl, dzl), max_step(zu, dzu)),
        )[None, :]

        z = z + alpha * dz
        sl = z - lb
        su = ub - z
        eps = 1e-10 * jnp.maximum(width, 1.0)
        sl = jnp.maximum(sl, eps)
        su = jnp.maximum(su, eps)
        zl = jnp.maximum(zl + alpha * dzl, 1e-12)
        zu = jnp.maximum(zu + alpha * dzu, 1e-12)
        return (z, sl, su, zl, zu)

    z, sl, su, zl, zu = jax.lax.fori_loop(0, iters, ipm_iter, (z, sl, su, zl, zu))
    return jnp.clip(z, lb, ub) * s, zl / s, zu / s    # undo the Jacobi scaling


def _qp_kernel(H_ref, g_ref, lb_ref, ub_ref, *refs, nz: int, iters: int,
               warm: bool):
    """Solve LANE_TILE box-QPs: refs are lanes-last.

    H_ref: (1, nz, nz, L);  g/lb/ub/z: (1, nz, L).
    warm: two extra (1, nz, L) inputs carry the previous tick's duals.
    The post-solve duals are always written to the two dual output refs.
    """
    if warm:
        zl0_ref, zu0_ref, z_ref, zlo_ref, zuo_ref = refs
        zl0, zu0 = zl0_ref[0], zu0_ref[0]
    else:
        z_ref, zlo_ref, zuo_ref = refs
        zl0 = zu0 = None
    z, zl, zu = ipm_box_solve(H_ref[0], g_ref[0], lb_ref[0], ub_ref[0],
                              zl0, zu0, nz=nz, iters=iters, warm=warm)
    z_ref[0] = z
    zlo_ref[0] = zl
    zuo_ref[0] = zu


@functools.partial(jax.jit, static_argnames=("iters", "interpret",
                                             "return_duals"))
def solve_box_qp_pdip_pallas_tiled(Ht: jnp.ndarray, gt: jnp.ndarray,
                                   lbt: jnp.ndarray, ubt: jnp.ndarray,
                                   iters: int = 12,
                                   interpret: bool = False,
                                   zl0t: jnp.ndarray | None = None,
                                   zu0t: jnp.ndarray | None = None,
                                   return_duals: bool = False):
    """Tiled-layout batched box-QP solve — the zero-relayout entry used by the
    all-Pallas SQP pipeline.  Ht: (nt, nz, nz, LANE), vectors (nt, nz, LANE);
    H must be symmetric (the condense kernel builds it so by construction);
    Jacobi scaling happens inside the kernel.  zl0t/zu0t warm-start the IPM
    duals (see `_qp_kernel`).  Returns z tiled (nt, nz, LANE), or
    (z, zl, zu) with return_duals.
    """
    nt, nz = Ht.shape[0], Ht.shape[1]
    warm = zl0t is not None
    kernel = functools.partial(_qp_kernel, nz=nz, iters=iters, warm=warm)
    vec_spec = pl.BlockSpec((1, nz, LANE_TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vec_shape = jax.ShapeDtypeStruct((nt, nz, LANE_TILE), Ht.dtype)
    inputs = [Ht, gt, lbt, ubt] + ([zl0t, zu0t] if warm else [])
    z, zl, zu = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, nz, nz, LANE_TILE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ] + [vec_spec] * (len(inputs) - 1),
        out_specs=(vec_spec, vec_spec, vec_spec),
        out_shape=(vec_shape, vec_shape, vec_shape),
        interpret=interpret,
    )(*inputs)
    if return_duals:
        return z, zl, zu
    return z


@functools.partial(jax.jit, static_argnames=("iters", "interpret",
                                             "return_duals", "symmetrize"))
def solve_box_qp_pdip_pallas(H: jnp.ndarray, g: jnp.ndarray, lb: jnp.ndarray,
                             ub: jnp.ndarray, iters: int = 12,
                             interpret: bool = False,
                             zl0: jnp.ndarray | None = None,
                             zu0: jnp.ndarray | None = None,
                             return_duals: bool = False,
                             symmetrize: bool = True):
    """Batched box-QP solve.  H: (B, nz, nz), g: (B, nz), bounds (nz,) or
    (B, nz).  B is padded internally to a multiple of 128.  zl0/zu0 (B, nz)
    warm-start the IPM duals.  Returns (B, nz) z, or (z, zl, zu).

    symmetrize: the masked Cholesky consumes full columns of H, so by default
    exact symmetry is enforced (f32 MXU/einsum-assembled Hessians are
    asymmetric at ~1e-3 relative).  Pass False when H is already symmetric to
    the last ulp (e.g. the condense kernel's outer-product accumulation):
    0.5*(H+Hᵀ) then only flips last-ulp bits, but on ill-conditioned
    instances the fixed-iteration IPM amplifies those flips to its full
    convergence slack (~1e-2 in z at 12 iters, measured in
    tests/test_pipeline_equivalence.py), so skipping keeps this entry
    bitwise-identical to the tiled/fused pipelines fed the same H."""
    B, nz, _ = H.shape
    dtype = H.dtype
    warm = zl0 is not None

    # Jacobi scaling happens inside the kernel.
    if symmetrize:
        H = 0.5 * (H + jnp.swapaxes(H, -1, -2))
    lb = jnp.broadcast_to(lb, (B, nz)).astype(dtype)
    ub = jnp.broadcast_to(ub, (B, nz)).astype(dtype)

    Bp = ((B + LANE_TILE - 1) // LANE_TILE) * LANE_TILE
    if Bp != B:
        pad = Bp - B
        eye = jnp.broadcast_to(jnp.eye(nz, dtype=dtype), (pad, nz, nz))
        H = jnp.concatenate([H, eye], axis=0)
        g = jnp.concatenate([g, jnp.zeros((pad, nz), dtype)], axis=0)
        lb = jnp.concatenate([lb, jnp.zeros((pad, nz), dtype)], axis=0)
        ub = jnp.concatenate([ub, jnp.ones((pad, nz), dtype)], axis=0)
        if warm:
            ones = jnp.ones((pad, nz), dtype)
            zl0 = jnp.concatenate([zl0, ones], axis=0)
            zu0 = jnp.concatenate([zu0, ones], axis=0)

    # lanes layout: (tiles, nz, nz, LANE) / (tiles, nz, LANE)
    nt = Bp // LANE_TILE
    Ht = H.reshape(nt, LANE_TILE, nz, nz).transpose(0, 2, 3, 1)

    def to_t(v):
        return v.reshape(nt, LANE_TILE, nz).transpose(0, 2, 1)

    def from_t(vt):
        return vt.transpose(0, 2, 1).reshape(Bp, nz)[:B]

    out = solve_box_qp_pdip_pallas_tiled(
        Ht, to_t(g), to_t(lb), to_t(ub), iters=iters, interpret=interpret,
        zl0t=to_t(zl0) if warm else None,
        zu0t=to_t(zu0) if warm else None,
        return_duals=return_duals,
    )
    if return_duals:
        return tuple(from_t(v) for v in out)
    return from_t(out)
