"""Pallas TPU kernel: the ENTIRE batched SQP-RTI Gauss-Newton step, fused.

The three-kernel tiled pipeline (`lin_kernel` -> `condense_kernel` ->
`qp_kernel`) left ~40% of the step in inter-kernel glue: the condensed
Hessian (26 MB at B=4096) and the condensing map M (94 MB) round-trip
through HBM between kernels, the tangent tiles are re-grouped stage->scenario
major, and the QP-solution expansion dX = M z + d and the KKT residual run
as XLA einsums re-reading those arrays.  This kernel fuses the whole
Gauss-Newton step for 128 scenarios per grid instance:

    for k in 0..N-1:   RK4 shooting step + 17 jvp tangents  (lin kernel body)
                       condensing recurrence d/M, H/g accumulation
    (M_k, d_k kept in VMEM scratch — never written to HBM)
    interior-point box QP on H           (qp kernel body, Jacobi-scaled)
    KKT projected-gradient residual on the unscaled system
    dX_k = d_k + M_k z   for k = 0..N    (the warm-start update)

HBM traffic per tile is only the boundary arrays: X/U/refs in (~160 kB),
z/dX/kkt out (~100 kB) — everything dimension-typed `(..., 128)` lanes-last.
The per-stage model augmentation (the folded RGP drag) is per-SCENARIO here,
so the host never broadcasts it across the N stages (the split pipeline
materialized (3, nb, N*B) columns).

Numerics are identical to the split pipeline by construction — same
formulas, same statically-unrolled panel Cholesky, same iteration counts —
and CHECKED, not just claimed: `tests/test_pipeline_equivalence.py` pins
fused == split bitwise and the small-batch SoA path to one f32 ulp at
matched iteration counts (B=256, RGP aug, 12 IPM iters), plus the shared
distance-to-oracle convergence slack.

Reference parity notes: this implements one acados SQP_RTI iteration
(`/root/reference/src/quad_opt.py:147-151` solver options; LINEAR_LS cost
`quad_opt.py:104-130`; u in [0,1] `quad_opt.py:142-144`) as one fused TPU
kernel instead of ERK codegen + HPIPM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lin_kernel import _make_f
from .qp_kernel import ipm_box_solve

LANE_TILE = 128
NX, NU, NT = 13, 4, 17


WS_GAMMA = 0.01   # warm-start primal interiority margin (fraction of width)
WS_FLOOR = 1e-3   # warm-start dual floor (in the Jacobi-scaled system)


def _fused_kernel(X_ref, U_ref, dx0_ref, ex0_ref, gu_ref, lb_ref, ub_ref,
                  *refs, f, dt: float, N: int, q: tuple, p: tuple, rw: tuple,
                  iters: int, with_aug: bool, warm: bool):
    """One tile = LANE_TILE scenarios, lanes-last.

    X: (1, N+1, nx, L); U: (1, N, nu, L); dx0: (1, nx, L);
    ex0 = X - yref: (1, N+1, nx, L); gu = rw*(Uflat - u_ref): (1, nz, L);
    lb/ub = u bounds minus Uflat: (1, nz, L).
    Aug (folded RGP drag, per scenario): Xb/wb (1, 3, nb, L), Lb/sfb (1, 3, L).
    warm: two extra (1, nz, L) inputs carry the previous tick's IPM duals.
    Outputs: z (1, nz, L), dX (1, N+1, nx, L), kkt (1, 1, L),
    zl/zu (1, nz, L) post-solve duals (the cross-tick warm-start state).
    Scratch: J_all (N, NT, nx, L) stage tangents, r_all (N, nx, L) defects —
    pass 2 re-derives dX by the forward recurrence dX_{k+1} = A_k dX_k +
    B_k z_k + r_k instead of materializing the (N+1, nx, nz, L) condensing
    map M (2.9 MB/tile written + read; the recurrence is algebraically
    identical — M_{k+1} z = A_k (M_k z) + B_k z_k — at 40% of the scratch
    traffic and fewer FLOPs; dU is untouched, dX differs from the d + Mz
    form only by f32 reassociation, bounded in
    tests/test_pipeline_equivalence.py).
    """
    nx, nu = NX, NU
    nz = N * nu
    L = LANE_TILE
    refs = list(refs)
    if with_aug:
        Xb_ref, wb_ref, Lb_ref, sfb_ref = refs[:4]
        refs = refs[4:]
        aug = (Xb_ref[0], wb_ref[0], Lb_ref[0], sfb_ref[0])
    else:
        aug = None
    if warm:
        zl0_ref, zu0_ref = refs[:2]
        refs = refs[2:]
    z_out, Xd_out, kkt_out, zlo_ref, zuo_ref, J_all, r_all = refs
    dtype = X_ref.dtype

    def step(x, u):
        k1 = f(x, u, aug)
        k2 = f(x + dt / 2 * k1, u, aug)
        k3 = f(x + dt / 2 * k2, u, aug)
        k4 = f(x + dt * k3, u, aug)
        return x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)

    # all 17 basis tangents stacked: one vmapped pass through the linearized
    # step instead of 17 separate tangent traces (17x smaller kernel program)
    ti_x = jax.lax.broadcasted_iota(jnp.int32, (NT, nx, L), 0)
    tr_x = jax.lax.broadcasted_iota(jnp.int32, (NT, nx, L), 1)
    tx_all = (ti_x == tr_x).astype(dtype)
    ti_u = jax.lax.broadcasted_iota(jnp.int32, (NT, nu, L), 0)
    tr_u = jax.lax.broadcasted_iota(jnp.int32, (NT, nu, L), 1)
    tu_all = (ti_u - nx == tr_u).astype(dtype)

    # ---- pass 1: linearize + condense, H/g as SSA, M/d into scratch ----
    # Live-width condensing (round-3 roofline work): at stage k the map M_k
    # has nonzero columns only in [0, k*nu) — controls after stage k cannot
    # affect x_k.  The H/g accumulation and the M recurrence therefore
    # operate on the (k*nu)-wide live block only.  Round 5: H is symmetric
    # by construction, so the accumulation covers only the block-LOWER row
    # panels (~half the FLOPs again) and the full H is assembled once at
    # the end by mirroring across the diagonal (`condense_common` — shared
    # by all condensing kernel bodies, which keeps the pipelines
    # bitwise-identical; tests/test_pipeline_equivalence.py).
    from .condense_common import accumulate_lower, assemble_mirror, panels_grow

    panels = []                                          # block-lower H rows
    g = None                                             # (lw, L) growing
    lw_acc = 0                                           # current width of H/g
    M = jnp.zeros((nx, nz, L), dtype)
    d = dx0_ref[0]

    for k in range(N):
        x = X_ref[0, k]                                  # (nx, L)
        u = U_ref[0, k]                                  # (nu, L)
        xp, f_lin = jax.linearize(step, x, u)            # tangents share primal
        Jfull = jax.vmap(f_lin)(tx_all, tu_all)          # (17, nx, L)
        Jk = [Jfull[i] for i in range(NT)]               # columns of [A_k|B_k]
        r_k = xp - X_ref[0, k + 1]
        J_all[k] = Jfull                                 # for the pass-2 dX
        r_all[k] = r_k                                   # recurrence

        lw = k * nu                                      # live width of M_k
        if k > 0:  # stage-k cost term (M_0 = 0 contributes nothing)
            panels, g = panels_grow(panels, g, lw_acc, lw, nu, L, dtype)
            lw_acc = lw
            panels, g = accumulate_lower(panels, g, M[:, :lw, :],
                                         ex0_ref[0, k] + d, q, nx, nu)

        # d_{k+1} = A_k d + r_k — tangent j IS column j of A_k
        d = sum(Jk[j] * d[j][None, :] for j in range(nx)) + r_k

        # M_{k+1} = A_k M_k + B_k E_k — contract over the live block only
        pieces = []
        if k > 0:
            Mn = jnp.zeros((nx, lw, L), dtype)
            for j in range(nx):
                Mn = Mn + Jk[j][:, None, :] * M[j, :lw][None, :, :]
            pieces.append(Mn)
        pieces.append(jnp.stack([Jk[nx + j] for j in range(nu)], axis=1))
        if nz - (k + 1) * nu > 0:
            pieces.append(jnp.zeros((nx, nz - (k + 1) * nu, L), dtype))
        M = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=1)

    panels, g = panels_grow(panels, g, lw_acc, nz, nu, L, dtype)
    panels, g = accumulate_lower(panels, g, M, ex0_ref[0, N] + d, p, nx, nu)

    # mirror the block-lower panels to the full symmetric H
    # (+ kron(I_N, diag(rw)) on the diagonal, rw static floats)
    H = assemble_mirror(panels, nz, nu, rw, dtype)
    g = g + gu_ref[0]
    lb0 = lb_ref[0]
    ub0 = ub_ref[0]
    H0, g0 = H, g                                        # unscaled, for the KKT

    # ---- interior-point box QP: the SHARED lanes-batched IPM core
    # (qp_kernel.ipm_box_solve) — one definition across all Pallas
    # pipelines is what keeps them bitwise-identical ----
    if warm:
        zl0, zu0 = zl0_ref[0], zu0_ref[0]
    else:
        zl0 = zu0 = None
    z, zl_out, zu_out = ipm_box_solve(H, g, lb0, ub0, zl0, zu0,
                                      nz=nz, iters=iters, warm=warm)
    zlo_ref[0] = zl_out
    zuo_ref[0] = zu_out
    z_out[0] = z

    # ---- KKT projected-gradient residual on the unscaled system ----
    Hz0 = jnp.sum(H0 * z[None, :, :], axis=1)
    proj = jnp.clip(z - (Hz0 + g0), lb0, ub0) - z
    kkt_out[0, 0] = jnp.max(jnp.abs(proj), axis=0)

    # ---- pass 2: dX by forward recurrence (== d_k + M_k z algebraically:
    # M_{k+1} z = A_k (M_k z) + B_k z_k, d's recurrence shares A_k) ----
    dXk = dx0_ref[0]
    Xd_out[0, 0] = dXk
    for k in range(N):
        Jk = J_all[k]                                    # (NT, nx, L)
        dXn = r_all[k]
        for j in range(nx):
            dXn = dXn + Jk[j] * dXk[j][None, :]
        for a in range(nu):
            dXn = dXn + Jk[nx + a] * z[k * nu + a][None, :]
        Xd_out[0, k + 1] = dXn
        dXk = dXn


@functools.partial(jax.jit, static_argnames=("f", "dt", "q", "p", "rw",
                                             "iters", "interpret"))
def _call(Xt, Ut, dx0t, ex0t, gut, lbt, ubt, aug_leaves, duals, f, dt, q, p,
          rw, iters, interpret):
    """All inputs tiled lanes-last: Xt (nt, N+1, nx, L), Ut (nt, N, nu, L),
    dx0t (nt, nx, L), ex0t (nt, N+1, nx, L), gut/lbt/ubt (nt, nz, L);
    aug_leaves (folded drag, per scenario): Xb/wb (nt, 3, nb, L),
    Lb/sfb (nt, 3, L) or None; duals = (zl0t, zu0t) each (nt, nz, L) or None.
    Returns (zt (nt, nz, L), Xdt (nt, N+1, nx, L), kkt (nt, 1, L),
    zlt, zut (nt, nz, L))."""
    nt, Np1, nx, L = Xt.shape
    N = Np1 - 1
    nu = Ut.shape[2]
    nz = N * nu
    dtype = Xt.dtype
    with_aug = aug_leaves is not None
    warm = duals is not None

    kernel = functools.partial(_fused_kernel, f=f, dt=dt, N=N, q=q, p=p,
                               rw=rw, iters=iters, with_aug=with_aug,
                               warm=warm)

    def spec(shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape, lambda i: (i,) + (0,) * nd,
                            memory_space=pltpu.VMEM)

    in_specs = [spec((N + 1, nx, L)), spec((N, nu, L)), spec((nx, L)),
                spec((N + 1, nx, L)), spec((nz, L)), spec((nz, L)),
                spec((nz, L))]
    inputs = [Xt, Ut, dx0t, ex0t, gut, lbt, ubt]
    if with_aug:
        Xb, wb, Lb, sfb = aug_leaves
        nb = Xb.shape[2]
        inputs += [Xb, wb, Lb, sfb]
        in_specs += [spec((3, nb, L)), spec((3, nb, L)),
                     spec((3, L)), spec((3, L))]
    if warm:
        inputs += [duals[0], duals[1]]
        in_specs += [spec((nz, L)), spec((nz, L))]

    zvec = jax.ShapeDtypeStruct((nt, nz, L), dtype)
    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=(spec((nz, L)), spec((N + 1, nx, L)), spec((1, L)),
                   spec((nz, L)), spec((nz, L))),
        out_shape=(
            zvec,
            jax.ShapeDtypeStruct((nt, N + 1, nx, L), dtype),
            jax.ShapeDtypeStruct((nt, 1, L), dtype),
            zvec,
            zvec,
        ),
        scratch_shapes=[
            pltpu.VMEM((N, NT, nx, L), dtype),           # stage tangents
            pltpu.VMEM((N, nx, L), dtype),               # stage defects
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024)
        ),
        interpret=interpret,
    )(*inputs)


def make_fused_sqp_step(p, dt: float):
    """Returns fused_step(Xt, Ut, dx0t, ex0t, gut, lbt, ubt, aug_leaves,
    q, p_term, rw, iters) operating entirely in the tiled lanes-last layout.
    `p` is the QuadParams pytree (baked to scalars at kernel-build time)."""
    builder_cache = {}

    def f_for(nb):
        if nb not in builder_cache:
            builder_cache[nb] = _make_f(p, nb)
        return builder_cache[nb]

    def fused_step(Xt, Ut, dx0t, ex0t, gut, lbt, ubt, aug_leaves,
                   q, p_term, rw, iters, interpret=False, duals=None):
        nb = aug_leaves[0].shape[2] if aug_leaves is not None else None
        return _call(Xt, Ut, dx0t, ex0t, gut, lbt, ubt, aug_leaves, duals,
                     f_for(nb), dt, tuple(q), tuple(p_term), tuple(rw),
                     iters, interpret)

    return fused_step


def _fused_from_J_kernel(J_ref, r_ref, dx0_ref, ex0_ref, gu_ref, lb_ref,
                         ub_ref, *refs, N: int, q: tuple, p: tuple,
                         rw: tuple, iters: int, warm: bool):
    """The J-FED fused Gauss-Newton step: condensing + IPM box QP + KKT +
    dX expansion in one kernel, consuming the lin kernel's raw tangent
    tiles (J[0, k, c] is column c of [A_k | B_k]) and defects r.

    Motivation (round-4 probe, outputs/roofline/ROOFLINE.md): running the
    RK4 linearization INSIDE the all-in-one fused kernel costs ~7.4 ms at
    B=16384 vs 2.08 ms for the standalone lin kernel — the condensing
    state's VMEM/register pressure wrecks the lin phase's scheduling.  The
    hybrid pipeline (lin kernel -> this kernel) pays one J round-trip
    through HBM (~1.1 MB/tile) to keep both phases at their standalone
    efficiency; H and the condensing map never leave VMEM/SSA.

    J: (1, N, NT, nx, L); r: (1, N, nx, L); dx0: (1, nx, L);
    ex0 = X - yref: (1, N+1, nx, L); gu/lb/ub: (1, nz, L);
    warm: two extra (1, nz, L) dual inputs.
    Outputs: z (1, nz, L), dX (1, N+1, nx, L), kkt (1, 1, L), zl/zu.
    Condensing/IPM/expansion bodies are IDENTICAL to `_fused_kernel`
    (live-width SSA condense, shared `ipm_box_solve`, forward-recurrence
    expand) — bitwise equality pinned in tests/test_pipeline_equivalence.py.
    """
    nx, nu = NX, NU
    nz = N * nu
    L = LANE_TILE
    refs = list(refs)
    if warm:
        zl0_ref, zu0_ref = refs[:2]
        refs = refs[2:]
    z_out, Xd_out, kkt_out, zlo_ref, zuo_ref = refs
    dtype = J_ref.dtype

    # ---- live-width block-lower condensing from J (shared helper bodies,
    # condense_common — identical to _fused_kernel pass 1) ----
    from .condense_common import accumulate_lower, assemble_mirror, panels_grow

    panels = []
    g = None
    lw_acc = 0
    M = jnp.zeros((nx, nz, L), dtype)
    d = dx0_ref[0]

    for k in range(N):
        Jk = [J_ref[0, k, i] for i in range(NT)]
        r_k = r_ref[0, k]

        lw = k * nu
        if k > 0:
            panels, g = panels_grow(panels, g, lw_acc, lw, nu, L, dtype)
            lw_acc = lw
            panels, g = accumulate_lower(panels, g, M[:, :lw, :],
                                         ex0_ref[0, k] + d, q, nx, nu)

        d = sum(Jk[j] * d[j][None, :] for j in range(nx)) + r_k

        pieces = []
        if k > 0:
            Mn = jnp.zeros((nx, lw, L), dtype)
            for j in range(nx):
                Mn = Mn + Jk[j][:, None, :] * M[j, :lw][None, :, :]
            pieces.append(Mn)
        pieces.append(jnp.stack([Jk[nx + j] for j in range(nu)], axis=1))
        if nz - (k + 1) * nu > 0:
            pieces.append(jnp.zeros((nx, nz - (k + 1) * nu, L), dtype))
        M = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=1)

    panels, g = panels_grow(panels, g, lw_acc, nz, nu, L, dtype)
    panels, g = accumulate_lower(panels, g, M, ex0_ref[0, N] + d, p, nx, nu)

    H = assemble_mirror(panels, nz, nu, rw, dtype)
    # NOTE (r05 probe): forcing H through a VMEM scratch round-trip here to
    # "canonicalize" its layout was measured at 203 ms/call vs 7.0 — an
    # SSA H is what lets Mosaic software-pipeline the IPM loop; do not
    # materialize it.
    g = g + gu_ref[0]
    lb0 = lb_ref[0]
    ub0 = ub_ref[0]
    H0, g0 = H, g

    # ---- shared IPM core ----
    if warm:
        zl0, zu0 = zl0_ref[0], zu0_ref[0]
    else:
        zl0 = zu0 = None
    z, zl_out, zu_out = ipm_box_solve(H, g, lb0, ub0, zl0, zu0,
                                      nz=nz, iters=iters, warm=warm)
    zlo_ref[0] = zl_out
    zuo_ref[0] = zu_out
    z_out[0] = z

    # ---- KKT projected-gradient residual ----
    Hz0 = jnp.sum(H0 * z[None, :, :], axis=1)
    proj = jnp.clip(z - (Hz0 + g0), lb0, ub0) - z
    kkt_out[0, 0] = jnp.max(jnp.abs(proj), axis=0)

    # ---- dX forward recurrence ----
    dXk = dx0_ref[0]
    Xd_out[0, 0] = dXk
    for k in range(N):
        dXn = r_ref[0, k]
        for j in range(nx):
            dXn = dXn + J_ref[0, k, j] * dXk[j][None, :]
        for a in range(nu):
            dXn = dXn + J_ref[0, k, nx + a] * z[k * nu + a][None, :]
        Xd_out[0, k + 1] = dXn
        dXk = dXn


@functools.partial(jax.jit, static_argnames=("q", "p", "rw", "iters",
                                             "interpret"))
def fused_sqp_from_J(Jt, rt, dx0t, ex0t, gut, lbt, ubt, duals, q, p, rw,
                     iters, interpret=False):
    """Tiled lanes-last entry for the J-fed fused step.  Jt: (nt, N, NT, nx,
    L) tangent tiles from the lin kernel (scenario-major regrouped); rt:
    (nt, N, nx, L) defects; the rest as in `_call`.  Returns (zt, Xdt, kkt,
    zlt, zut)."""
    nt, N, NTAN, nx, L = Jt.shape
    nz = N * NU
    dtype = Jt.dtype
    warm = duals is not None

    kernel = functools.partial(_fused_from_J_kernel, N=N, q=tuple(q),
                               p=tuple(p), rw=tuple(rw), iters=iters,
                               warm=warm)

    def spec(shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape, lambda i: (i,) + (0,) * nd,
                            memory_space=pltpu.VMEM)

    in_specs = [spec((N, NTAN, nx, L)), spec((N, nx, L)), spec((nx, L)),
                spec((N + 1, nx, L)), spec((nz, L)), spec((nz, L)),
                spec((nz, L))]
    inputs = [Jt, rt, dx0t, ex0t, gut, lbt, ubt]
    if warm:
        inputs += [duals[0], duals[1]]
        in_specs += [spec((nz, L)), spec((nz, L))]

    zvec = jax.ShapeDtypeStruct((nt, nz, L), dtype)
    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=(spec((nz, L)), spec((N + 1, nx, L)), spec((1, L)),
                   spec((nz, L)), spec((nz, L))),
        out_shape=(
            zvec,
            jax.ShapeDtypeStruct((nt, N + 1, nx, L), dtype),
            jax.ShapeDtypeStruct((nt, 1, L), dtype),
            zvec,
            zvec,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024)
        ),
        interpret=interpret,
    )(*inputs)
