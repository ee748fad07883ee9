"""Pallas TPU kernel: lanes-batched full condensing + Gauss-Newton cost.

The second hot phase of the batched SQP step (after the box-QP): building the
condensed Hessian/gradient from the per-node sensitivities.  XLA's vmapped
scan of (13x13)@(13x40) matmuls keeps the tiny state dims in the vector
lanes (~10% utilisation, ~49 ms at B=4096 on v5e).  Here — like
`qp_kernel.py` — the SCENARIO batch lives in the 128-wide lane axis: one
kernel instance condenses 128 scenarios, the N=10 stage recurrence is
statically unrolled, every contraction is a (13- or 40-wide) fused
multiply-add sweep over (·, ·, 128) VMEM blocks, and the Hessian/gradient
accumulate in VMEM without HBM round-trips.

Computes exactly what `SQPSolver._cost_from_lin` computes (its numerical
oracle in tests):

    d_{k+1} = A_k d_k + r_k,          d_0 = dx0
    M_{k+1} = A_k M_k + B_k E_k,      M_0 = 0          (E_k = u_k selector)
    H = sum_k M_k^T diag(q_k) M_k + kron(I_N, diag(rw))
    g = sum_k M_k^T diag(q_k) (X_k + d_k - yref_k)     (+ rw (U - u_ref) outside)

with q_k = q*stage_scale for k < N and q*terminal_cost at k = N.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_TILE = 128


def _condense_kernel(A_ref, B_ref, r_ref, dx0_ref, ex0_ref,
                     H_ref, g_ref, M_ref, d_ref,
                     *, N: int, nx: int, nu: int, q: tuple, p: tuple, rw: tuple):
    """One tile = LANE_TILE scenarios, lanes-last.

    A: (1, N, nx, nx, L); B: (1, N, nx, nu, L); r: (1, N, nx, L);
    dx0: (1, nx, L); ex0 = X - yref: (1, N+1, nx, L).
    Outputs: H (1, nz, nz, L), g (1, nz, L), M (1, N+1, nx, nz, L),
    d (1, N+1, nx, L).
    """
    dtype = A_ref.dtype
    nz = N * nu
    L = LANE_TILE

    M_ref[0, 0] = jnp.zeros((nx, nz, L), dtype)

    d = dx0_ref[0]                                     # (nx, L)
    d_ref[0, 0] = d

    # Live-width condensing, same structure as _condense_kernel_J /
    # sqp_fused_kernel pass 1 (design note there): H/g accumulate in SSA on
    # the growing (k*nu)-wide live block; M recurrence contracts live
    # columns only.  B_k lands via static zero-padded concat (a .at[].add
    # lowers to scatter-add, unsupported in Mosaic; zero-width pieces are
    # skipped — Mosaic rejects size-0 vectors).
    from .condense_common import accumulate_lower, assemble_mirror, panels_grow

    panels = []
    g = None
    lw_acc = 0
    M = jnp.zeros((nx, nz, L), dtype)

    for k in range(N):
        A_k = A_ref[0, k]                              # (nx, nx, L)
        B_k = B_ref[0, k]                              # (nx, nu, L)
        r_k = r_ref[0, k]

        lw = k * nu
        # stage-k cost term (M_0 = 0 contributes nothing; skip k=0)
        if k > 0:
            panels, g = panels_grow(panels, g, lw_acc, lw, nu, L, dtype)
            lw_acc = lw
            panels, g = accumulate_lower(panels, g, M[:, :lw, :],
                                         ex0_ref[0, k] + d, q, nx, nu)

        # d_{k+1} = A_k d + r_k  — contraction over the state dim
        d = sum(A_k[:, j, :] * d[j][None, :] for j in range(nx)) + r_k
        d_ref[0, k + 1] = d

        # M_{k+1} = A_k M_k + B_k E_k
        pieces = []
        if k > 0:
            Mn = jnp.zeros((nx, lw, L), dtype)
            for j in range(nx):
                Mn = Mn + A_k[:, j, :][:, None, :] * M[j, :lw][None, :, :]
            pieces.append(Mn)
        pieces.append(B_k)
        if nz - (k + 1) * nu > 0:
            pieces.append(jnp.zeros((nx, nz - (k + 1) * nu, L), dtype))
        M = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=1)
        M_ref[0, k + 1] = M

    # terminal term with weight p, then mirror the block-lower panels to
    # the full symmetric H (+ kron(I_N, diag(rw)) control diagonal; rw
    # entries are static Python floats — no captured device constants)
    panels, g = panels_grow(panels, g, lw_acc, nz, nu, L, dtype)
    panels, g = accumulate_lower(panels, g, M, ex0_ref[0, N] + d, p, nx, nu)
    H_ref[0] = assemble_mirror(panels, nz, nu, rw, dtype)
    g_ref[0] = g


def _condense_kernel_J(J_ref, r_ref, dx0_ref, ex0_ref,
                       H_ref, g_ref, M_ref, d_ref,
                       *, N: int, nx: int, nu: int, q: tuple, p: tuple, rw: tuple):
    """Tiled-J variant: the linearization kernel's raw tangent output
    J (1, N, 17, nx, L) is consumed COLUMN-WISE with zero repacking —
    J[k, j] IS column j of A_k (j < nx) / column j-nx of B_k, exactly the
    slices the condensing recurrence contracts over."""
    dtype = J_ref.dtype
    nz = N * nu
    L = LANE_TILE

    M_ref[0, 0] = jnp.zeros((nx, nz, L), dtype)

    d = dx0_ref[0]
    d_ref[0, 0] = d

    # Live-width condensing — identical body to sqp_fused_kernel pass 1
    # (see the design note there; identical code keeps fused == tiled
    # bitwise, tests/test_pipeline_equivalence.py).  H/g accumulate in SSA
    # on the growing (k*nu)-wide live block (one final ref write, no VMEM
    # round-trip per stage); M recurrence contracts the live block only.
    from .condense_common import accumulate_lower, assemble_mirror, panels_grow

    panels = []
    g = None
    lw_acc = 0
    M = jnp.zeros((nx, nz, L), dtype)

    for k in range(N):
        r_k = r_ref[0, k]

        lw = k * nu
        if k > 0:
            panels, g = panels_grow(panels, g, lw_acc, lw, nu, L, dtype)
            lw_acc = lw
            panels, g = accumulate_lower(panels, g, M[:, :lw, :],
                                         ex0_ref[0, k] + d, q, nx, nu)

        d = sum(J_ref[0, k, j] * d[j][None, :] for j in range(nx)) + r_k
        d_ref[0, k + 1] = d

        pieces = []
        if k > 0:
            Mn = jnp.zeros((nx, lw, L), dtype)
            for j in range(nx):
                Mn = Mn + J_ref[0, k, j][:, None, :] * M[j, :lw][None, :, :]
            pieces.append(Mn)
        # B_k columns straight from the tangent block
        pieces.append(jnp.stack([J_ref[0, k, nx + j] for j in range(nu)], axis=1))
        if nz - (k + 1) * nu > 0:
            pieces.append(jnp.zeros((nx, nz - (k + 1) * nu, L), dtype))
        M = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=1)
        M_ref[0, k + 1] = M                 # the running M lives in SSA

    # terminal term with weight p, then mirror the block-lower panels to
    # the full symmetric H (+ kron(I_N, diag(rw)) control diagonal; rw
    # entries are static Python floats — no captured device constants)
    panels, g = panels_grow(panels, g, lw_acc, nz, nu, L, dtype)
    panels, g = accumulate_lower(panels, g, M, ex0_ref[0, N] + d, p, nx, nu)
    H_ref[0] = assemble_mirror(panels, nz, nu, rw, dtype)
    g_ref[0] = g


@functools.partial(jax.jit, static_argnames=("q", "p", "rw", "nu", "interpret"))
def condense_cost_from_J_tiled(Jt, rt, dx0t, ex0t, q: tuple, p: tuple, rw: tuple,
                               nu: int = 4, interpret: bool = False):
    """Zero-relayout condensing: all operands and results stay in the tiled
    lanes-last layout.

    Jt: (nt, N, 17, nx, L) — the lin kernel's raw tangents, scenario-tiled;
    rt: (nt, N, nx, L); dx0t: (nt, nx, L); ex0t: (nt, N+1, nx, L).
    Returns (Ht (nt,nz,nz,L), gt (nt,nz,L), Mt (nt,N+1,nx,nz,L),
    dt (nt,N+1,nx,L)).
    """
    nt, N, NTAN, nx, L = Jt.shape
    nz = N * nu
    dtype = Jt.dtype

    kernel = functools.partial(_condense_kernel_J, N=N, nx=nx, nu=nu,
                               q=tuple(q), p=tuple(p), rw=tuple(rw))

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
            spec((N + 1, nx, LANE_TILE)),
        ],
        out_specs=(
            spec((nz, nz, LANE_TILE)),
            spec((nz, LANE_TILE)),
            spec((N + 1, nx, nz, LANE_TILE)),
            spec((N + 1, nx, LANE_TILE)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nt, nz, nz, LANE_TILE), dtype),
            jax.ShapeDtypeStruct((nt, nz, LANE_TILE), dtype),
            jax.ShapeDtypeStruct((nt, N + 1, nx, nz, LANE_TILE), dtype),
            jax.ShapeDtypeStruct((nt, N + 1, nx, LANE_TILE), dtype),
        ),
        interpret=interpret,
    )(Jt, rt, dx0t, ex0t)


@functools.partial(jax.jit, static_argnames=("q", "p", "rw", "interpret"))
def condense_cost_pallas(A, B, r, dx0, ex0, q: tuple, p: tuple, rw: tuple,
                         interpret: bool = False):
    """Batched condensing + GN cost assembly.

    A: (Bt, N, nx, nx), B: (Bt, N, nx, nu), r: (Bt, N, nx), dx0: (Bt, nx),
    ex0 = X - yref: (Bt, N+1, nx).  q/p/rw: static per-dim weight tuples
    (stage, terminal, control).  Returns (H (Bt,nz,nz), g_state (Bt,nz),
    M (Bt,N+1,nx,nz), d (Bt,N+1,nx)); the control gradient term rw*(U-u_ref)
    is added by the caller.
    """
    Bt, N, nx, _ = A.shape
    nu = B.shape[-1]
    nz = N * nu
    dtype = A.dtype

    Bp = ((Bt + LANE_TILE - 1) // LANE_TILE) * LANE_TILE
    if Bp != Bt:
        pad = Bp - Bt
        A = jnp.concatenate([A, jnp.zeros((pad,) + A.shape[1:], dtype)], axis=0)
        B = jnp.concatenate([B, jnp.zeros((pad,) + B.shape[1:], dtype)], axis=0)
        r = jnp.concatenate([r, jnp.zeros((pad,) + r.shape[1:], dtype)], axis=0)
        dx0 = jnp.concatenate([dx0, jnp.zeros((pad, nx), dtype)], axis=0)
        ex0 = jnp.concatenate([ex0, jnp.zeros((pad,) + ex0.shape[1:], dtype)], axis=0)

    nt = Bp // LANE_TILE
    # lanes-last layouts
    At = A.reshape(nt, LANE_TILE, N, nx, nx).transpose(0, 2, 3, 4, 1)
    Bt_ = B.reshape(nt, LANE_TILE, N, nx, nu).transpose(0, 2, 3, 4, 1)
    rt = r.reshape(nt, LANE_TILE, N, nx).transpose(0, 2, 3, 1)
    dx0t = dx0.reshape(nt, LANE_TILE, nx).transpose(0, 2, 1)
    ex0t = ex0.reshape(nt, LANE_TILE, N + 1, nx).transpose(0, 2, 3, 1)

    kernel = functools.partial(_condense_kernel, N=N, nx=nx, nu=nu,
                               q=tuple(q), p=tuple(p), rw=tuple(rw))

    def spec(shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape, lambda i: (i,) + (0,) * nd,
                            memory_space=pltpu.VMEM)

    H, g, M, d = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            spec((N, nx, nx, LANE_TILE)),
            spec((N, nx, nu, LANE_TILE)),
            spec((N, nx, LANE_TILE)),
            spec((nx, LANE_TILE)),
            spec((N + 1, nx, LANE_TILE)),
        ],
        out_specs=(
            spec((nz, nz, LANE_TILE)),
            spec((nz, LANE_TILE)),
            spec((N + 1, nx, nz, LANE_TILE)),
            spec((N + 1, nx, LANE_TILE)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nt, nz, nz, LANE_TILE), dtype),
            jax.ShapeDtypeStruct((nt, nz, LANE_TILE), dtype),
            jax.ShapeDtypeStruct((nt, N + 1, nx, nz, LANE_TILE), dtype),
            jax.ShapeDtypeStruct((nt, N + 1, nx, LANE_TILE), dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024)
        ),
        interpret=interpret,
    )(At, Bt_, rt, dx0t, ex0t)

    H = H.transpose(0, 3, 1, 2).reshape(Bp, nz, nz)[:Bt]
    g = g.transpose(0, 2, 1).reshape(Bp, nz)[:Bt]
    M = M.transpose(0, 4, 1, 2, 3).reshape(Bp, N + 1, nx, nz)[:Bt]
    d = d.transpose(0, 3, 1, 2).reshape(Bp, N + 1, nx)[:Bt]
    return H, g, M, d
