"""Shared lower-triangle condensing accumulation for the Pallas SQP kernels.

The Gauss-Newton Hessian H = sum_k M_k^T diag(w_k) M_k is symmetric by
construction, yet the round-4 kernels accumulated the FULL square via outer
products — ~2x the dominant condensing FLOPs (VERDICT r4 weak #2 / next #1).
Here the accumulation maintains H as a list of nu-tall ROW PANELS covering
only the block-lower triangle (panel rb: rows [rb*nu, (rb+1)*nu), columns
[0, (rb+1)*nu) — including the full diagonal block), growing with the
live-width recurrence exactly as before, and the full H is assembled ONCE at
the end by mirroring the strict block-lower region across the diagonal
(measured: the (nz, nz, L) d0<->d1 swapaxes is free on Mosaic —
bench/probe_hybrid.transpose_probe).

Numerics: the lower-triangle/diagonal-block entries accumulate in the
IDENTICAL order as the round-4 full-square version (bitwise-equal there);
the strict upper entries become exact mirrors of their lower twins instead
of independently-rounded products (last-ulp flips only — within the IPM's
pinned convergence slack, and identical across all pipelines since every
kernel body shares THESE helpers; tests/test_pipeline_equivalence.py).

Used by: `sqp_fused_kernel._fused_kernel`, `._fused_from_J_kernel`,
`condense_kernel._condense_kernel`, `._condense_kernel_J`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def panels_grow(panels: list, g, lw_old: int, lw_new: int, nu: int, L: int,
                dtype):
    """Append zero row panels for the new row blocks; zero-grow g."""
    panels = list(panels)
    for rb in range(lw_old // nu, lw_new // nu):
        panels.append(jnp.zeros((nu, (rb + 1) * nu, L), dtype))
    if g is None:
        g = jnp.zeros((lw_new, L), dtype)
    elif lw_new > lw_old:
        g = jnp.concatenate([g, jnp.zeros((lw_new - lw_old, L), dtype)],
                            axis=0)
    return panels, g


def accumulate_lower(panels: list, g, Mk_live, exk, w, nx: int, nu: int):
    """H += Mk^T diag(w) Mk on the block-lower row panels only;
    g += Mk^T diag(w) exk in full.  Mk_live: (nx, lw, L); w static tuple.
    Per-element accumulation order over i matches the historical full-square
    version (bitwise on the stored triangle)."""
    # W as a plain LIST of scaled rows, not a jnp.stack: sub-tile prefix
    # slices of a stack-derived value lower to a Mosaic gather that fails
    # ("Shape mismatch in input, indices and output"); slicing the
    # elementwise product directly stays on the slice path (bitwise the
    # same values either way)
    W = [w[i] * Mk_live[i] for i in range(nx)]
    for i in range(nx):
        g = g + W[i] * exk[i][None, :]
    out = []
    for rb, P in enumerate(panels):
        cw = (rb + 1) * nu
        r0 = rb * nu
        for i in range(nx):
            P = P + Mk_live[i][r0:r0 + nu][:, None, :] * W[i][:cw][None, :, :]
        out.append(P)
    return out, g


def assemble_mirror(panels: list, nz: int, nu: int, rw, dtype):
    """Row panels -> full (nz, nz, L) H: zero-pad each panel to width nz,
    mirror the strict block-lower region to the upper triangle, and add the
    kron(I_N, diag(rw)) control-cost diagonal (rw static floats)."""
    L = panels[0].shape[-1]
    rows = []
    for rb, P in enumerate(panels):
        cw = (rb + 1) * nu
        if cw < nz:
            P = jnp.concatenate([P, jnp.zeros((nu, nz - cw, L), dtype)],
                                axis=1)
        rows.append(P)
    Hl = rows[0] if len(rows) == 1 else jnp.concatenate(rows, axis=0)
    r3 = jax.lax.broadcasted_iota(jnp.int32, (nz, nz, L), 0)
    k3 = jax.lax.broadcasted_iota(jnp.int32, (nz, nz, L), 1)
    # strict BLOCK-lower only: the diagonal blocks are already complete in
    # their panels (both within-block triangles), so mirroring them would
    # double-count
    strict = jnp.where(r3 // nu > k3 // nu, Hl, 0.0)
    H = Hl + jnp.swapaxes(strict, 0, 1)
    for i in range(nu):
        H = H + jnp.where((r3 == k3) & (r3 % nu == i), rw[i], 0.0).astype(dtype)
    return H
