"""Round-5 probes: where the hybrid pipeline's non-kernel time goes, and
whether an in-kernel (d0, d1) transpose of the (nz, nz, L) Hessian tile is
cheap enough to mirror a lower-triangle-only accumulation.

Context (VERDICT r4 next #1): the hybrid pipeline measures 12.6 ms/call at
B=16384 while its two kernels standalone cost lin 2.08 + (condense 2.2 +
IPM 5.67) ~= 9.9 ms — ~2.6 ms is unattributed glue (XLA tile()/untile()
transposes, ex0/gu staging, J DMA, prologues).  `hybrid_breakdown` measures
the standalone J-fed fused kernel (never timed before) and derives the glue
as full - lin - jfed.

`transpose_probe` times `x + swapaxes(x, 0, 1)` on the Hessian tile shape
inside a Pallas kernel vs a pure-elementwise control — the cost of
mirroring H = Hl + strict_lower(Hl)^T once per solve, which would let the
condensing accumulate only the lower triangle (~half its FLOPs).

All timings slope-timed with forced scalar fetch (bench/phases.py
methodology — block_until_ready does not synchronize under the axon
tunnel).
"""

from __future__ import annotations

import functools
import json

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .phases import _interpret, _slope_time

LANE = 128


# ------------------------------------------------------------------ #
# standalone J-fed fused kernel + glue attribution
# ------------------------------------------------------------------ #

def _jfed_inputs(B, N=10, nx=13, nu=4, dtype=jnp.float32):
    ntb = B // LANE
    nz = N * nu
    ks = [jax.random.PRNGKey(i) for i in range(8)]
    Jt = jax.random.normal(ks[0], (ntb, N, 17, nx, LANE), dtype) * 0.1
    # make A-blocks near-identity so condensing stays bounded like the real
    # problem (tangent j of stage k: column j of [A|B])
    eye = jnp.concatenate([jnp.eye(nx, dtype=dtype),
                           jnp.zeros((4, nx), dtype)], axis=0)
    Jt = Jt + eye[None, None, :, :, None]
    rt = jax.random.normal(ks[1], (ntb, N, nx, LANE), dtype) * 0.01
    dx0t = jax.random.normal(ks[2], (ntb, nx, LANE), dtype) * 0.01
    ex0t = jax.random.normal(ks[3], (ntb, N + 1, nx, LANE), dtype)
    gut = jax.random.normal(ks[4], (ntb, nz, LANE), dtype) * 0.01
    lbt = jnp.full((ntb, nz, LANE), -0.16, dtype)
    ubt = jnp.full((ntb, nz, LANE), 0.84, dtype)
    return Jt, rt, dx0t, ex0t, gut, lbt, ubt


def jfed_standalone(B=16384, iters_grid=(1, 4, 12)) -> dict:
    """Slope/intercept of the standalone J-fed fused kernel (condense + IPM
    + KKT + expand; no lin phase, no staging glue)."""
    from ..ops.pallas.sqp_fused_kernel import fused_sqp_from_J

    qw = (10.0,) * 3 + (0.1,) * 4 + (0.05,) * 6
    rw = (0.1,) * 4
    args = _jfed_inputs(B)
    interp = _interpret()

    times = {}
    for it in iters_grid:
        def make(K, it=it):
            @jax.jit
            def f(gu):
                def body(gu, _):
                    zt, Xdt, kkt, zlt, zut = fused_sqp_from_J(
                        args[0], args[1], args[2], args[3], gu, args[5],
                        args[6], None, qw, qw, rw, it, interpret=interp)
                    s = zt.sum() + Xdt.sum()
                    return gu + 0.0 * s, s
                _, ys = jax.lax.scan(body, gu, None, length=K)
                return ys.sum()
            return lambda: f(args[4])

        times[it] = _slope_time(make, Ks=(2, 10))

    its = np.asarray(sorted(times), np.float64)
    ts = np.asarray([times[int(i)] for i in its])
    slope, intercept = np.polyfit(its, ts, 1)
    return {"per_iters_seconds": {str(k): v for k, v in times.items()},
            "ipm_slope_s": float(slope), "kernel_intercept_s": float(intercept),
            "t_at_12_s": float(times[12] if 12 in times else np.nan)}


def hybrid_breakdown(B=16384) -> dict:
    """full hybrid solve_batch vs (standalone lin + standalone jfed):
    the difference is XLA staging glue + inter-kernel overheads."""
    from .phases import _bench_setup, _time_solve
    from ..models.augmented import make_mpc_dynamics
    from ..ops import MPCConfig, SQPSolver
    from ..ops.sqp import init_carry

    dtype = jnp.float32
    p, x0, y_ref, rgp = _bench_setup(B, dtype)
    cfg = MPCConfig(u_ref=float(p.hover_input))
    solver = SQPSolver(cfg, make_mpc_dynamics(p))
    carry = jax.vmap(lambda x: init_carry(cfg, x))(x0)

    full_s = _time_solve(solver, carry, x0, y_ref, rgp)

    # standalone lin kernel at the real operating point (with RGP aug)
    from ..ops.pallas.lin_kernel import make_linearizer_pallas
    from ..models.augmented import FoldedDrag, fold_drag

    N, nu, ntb = cfg.n_nodes, 4, B // LANE
    lin = make_linearizer_pallas(p, cfg.dt)
    Xl = jnp.broadcast_to(x0[:, None, :], (B, N, 13)).transpose(1, 0, 2).reshape(N * B, 13)
    Ul = jnp.full((N * B, nu), float(p.hover_input), dtype)
    folded = fold_drag(rgp)

    def cols(a):
        a = jnp.moveaxis(a, 0, -1)
        base = a.shape[:-1]
        a = jnp.broadcast_to(a[..., None, :], base + (N, B))
        return a.reshape(base + (N * B,))

    aug_cols = FoldedDrag(*(cols(leaf) for leaf in folded))
    interp = _interpret()

    def make_lin(K):
        @jax.jit
        def f(x):
            def body(x, _):
                xp, J = lin(x, Ul, aug_cols, interpret=interp,
                            tiled_out=True, out_layout=(N, ntb))
                s = xp.sum() + J.sum()
                return x + 0.0 * s, s
            _, ys = jax.lax.scan(body, x, None, length=K)
            return ys.sum()
        return lambda: f(Xl)

    lin_s = _slope_time(make_lin, Ks=(5, 50))
    jf = jfed_standalone(B, iters_grid=(12,))
    jfed_s = jf["per_iters_seconds"]["12"]

    return {
        "batch": B,
        "full_hybrid_s": full_s,
        "lin_standalone_s": lin_s,
        "jfed_standalone_12it_s": jfed_s,
        "glue_s": full_s - lin_s - jfed_s,
        "glue_fraction": (full_s - lin_s - jfed_s) / full_s,
        "us_per_solve": full_s / B * 1e6,
    }


# ------------------------------------------------------------------ #
# (d0, d1) transpose cost on the Hessian tile shape
# ------------------------------------------------------------------ #

def _mirror_kernel(x_ref, o_ref, *, nz: int, reps: int):
    x = x_ref[0]
    r3 = jax.lax.broadcasted_iota(jnp.int32, (nz, nz, LANE), 0)
    k3 = jax.lax.broadcasted_iota(jnp.int32, (nz, nz, LANE), 1)
    acc = x
    for i in range(reps):
        low = jnp.where(r3 > k3, acc, 0.0)
        acc = acc + jnp.swapaxes(low, 0, 1) * (1.0 + 1e-6 * i)
    o_ref[0] = acc


def _elem_kernel(x_ref, o_ref, *, nz: int, reps: int):
    x = x_ref[0]
    r3 = jax.lax.broadcasted_iota(jnp.int32, (nz, nz, LANE), 0)
    k3 = jax.lax.broadcasted_iota(jnp.int32, (nz, nz, LANE), 1)
    acc = x
    for i in range(reps):
        low = jnp.where(r3 > k3, acc, 0.0)
        acc = acc + low * (1.0 + 1e-6 * i)
    o_ref[0] = acc


def transpose_probe(nz=40, ntb=128, reps=4) -> dict:
    """Per-tile cost of the masked mirror H + strict_lower(H)^T vs the same
    op without the transpose.  Difference/reps = one (nz, nz, L) sublane
    transpose."""
    dtype = jnp.float32
    x = jax.random.normal(jax.random.PRNGKey(0), (ntb, nz, nz, LANE), dtype)
    interp = _interpret()

    def run(kern):
        call = pl.pallas_call(
            functools.partial(kern, nz=nz, reps=reps),
            grid=(ntb,),
            in_specs=[pl.BlockSpec((1, nz, nz, LANE), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, nz, nz, LANE), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ntb, nz, nz, LANE), dtype),
            interpret=interp,
        )

        def make(K):
            @jax.jit
            def f(x):
                def body(x, _):
                    y = call(x)
                    s = y.sum()
                    return x + 0.0 * s, s
                _, ys = jax.lax.scan(body, x, None, length=K)
                return ys.sum()
            return lambda: f(x)

        return _slope_time(make, Ks=(2, 20))

    t_mirror = run(_mirror_kernel)
    t_elem = run(_elem_kernel)
    per_transpose = (t_mirror - t_elem) / reps / ntb
    return {"mirror_s": t_mirror, "elem_s": t_elem,
            "transpose_per_tile_s": per_transpose,
            "transpose_all_tiles_s": per_transpose * ntb,
            "note": f"nz={nz}, ntb={ntb}, reps={reps}"}


# ------------------------------------------------------------------ #
# Riccati-IPM kernel phase profile (VERDICT r4 next #3)
# ------------------------------------------------------------------ #

def executed_riccati_flops(N=10, nx=13, nu=4, iters=12):
    """Per-solve VPU FLOPs the lanes-batched Riccati-IPM kernel executes,
    mirroring `ops/pallas/riccati_kernel._riccati_ipm_kernel` loop-by-loop
    (FMA = 2; after the round-5 bitwise-transpose symmetrization — the
    second product orders of G/T/U2 are no longer computed)."""
    # ---- per backward stage ----
    stage = 0
    stage += 2 * (nx + nu) * nx * nx      # Wt + Vt: A^T P / B^T P
    stage += 2 * nx * (nu * nu + nu * nx)  # G + S sweeps
    stage += nu * nu                       # G sym add (transpose is free)
    stage += 2 * nx * nu                   # rhs2 += B^T p
    # 4x4 Cholesky + joint (nx+1)-rhs fwd/back substitution
    stage += 2 * (nu * (nu - 1) // 2) * 2  # in-panel column updates
    stage += 2 * 2 * (nu * (nu - 1) // 2) * (nx + 1)  # both substitutions
    stage += 2 * nu * (nx + 1)             # diagonal scalings
    stage += 2 * nx * nx * nx              # T = A^T P A
    stage += 2 * nu * nx * nx              # U2 = S^T K
    stage += 4 * nx * nx                   # P' = Q + sym(T) - sym(U2) adds
    stage += 2 * (nx + nx * nx + nu * nx)  # qhat, A^T p, K^T rhs2
    # ---- per-iteration, outside the backward sweep ----
    per_iter = N * stage
    per_iter += 2 * N * ((nx + nu) * nx)   # rollout(du)
    per_iter += N * (2 * nu * nx + 2 * (nx + nu) * nx)  # forward Newton
    per_iter += 30 * N * nu                # gap/dbar/rhat/steps vector ops
    return {"per_stage": stage, "per_iter": per_iter,
            "total": iters * per_iter}


def riccati_profile(Ns=(10, 20, 40), B=1024, iters_grid=(2, 6, 12)) -> dict:
    """t(iters) line fit of the production Riccati solve_batch path at
    several horizons: slope = per-IPM-iteration cost (one Riccati sweep),
    intercept = lin kernel + staging + the final rollout + the XLA
    line-search finish (`_riccati_finish` — the only non-Pallas piece)."""
    import numpy as np
    from ..models.augmented import make_mpc_dynamics
    from ..models.params import hummingbird_params
    from ..ops import MPCConfig, SQPSolver
    from ..ops.sqp import init_carry

    dtype = jnp.float32
    p = hummingbird_params(dtype=dtype)
    vpu = 2.15e12                         # measured streaming SoL (phases)
    out = {}
    for N in Ns:
        times = {}
        for it in iters_grid:
            cfg = MPCConfig(n_nodes=N, t_horizon=0.1 * N, qp_iters=it,
                            u_ref=float(p.hover_input), qp_method="riccati")
            solver = SQPSolver(cfg, make_mpc_dynamics(p))
            x0 = jnp.zeros((B, 13), dtype).at[:, 3].set(1.0).at[:, 2].set(3.0)
            x0 = x0.at[:, 7].add(jnp.linspace(-2, 2, B, dtype=dtype))
            y_ref = jnp.broadcast_to(x0[:, None, :], (B, N, 13))
            carry = jax.vmap(lambda x: init_carry(cfg, x))(x0)

            def make(K):
                @jax.jit
                def f(c):
                    def body(c, _):
                        c2, sol = solver.solve_batch(c, x0, y_ref,
                                                     y_ref[:, -1])
                        return c2, sol.cost.sum()
                    _, costs = jax.lax.scan(body, c, None, length=K)
                    return costs.sum()
                return lambda: f(carry)

            times[it] = _slope_time(make, Ks=(2, 10))
        its = np.asarray(sorted(times), np.float64)
        ts = np.asarray([times[int(i)] for i in its])
        slope, intercept = np.polyfit(its, ts, 1)
        fl = executed_riccati_flops(N=N)
        out[str(N)] = {
            "per_iters_seconds": {str(k): v for k, v in times.items()},
            "sweep_slope_s": float(slope),
            "intercept_s": float(intercept),
            "us_per_solve_at_12": float((intercept + 12 * slope) / B * 1e6),
            "executed_flops_per_iter": fl["per_iter"],
            "sweep_vpu_utilization": float(
                fl["per_iter"] * B / slope / vpu) if slope > 0 else None,
        }
    return out


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--what", choices=("breakdown", "jfed", "transpose",
                                       "riccati", "all"),
                    default="all")
    ap.add_argument("--batch", type=int, default=16384)
    a = ap.parse_args(argv)
    out = {}
    if a.what in ("jfed",):
        out["jfed"] = jfed_standalone(a.batch)
    if a.what in ("breakdown", "all"):
        out["breakdown"] = hybrid_breakdown(a.batch)
    if a.what in ("transpose", "all"):
        out["transpose"] = transpose_probe()
    if a.what in ("riccati",):
        out["riccati"] = riccati_profile()
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
