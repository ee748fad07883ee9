"""Per-phase device-time breakdown of the fused SQP step + VPU roofline.

VERDICT r2 weak #3: "MFU is 2.3% and nobody knows where the time goes."
This module answers it with measurements, not analysis:

1. `fused_phase_split` — the fused kernel's time as a function of the IPM
   iteration count: t(iters) = intercept + slope * iters.  The slope IS the
   per-factorization IPM cost (Cholesky + two substitutions + steps); the
   intercept is linearization + condensing + KKT + the dX = Mz + d
   expansion (everything outside the fori_loop).  Cross-checked against the
   standalone split kernels (lin / condense / QP), timed the same way.

2. `vpu_peak` — a measured VPU speed-of-light: a Pallas kernel of nothing
   but independent f32 FMA chains on resident vregs (no HBM traffic beyond
   one tile in/out, no MXU).  The fused kernel is VPU-bound by construction
   — every op is an elementwise (nz, L) / (nz, nz, L) sweep; there are no
   matmuls big enough for the MXU — so the honest roofline denominator is
   this number, not the chip's headline MXU TFLOP/s (which assumes 128x128
   contractions this problem shape cannot feed).

3. `phase_table` — joins both into per-phase VPU utilization + a
   speed-of-light summary (printed as JSON; run on the real chip).

All timings chain work inside ONE jit dispatch (lax.scan) per CLAUDE.md —
wall-clocking single dispatches here measures the axon tunnel (~30 ms), not
the chip.
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ------------------------------------------------------------------ #
# VPU speed-of-light microbenchmark
# ------------------------------------------------------------------ #

def _fma_kernel(x_ref, o_ref, *, chains: int, steps: int):
    """`chains` independent FMA chains over the whole (S, 128) block,
    `steps` long each: pure VPU f32 throughput, zero memory traffic in the
    loop (everything stays in vregs)."""
    x = x_ref[:]
    accs = [x * (1.0 + 0.001 * i) for i in range(chains)]
    a = x * 0.9999  # data-dependent multiplier: nothing constant-folds
    for _ in range(steps):
        accs = [acc * a + x for acc in accs]
    out = accs[0]
    for acc in accs[1:]:
        out = out + acc
    o_ref[:] = out


def vpu_peak(sublanes: int = 256, chains: int = 8, steps: int = 256,
             grid: int = 512, reps: int = 20) -> dict:
    """Measured sustained f32 VPU FLOP/s on this chip (FMA = 2 FLOPs)."""
    S, L = sublanes, 128
    x = jnp.ones((grid, S, L), jnp.float32) * 0.5

    kern = functools.partial(_fma_kernel, chains=chains, steps=steps)
    call = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec((1, S, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, S, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid, S, L), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )

    @jax.jit
    def chained(x):
        def body(c, _):
            y = call(c)
            return y, ()
        y, _ = jax.lax.scan(body, x, None, length=reps)
        return y

    jax.block_until_ready(chained(x))
    t0 = time.perf_counter()
    jax.block_until_ready(chained(x))
    dt = (time.perf_counter() - t0) / reps
    flops = 2.0 * chains * steps * grid * S * L  # FMA = 2
    return {"vpu_f32_flops_per_s": flops / dt,
            "vpu_f32_tflops": flops / dt / 1e12,
            "kernel_ms": dt * 1e3}


# ------------------------------------------------------------------ #
# fused-kernel phase split
# ------------------------------------------------------------------ #

def _bench_setup(B, dtype=jnp.float32, nb=10):
    from ..models.params import hummingbird_params
    from ..models.augmented import make_mpc_dynamics
    from ..models.rgp import rgp_init
    from ..ops import MPCConfig, SQPSolver
    from ..ops.sqp import init_carry

    p = hummingbird_params(dtype=dtype)
    rgp1 = rgp_init(jnp.linspace(-10, 10, nb, dtype=dtype), theta=(3.0, 0.1, 0.01))
    rgp = jax.tree.map(lambda a: jnp.broadcast_to(a, (B, 3) + a.shape), rgp1)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((B, 13), dtype).at[:, 3].set(1.0).at[:, 2].set(3.0)
    x0 = x0.at[:, 7:10].add(jax.random.uniform(key, (B, 3), dtype, -3, 3))
    y_ref = jnp.broadcast_to(x0[:, None, :], (B, 10, 13))
    return p, x0, y_ref, rgp


def _time_solve(solver, carry, x0, y_ref, rgp, scan_len=10, reps=3) -> float:
    """Seconds per batched solve, chained in one dispatch."""
    @jax.jit
    def f(c):
        def body(c, _):
            c2, sol = solver.solve_batch(c, x0, y_ref, y_ref[:, -1], rgp)
            return c2, sol.cost.sum()
        return jax.lax.scan(body, c, None, length=scan_len)

    jax.block_until_ready(f(carry)[1])
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(f(carry)[1])
    return (time.perf_counter() - t0) / (reps * scan_len)


def fused_phase_split(B: int = 16384, iters_grid=(0, 4, 8, 12),
                      scan_len: int = 10) -> dict:
    """t(qp_iters) line fit on the FUSED pipeline + standalone split-kernel
    cross-checks, all at batch B."""
    from ..models.augmented import make_mpc_dynamics
    from ..models.params import hummingbird_params
    from ..ops import MPCConfig, SQPSolver
    from ..ops.sqp import init_carry

    dtype = jnp.float32
    p, x0, y_ref, rgp = _bench_setup(B, dtype)

    # t is linear in qp_iters (the fori_loop body is iteration-invariant);
    # fit the line on iters >= 1 — slope = per-factorization cost,
    # intercept = everything outside the loop (lin+condense+KKT+expand+glue)
    times = {}
    for it in [i for i in iters_grid if i >= 1]:
        cfg = MPCConfig(u_ref=float(p.hover_input), qp_iters=it)
        solver = SQPSolver(cfg, make_mpc_dynamics(p))
        carry = jax.vmap(lambda x: init_carry(cfg, x))(x0)
        times[it] = _time_solve(solver, carry, x0, y_ref, rgp,
                                scan_len=scan_len)

    its = np.asarray(sorted(times), np.float64)
    ts = np.asarray([times[int(i)] for i in its])
    slope, intercept = np.polyfit(its, ts, 1)

    per_solve = times[max(times)] / B
    out = {
        "batch": B,
        "per_iters_seconds": {str(k): v for k, v in times.items()},
        "ipm_per_iteration_s": float(slope),
        "non_ipm_intercept_s": float(intercept),
        "ipm_fraction_at_12": float(12 * slope / (12 * slope + intercept)),
        "us_per_solve_at_12": float(times.get(12, ts[-1]) / B * 1e6),
    }

    # ---- standalone split kernels, timed the same chained way ----
    from ..ops.pallas.lin_kernel import make_linearizer_pallas

    N, nu = 10, 4
    lin = make_linearizer_pallas(p, 0.1)
    Xl = jnp.broadcast_to(x0[:, None, :], (B, N, 13)).transpose(1, 0, 2).reshape(N * B, 13)
    Ul = jnp.full((N * B, nu), 0.16, dtype)
    interp = jax.default_backend() != "tpu"

    @jax.jit
    def lin_chain(x):
        # per-step output consumed by the scan carry's ys so nothing is DCE'd
        def body(x, _):
            xp, J = lin(x, Ul, None, interpret=interp, tiled_out=True)
            return x, (xp.sum() + J.sum())
        return jax.lax.scan(body, x, None, length=scan_len)

    jax.block_until_ready(lin_chain(Xl)[1])
    t0 = time.perf_counter()
    for _ in range(3):
        jax.block_until_ready(lin_chain(Xl)[1])
    out["lin_kernel_s"] = (time.perf_counter() - t0) / (3 * scan_len)

    # QP kernel standalone at 12 iters (random SPD H of the real scale)
    from ..ops.pallas.qp_kernel import solve_box_qp_pdip_pallas_tiled

    nz = N * nu
    ntb = B // 128
    key = jax.random.PRNGKey(1)
    G = jax.random.normal(key, (ntb, nz, nz, 128), dtype) * 0.1
    Ht = jnp.einsum("tikl,tjkl->tijl", G, G) + 4.0 * jnp.eye(nz, dtype=dtype)[None, :, :, None]
    gt = jax.random.normal(jax.random.PRNGKey(2), (ntb, nz, 128), dtype)
    lbt = jnp.full((ntb, nz, 128), -0.16, dtype)
    ubt = jnp.full((ntb, nz, 128), 0.84, dtype)

    @jax.jit
    def qp_chain(g):
        def body(g, _):
            z = solve_box_qp_pdip_pallas_tiled(Ht, g, lbt, ubt, iters=12,
                                               interpret=interp)
            return g + 0.0 * z, z.sum()
        return jax.lax.scan(body, g, None, length=scan_len)

    jax.block_until_ready(qp_chain(gt)[1])
    t0 = time.perf_counter()
    for _ in range(3):
        jax.block_until_ready(qp_chain(gt)[1])
    out["qp_kernel_12it_s"] = (time.perf_counter() - t0) / (3 * scan_len)
    return out


def analytic_vpu_flops(N=10, nx=13, nu=4, nt=17, nb=10, qp_iters=12,
                       f_eval_flops=600):
    """Per-solve VPU FLOPs by phase (all ops in the fused kernel are
    elementwise lane sweeps, so VPU FLOPs == total FLOPs)."""
    nz = N * nu
    lin = N * 4 * (1 + nt) * f_eval_flops
    condense = N * (2 * nx * nx * nz) + (N + 1) * (2 * nz * nz * nx)
    # per IPM iteration: Hz matvec 2nz^2; Cholesky nz^3/3; fwd+back subst
    # 2*2*nz^2/2 each ~ 2nz^2; dual/step updates ~ 20nz
    ipm1 = 2 * nz * nz + nz**3 // 3 + 4 * nz * nz + 20 * nz
    expand = (N + 1) * 2 * nx * nz
    return {"lin": lin, "condense": condense, "ipm_per_iter": ipm1,
            "ipm_total": qp_iters * ipm1, "expand": expand,
            "total": lin + condense + qp_iters * ipm1 + expand}


def phase_table(B: int = 16384) -> dict:
    peak = vpu_peak()
    split = fused_phase_split(B)
    fl = analytic_vpu_flops()
    vpu = peak["vpu_f32_flops_per_s"]

    ipm_f = fl["ipm_per_iter"] * B / split["ipm_per_iteration_s"]
    non_ipm_f = (fl["lin"] + fl["condense"] + fl["expand"]) * B / split["non_ipm_intercept_s"]
    return {
        "measured_vpu_peak_tflops": peak["vpu_f32_tflops"],
        "fused_split": split,
        "analytic_flops_per_solve": fl,
        "ipm_vpu_utilization": ipm_f / vpu,
        "non_ipm_vpu_utilization": non_ipm_f / vpu,
        "device_kind": jax.devices()[0].device_kind,
    }


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--what", choices=("vpu_peak", "phases", "table"),
                    default="table")
    ap.add_argument("--batch", type=int, default=16384)
    a = ap.parse_args(argv)
    fn = {"vpu_peak": vpu_peak,
          "phases": lambda: fused_phase_split(a.batch),
          "table": lambda: phase_table(a.batch)}[a.what]
    print(json.dumps(fn(), indent=2))


if __name__ == "__main__":
    main()
