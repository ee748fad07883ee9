"""Tracing / profiling utilities.

The reference's only instrumentation is wall-clock brackets around the acados
call (`t_cpu`, `elapsed_during_mpc` — SURVEY §5.1).  Here:

- `timed` / `Stopwatch`: wall-clock phase timers with block_until_ready.
- `profile_solver_phases`: per-phase breakdown of one batched MPC solve
  (linearize / condense+assemble / QP / update) — the flamegraph-lite that
  drove the Pallas-kernel optimization.
- `trace`: context manager around `jax.profiler.trace` emitting a TensorBoard
  / Perfetto trace directory for the real thing.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


class Stopwatch:
    """Accumulating named phase timer."""

    def __init__(self):
        self.phases: dict = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.phases[name] = self.phases.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.phases.values())
        lines = [f"total {total * 1e3:.2f} ms"]
        for k, v in sorted(self.phases.items(), key=lambda kv: -kv[1]):
            lines.append(f"  {k:24s} {v * 1e3:8.2f} ms  {100 * v / total:5.1f}%")
        return "\n".join(lines)


def timed(fn: Callable, *args, iters: int = 10, warmup: bool = True) -> float:
    """Median-free steady-state seconds/call with compile excluded."""
    if warmup:
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def trace(log_dir: str):
    """XLA-level trace (TensorBoard 'profile' plugin / Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def profile_solver_phases(solver, carry, x0, y_ref, aug=None, iters: int = 10) -> dict:
    """Wall-clock per-phase breakdown of one batched solve.  All inputs
    batch-major (leading B)."""
    from ..ops.pallas.qp_kernel import solve_box_qp_pdip_pallas
    from ..ops.sqp import _interpret_mode

    B = x0.shape[0]
    cfg = solver.cfg

    lin = jax.jit(jax.vmap(lambda X, U, a: solver._linearize(X, U, a))
                  if aug is not None else
                  jax.vmap(lambda X, U: solver._linearize(X, U, None)))
    lin_args = (carry.X, carry.U, aug) if aug is not None else (carry.X, carry.U)

    if aug is not None:
        asm = jax.jit(jax.vmap(solver._assemble))
        asm_args = (carry.X, carry.U, x0, y_ref, y_ref[:, -1], aug)
    else:
        asm = jax.jit(jax.vmap(lambda X, U, x, yr, yN: solver._assemble(X, U, x, yr, yN, None)))
        asm_args = (carry.X, carry.U, x0, y_ref, y_ref[:, -1])

    H, g, lb, ub, M, d = asm(*asm_args)
    qp = jax.jit(lambda H, g, lb, ub: solve_box_qp_pdip_pallas(
        H, g, lb, ub, iters=cfg.qp_iters, interpret=_interpret_mode()))

    full = jax.jit(lambda c, x, yr, a: solver.solve_batch(c, x, yr, yr[:, -1], a)[1].U)

    res = {
        "linearize_s": timed(lin, *lin_args, iters=iters),
        "assemble_s": timed(asm, *asm_args, iters=iters),
        "qp_s": timed(qp, H, g, lb, ub, iters=iters),
        "full_solve_s": timed(full, carry, x0, y_ref, aug, iters=iters),
        "batch": B,
    }
    res["solves_per_s"] = B / res["full_solve_s"]
    return res
