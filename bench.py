"""Benchmark: batched MPC solves/s on one TPU chip.

Headline metric per BASELINE.md: batched SQP-RTI MPC solves per second at the
reference operating point (N=10 nodes, 1 s horizon, nx=13, nu=4, u in [0,1],
online-RGP-augmented dynamics with 10 basis vectors/axis).  The reference's
implied budget is one acados solve per 10 ms (100 Hz odometry callback,
`mpc_controller_node.py:116,228`); the BASELINE.json target for this
framework is >= 10,000 solves/s per host.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is value / 10,000 (the north-star target, since the reference
publishes no absolute numbers — BASELINE.md)."""

import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

# persistent compile cache: repeated bench runs skip the ~20-40s XLA compile
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def main():
    from mpc_quad_ros_tpu.models.params import hummingbird_params
    from mpc_quad_ros_tpu.models.augmented import make_mpc_dynamics
    from mpc_quad_ros_tpu.models.rgp import rgp_init
    from mpc_quad_ros_tpu.ops import MPCConfig, SQPSolver
    from mpc_quad_ros_tpu.ops.sqp import SolverCarry, init_carry

    dtype = jnp.float32
    B = int(os.environ.get("BENCH_BATCH", 4096))
    iters = int(os.environ.get("BENCH_ITERS", 20))

    p = hummingbird_params(dtype=dtype)
    cfg = MPCConfig(u_ref=float(p.hover_input))
    solver = SQPSolver(cfg, make_mpc_dynamics(p))

    rgp1 = rgp_init(jnp.linspace(-10, 10, 10, dtype=dtype), theta=(3.0, 0.1, 0.01))
    rgp = jax.tree.map(lambda a: jnp.broadcast_to(a, (B, 3) + a.shape), rgp1)

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    x0 = jnp.zeros((B, 13), dtype=dtype).at[:, 3].set(1.0).at[:, 2].set(3.0)
    x0 = x0.at[:, 7:10].add(jax.random.uniform(k1, (B, 3), dtype, -3.0, 3.0))
    y_ref = jnp.broadcast_to(x0[:, None, :], (B, cfg.n_nodes, 13))
    y_ref = y_ref.at[:, :, 0].add(
        jnp.linspace(0, 1, cfg.n_nodes, dtype=dtype)[None, :]
        * jax.random.uniform(k2, (B, 1), dtype, 1.0, 5.0)
    )
    carry = jax.vmap(lambda x: init_carry(cfg, x))(x0)

    @jax.jit
    def chained_solves(carry, x0, y_ref, rgp):
        # `iters` warm-started solves chained in ONE dispatch (a lax.scan,
        # exactly how the closed-loop episode drives the solver) — measures
        # device throughput of the all-Pallas tiled pipeline without paying
        # the host->TPU dispatch round-trip per solve
        def body(c, _):
            c2, sol = solver.solve_batch(c, x0, y_ref, y_ref[:, -1], rgp)
            return c2, sol.cost.sum()
        return jax.lax.scan(body, carry, None, length=iters)

    # compile + warmup
    c, costs = chained_solves(carry, x0, y_ref, rgp)
    jax.block_until_ready(costs)

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        c, costs = chained_solves(carry, x0, y_ref, rgp)
        jax.block_until_ready(costs)
    dt = time.perf_counter() - t0

    solves_per_s = B * iters * reps / dt
    print(
        json.dumps(
            {
                "metric": "batched MPC solves/s (N=10, RGP-augmented, 1 chip)",
                "value": round(solves_per_s, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / 10000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
