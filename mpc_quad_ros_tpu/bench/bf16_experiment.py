"""bf16-tangent measured experiment (VERDICT r4 next #8, optional).

Question: the lin kernel's tangent passes are register-resident f32 at
~3.4 TF/s — would bf16 tangents (linearization point and derivative
arithmetic in bf16, primal and everything downstream f32) buy real time,
and do the condensed-QP numerics survive?

Protocol (run on the TPU; one JSON blob to stdout, written up in
outputs/roofline/BF16_TANGENTS_r05.md):

1. TIMING — slope-timed lin kernel at B=16384 with the RGP aug, f32 vs
   bf16 tangents.
2. ACCURACY — one Gauss-Newton step through the production J-fed kernel at
   B=512 on hard instances (random +-3 m/s velocity errors), J from f32 vs
   bf16 tangents, each compared against the f64-converged oracle of the
   TRUE QP (f64 jacfwd linearization + 60-iteration f64 IPM on CPU) — the
   repo's each-vs-f64-oracle comparison rule.  Also reports the projected-
   gradient KKT residual of each solution against ITS OWN f32 QP.
"""

from __future__ import annotations

import functools
import json

import numpy as np
import jax
import jax.numpy as jnp

from .phases import _interpret, _slope_time

LANE = 128


def timing(B=16384):
    from ..models.augmented import FoldedDrag, fold_drag
    from ..models.params import hummingbird_params
    from ..ops.pallas.lin_kernel import make_linearizer_pallas
    from .phases import _bench_setup

    dtype = jnp.float32
    p, x0, y_ref, rgp = _bench_setup(B, dtype)
    N, nu, ntb = 10, 4, B // LANE
    lin = make_linearizer_pallas(p, 0.1)
    Xl = jnp.broadcast_to(x0[:, None, :], (B, N, 13)).transpose(1, 0, 2).reshape(N * B, 13)
    Ul = jnp.full((N * B, nu), float(p.hover_input), dtype)
    folded = fold_drag(rgp)
    aug = FoldedDrag(*(jnp.moveaxis(l, 0, -1) for l in folded))
    interp = _interpret()

    out = {}
    for name, td in (("f32", None), ("bf16", jnp.bfloat16)):
        def make(K, td=td):
            @jax.jit
            def f(x):
                def body(x, _):
                    xp, J = lin(x, Ul, aug, interpret=interp, tiled_out=True,
                                out_layout=(N, ntb), aug_per_scenario=True,
                                tangent_dtype=td)
                    s = xp.sum() + J.sum()
                    return x + 0.0 * s, s
                _, ys = jax.lax.scan(body, x, None, length=K)
                return ys.sum()
            return lambda: f(Xl)

        out[f"lin_{name}_s"] = _slope_time(make, Ks=(5, 50))
    out["speedup"] = out["lin_f32_s"] / out["lin_bf16_s"]
    return out


def accuracy(B=512, iters=12):
    from ..models.augmented import make_mpc_dynamics
    from ..models.params import hummingbird_params
    from ..ops import MPCConfig, SQPSolver
    from ..ops.pallas.lin_kernel import make_linearizer_pallas
    from ..ops.pallas.sqp_fused_kernel import fused_sqp_from_J
    from ..ops.qp import solve_box_qp_pdip
    from ..ops.sqp import init_carry

    dtype = jnp.float32
    p = hummingbird_params(dtype=dtype)
    cfg = MPCConfig(u_ref=float(p.hover_input), qp_iters=iters)
    N, nu = cfg.n_nodes, 4
    nz = N * nu
    ntb = B // LANE
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((B, 13), dtype).at[:, 3].set(1.0).at[:, 2].set(3.0)
    x0 = x0.at[:, 7:10].add(jax.random.uniform(key, (B, 3), dtype, -3, 3))
    y_ref = jnp.broadcast_to(x0[:, None, :], (B, N, 13))
    carry = jax.vmap(lambda x: init_carry(cfg, x))(x0)
    X, U = carry.X, carry.U

    lin = make_linearizer_pallas(p, cfg.dt)
    Xl = X[:, :-1].transpose(1, 0, 2).reshape(N * B, 13)
    Ul = U.transpose(1, 0, 2).reshape(N * B, nu)
    interp = _interpret()

    def tile(a):
        a = a.reshape((ntb, 128) + a.shape[1:])
        return jnp.moveaxis(a, 1, -1)

    def untile(at):
        return jnp.moveaxis(at, -1, 1).reshape((B,) + at.shape[1:-1])

    X_t = tile(X)
    ex0_t = X_t - tile(jnp.concatenate([y_ref, y_ref[:, -1:]], axis=1))
    dx0_t = tile(x0 - X[:, 0])
    Uf_t = tile(U.reshape(B, nz))
    rw_full = jnp.tile(jnp.asarray(cfg.r_cost, dtype) * cfg.stage_scale, N)
    gu_t = (Uf_t - cfg.u_ref) * rw_full[None, :, None]
    lbt = cfg.u_lb - Uf_t
    ubt = cfg.u_ub - Uf_t
    q_s, q_term, rw_s = cfg.weight_tuples()

    zs = {}
    for name, td in (("f32", None), ("bf16", jnp.bfloat16)):
        xp_t, J_t = lin(Xl, Ul, None, interpret=interp, tiled_out=True,
                        out_layout=(N, ntb), tangent_dtype=td)
        J_t = J_t.reshape(ntb, N, 17, 13, 128)
        xp_t = xp_t.reshape(ntb, N, 13, 128)
        r_t = xp_t - X_t[:, 1:]
        zt, Xd_t, kkt_t, _, _ = fused_sqp_from_J(
            J_t, r_t, dx0_t, ex0_t, gu_t, lbt, ubt, None,
            q_s, q_term, rw_s, iters, interpret=interp)
        zs[name] = (np.asarray(untile(zt)), np.asarray(untile(kkt_t)[:, 0]))

    # f64 oracle of the TRUE QP on CPU: f64 jacfwd linearization + 60-it IPM
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        f64 = jnp.float64
        p64 = jax.tree.map(lambda a: jnp.asarray(np.asarray(a), f64), p)
        s64 = SQPSolver(cfg, make_mpc_dynamics(p64))
        H, g, lb, ub, M, d = jax.jit(jax.vmap(
            lambda X1, U1, x01, yr, yrN: s64._assemble(X1, U1, x01, yr, yrN,
                                                       None)))(
            jnp.asarray(np.asarray(X), f64), jnp.asarray(np.asarray(U), f64),
            jnp.asarray(np.asarray(x0), f64),
            jnp.asarray(np.asarray(y_ref), f64),
            jnp.asarray(np.asarray(y_ref[:, -1]), f64))
        z_star = np.asarray(jax.jit(jax.vmap(
            lambda H1, g1, l1, u1: solve_box_qp_pdip(H1, g1, l1, u1,
                                                     iters=60)))(
            H, g, lb, ub))

    out = {}
    for name, (z, kkt) in zs.items():
        e = np.abs(z - z_star)
        out[name] = {
            "z_vs_f64_oracle_mean": float(e.mean()),
            "z_vs_f64_oracle_p95": float(np.percentile(e, 95)),
            "z_vs_f64_oracle_max": float(e.max()),
            "own_qp_kkt_max": float(kkt.max()),
        }
    e12 = np.abs(zs["f32"][0] - zs["bf16"][0])
    out["f32_vs_bf16_mean"] = float(e12.mean())
    out["f32_vs_bf16_max"] = float(e12.max())
    return out


def main():
    print(json.dumps({"timing": timing(), "accuracy": accuracy()}, indent=2))


if __name__ == "__main__":
    main()
