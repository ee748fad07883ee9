"""Pallas TPU kernel: lanes-batched RK4 shooting-map linearization.

The last hot phase of the batched SQP step: the discrete step
x⁺ = RK4(f, x, u) and its Jacobians A = ∂x⁺/∂x, B = ∂x⁺/∂u along the
warm-start trajectory.  The XLA SoA formulation (`models/dynamics_soa.py`)
already keeps the flattened scenario-node batch in the vector lanes, but its
~3400 unfused elementwise ops bounce (13, M) intermediates through HBM
(~31 ms at B*N=40960 on v5e).  Here one kernel instance linearizes 128
columns: the quadrotor dynamics (same formulas as `dynamics_soa`, parameters
baked in as scalar constants) and the 17 forward-mode tangents through all
four RK4 stages — built by `jax.jvp` at trace time, so the derivative code is
never hand-written — run entirely in VMEM.

Oracle: `linearize_rk4_soa` (tests pin both against jacfwd of the AoS model).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_TILE = 128
NX, NU, NT = 13, 4, 17


def _mk_drag_mean(aug):
    """The folded-RGP drag mean as a `custom_jvp` over the body velocity.

    Each axis's mean is a 1-D GP in vb[axis] alone (the RBF diff broadcasts
    per axis), so the Jacobian wrt vb is DIAGONAL: dmean_a/dvb_a =
    sum_b k_ab (-(vb_a - X_ab)/L_a^2) w_ab.  The custom rule computes
    (mean, Jdiag) from the primal once — XLA CSEs the identical subgraph
    across the 17 per-tangent jvp traces of `_lin_kernel` — and each
    tangent pays ONE multiply, where plain AD re-swept the (3, nb, L)
    kernel-row products per tangent (~7k FLOPs/column at nb=10).  The
    tangent value is algebraically identical to AD's (dvb factored out of
    the basis sum; last-ulp only), applied to every pipeline in lockstep
    via this shared dynamics builder."""
    X_b0, w_b0, L_b0, sf_b0 = aug    # (3, nb, L), (3, nb, L), (3, L), (3, L)

    def k_of(vb, X_b, L_b, sf_b):
        diff = vb[:, None, :] - X_b
        k = sf_b[:, None, :] ** 2 * jnp.exp(-0.5 * diff**2 / (L_b[:, None, :] ** 2))
        return diff, k

    # the aug leaves are explicit ARGUMENTS, not closure captures: Mosaic's
    # custom_jvp_call lowering rejects closure consts (num_consts != 0 ->
    # NotImplementedError); as plain operands they arrive with (unused,
    # DCE'd) zero tangents instead
    @jax.custom_jvp
    def mean_fn(vb, X_b, w_b, L_b, sf_b):
        _, k = k_of(vb, X_b, L_b, sf_b)
        return jnp.sum(k * w_b, axis=1)

    @mean_fn.defjvp
    def mean_jvp(primals, tangents):
        vb, X_b, w_b, L_b, sf_b = primals
        dvb = tangents[0]
        diff, k = k_of(vb, X_b, L_b, sf_b)
        kw = k * w_b
        mean = jnp.sum(kw, axis=1)
        Jdiag = jnp.sum(kw * (-diff / (L_b[:, None, :] ** 2)), axis=1)
        return mean, Jdiag * dvb

    return lambda vb: mean_fn(vb, X_b0, w_b0, L_b0, sf_b0)


def _make_f(p, nb: int | None):
    """The SoA MPC dynamics with every parameter a Python scalar (Pallas
    kernels cannot capture device-array constants).  Mirrors
    `make_mpc_dynamics_soa` / `_f_core`."""
    kt = [float(v) for v in np.asarray(p.rotor_functionality) * float(p.max_thrust)]
    y_f = [float(v) for v in np.asarray(p.y_f)]
    x_f = [float(v) for v in np.asarray(p.x_f)]
    z_l = [float(v) for v in np.asarray(p.z_l_tau)]
    # np.asarray, not jnp indexing: this may run while tracing an outer jit,
    # where any jnp op on the (concrete) params would return a tracer
    inv_m = 1.0 / float(p.mass)
    g2 = float(np.asarray(p.g)[2])
    a_payload_z = -(float(p.payload_mass) / float(p.mass)) * g2
    J0, J1, J2 = (float(v) for v in np.asarray(p.J))

    def f(x, u, aug):
        qw, qx, qy, qz = x[3], x[4], x[5], x[6]
        vx, vy, vz = x[7], x[8], x[9]
        wx, wy, wz = x[10], x[11], x[12]

        ft = [u[i] * kt[i] for i in range(4)]
        thrust = ft[0] + ft[1] + ft[2] + ft[3]

        dqw = 0.5 * (-wx * qx - wy * qy - wz * qz)
        dqx = 0.5 * (wx * qw + wz * qy - wy * qz)
        dqy = 0.5 * (wy * qw - wz * qx + wx * qz)
        dqz = 0.5 * (wz * qw + wy * qx - wx * qy)

        r11 = 1 - 2 * (qy * qy + qz * qz)
        r12 = 2 * (qx * qy - qw * qz)
        r13 = 2 * (qx * qz + qw * qy)
        r21 = 2 * (qx * qy + qw * qz)
        r22 = 1 - 2 * (qx * qx + qz * qz)
        r23 = 2 * (qy * qz - qw * qx)
        r31 = 2 * (qx * qz - qw * qy)
        r32 = 2 * (qy * qz + qw * qx)
        r33 = 1 - 2 * (qx * qx + qy * qy)

        a_m = thrust * inv_m
        avx = r13 * a_m
        avy = r23 * a_m
        avz = r33 * a_m - g2 + a_payload_z

        if aug is not None:
            vbx = r11 * vx + r21 * vy + r31 * vz
            vby = r12 * vx + r22 * vy + r32 * vz
            vbz = r13 * vx + r23 * vy + r33 * vz
            vb = jnp.stack([vbx, vby, vbz], axis=0)               # (3, L)
            mean = _mk_drag_mean(aug)(vb)                          # (3, L)
            avx = avx + r11 * mean[0] + r12 * mean[1] + r13 * mean[2]
            avy = avy + r21 * mean[0] + r22 * mean[1] + r23 * mean[2]
            avz = avz + r31 * mean[0] + r32 * mean[1] + r33 * mean[2]

        tx = ft[0] * y_f[0] + ft[1] * y_f[1] + ft[2] * y_f[2] + ft[3] * y_f[3]
        ty = -(ft[0] * x_f[0] + ft[1] * x_f[1] + ft[2] * x_f[2] + ft[3] * x_f[3])
        tz = ft[0] * z_l[0] + ft[1] * z_l[1] + ft[2] * z_l[2] + ft[3] * z_l[3]
        dwx = (tx + (J1 - J2) * wy * wz) / J0
        dwy = (ty + (J2 - J0) * wz * wx) / J1
        dwz = (tz + (J0 - J1) * wx * wy) / J2

        return jnp.stack(
            [vx, vy, vz, dqw, dqx, dqy, dqz, avx, avy, avz, dwx, dwy, dwz], axis=0
        )

    return f


def _lin_kernel(x_ref, u_ref, *refs, f, dt: float, with_aug: bool,
                tangent_dtype=None):
    if with_aug:
        Xb_ref, wb_ref, Lb_ref, sfb_ref, xp_ref, J_ref = refs
        aug = (Xb_ref[0], wb_ref[0], Lb_ref[0], sfb_ref[0])
    else:
        xp_ref, J_ref = refs
        aug = None

    x = x_ref[0]                    # (13, L)
    u = u_ref[0]                    # (4, L)
    dtype = x.dtype

    def make_step(aug_):
        def step(x, u):
            k1 = f(x, u, aug_)
            k2 = f(x + dt / 2 * k1, u, aug_)
            k3 = f(x + dt / 2 * k2, u, aug_)
            k4 = f(x + dt * k3, u, aug_)
            return x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        return step

    step = make_step(aug)

    # 17 separate jvp traces, NOT one vmapped `jax.linearize` pass: the
    # shared-primal form was tried (round 5) and measured SLOWER — 6.65 vs
    # 4.64 ms/call at B=16384 with the RGP aug — the (17, nx, L) batched
    # tangent intermediates wreck Mosaic's scheduling the same way the
    # all-in-one fused kernel's in-body linearization did (round-4 probe);
    # XLA CSEs the 17 recomputed primals here, so jvp pays no transcendental
    # duplication.  J is bitwise-identical either way (the hybrid==fused
    # assert in tests/test_pipeline_equivalence.py spans both forms).
    xp_ref[0] = step(x, u)

    # tangent_dtype: the MEASURED-EXPERIMENT knob of VERDICT r4 next #8 —
    # run the 17 tangent passes (linearization point AND derivative
    # arithmetic) in a lower precision (bf16), with the shooting primal and
    # everything downstream staying f32.  Not a production default: see
    # outputs/roofline/BF16_TANGENTS_r05.md for the accept/reject data.
    td = tangent_dtype or dtype
    xs, us = x.astype(td), u.astype(td)
    step_t = step if td == dtype else make_step(
        tuple(a.astype(td) for a in aug) if aug is not None else None)

    row_x = jax.lax.broadcasted_iota(jnp.int32, (NX, LANE_TILE), 0)
    row_u = jax.lax.broadcasted_iota(jnp.int32, (NU, LANE_TILE), 0)
    zx = jnp.zeros((NX, LANE_TILE), td)
    zu = jnp.zeros((NU, LANE_TILE), td)
    one = jnp.ones((), dtype)
    for i in range(NT):             # static unroll: 17 forward-mode tangents
        # one-hots built in the ref dtype then cast: where() straight into
        # bf16 hits a Mosaic i1 relayout bug ((8,128) -> (16,128) tiling)
        tx = (jnp.where(row_x == i, one, 0.0).astype(td) if i < NX else zx)
        tu = (jnp.where(row_u == i - NX, one, 0.0).astype(td) if i >= NX else zu)
        J_ref[0, i] = jax.jvp(step_t, (xs, us), (tx, tu))[1].astype(dtype)


@functools.partial(jax.jit, static_argnames=("f", "dt", "interpret",
                                             "tiled_out", "out_layout",
                                             "aug_per_scenario",
                                             "tangent_dtype"))
def _call(x, u, aug_leaves, f, dt, interpret, tiled_out=False,
          out_layout=None, aug_per_scenario=False, tangent_dtype=None):
    """out_layout=(N, ntb): inputs are n-major flattened (column = n*B + b,
    tile t = n*ntb + tb) and the OUTPUT tiles are written scenario-major
    (position tb*N + n) directly by the BlockSpec index map — the
    regrouping the downstream scenario-tiled kernels need, for free instead
    of an HBM transpose copy.  Requires tiled_out=True.

    aug_per_scenario (requires out_layout): aug leaves are per-SCENARIO
    (trailing dim B = ntb*128, no N-stage broadcast) and every stage tile of
    scenario block tb reads the SAME aug tile via the input BlockSpec index
    map (tile i -> block i % ntb) — the host never materializes the
    (3, nb, N*B) broadcast the column layout would otherwise need (~86 MB
    at B=16384, pure HBM churn)."""
    M = x.shape[0]
    dtype = x.dtype
    with_aug = aug_leaves is not None

    Mp = ((M + LANE_TILE - 1) // LANE_TILE) * LANE_TILE
    if Mp != M:
        pad = Mp - M
        x = jnp.concatenate([x, jnp.zeros((pad, NX), dtype).at[:, 3].set(1.0)], axis=0)
        u = jnp.concatenate([u, jnp.zeros((pad, NU), dtype)], axis=0)
        if with_aug:
            aug_leaves = tuple(
                jnp.concatenate([a, jnp.ones((3,) + a.shape[1:-1] + (pad,), dtype)], axis=-1)
                for a in aug_leaves
            )

    nt = Mp // LANE_TILE
    xt = x.reshape(nt, LANE_TILE, NX).transpose(0, 2, 1)
    ut = u.reshape(nt, LANE_TILE, NU).transpose(0, 2, 1)

    nb = aug_leaves[0].shape[1] if with_aug else None
    kernel = functools.partial(_lin_kernel, f=f, dt=dt, with_aug=with_aug,
                               tangent_dtype=tangent_dtype)

    def spec(shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape, lambda i: (i,) + (0,) * nd,
                            memory_space=pltpu.VMEM)

    in_specs = [spec((NX, LANE_TILE)), spec((NU, LANE_TILE))]
    inputs = [xt, ut]
    if with_aug and aug_per_scenario:
        assert out_layout is not None and Mp == M, \
            "aug_per_scenario needs the n-major tiled layout, unpadded"
        N_, ntb_ = out_layout
        Xb, wb, Lb, sfb = aug_leaves     # (3, nb, B) x2, (3, B) x2

        def scen_spec(shape):
            nd = len(shape)
            return pl.BlockSpec((1,) + shape,
                                lambda i: (i % ntb_,) + (0,) * nd,
                                memory_space=pltpu.VMEM)

        inputs += [
            Xb.reshape(3, nb, ntb_, LANE_TILE).transpose(2, 0, 1, 3),
            wb.reshape(3, nb, ntb_, LANE_TILE).transpose(2, 0, 1, 3),
            Lb.reshape(3, ntb_, LANE_TILE).transpose(1, 0, 2),
            sfb.reshape(3, ntb_, LANE_TILE).transpose(1, 0, 2),
        ]
        in_specs += [scen_spec((3, nb, LANE_TILE)), scen_spec((3, nb, LANE_TILE)),
                     scen_spec((3, LANE_TILE)), scen_spec((3, LANE_TILE))]
    elif with_aug:
        Xb, wb, Lb, sfb = aug_leaves     # (3, nb, Mp) x2, (3, Mp) x2
        inputs += [
            Xb.reshape(3, nb, nt, LANE_TILE).transpose(2, 0, 1, 3),
            wb.reshape(3, nb, nt, LANE_TILE).transpose(2, 0, 1, 3),
            Lb.reshape(3, nt, LANE_TILE).transpose(1, 0, 2),
            sfb.reshape(3, nt, LANE_TILE).transpose(1, 0, 2),
        ]
        in_specs += [spec((3, nb, LANE_TILE)), spec((3, nb, LANE_TILE)),
                     spec((3, LANE_TILE)), spec((3, LANE_TILE))]

    if out_layout is not None:
        assert tiled_out, "out_layout only makes sense with tiled_out"
        N_, ntb_ = out_layout
        assert N_ * ntb_ == nt, (out_layout, nt)

        def out_spec(shape):
            nd = len(shape)
            return pl.BlockSpec(
                (1,) + shape,
                lambda i: ((i % ntb_) * N_ + i // ntb_,) + (0,) * nd,
                memory_space=pltpu.VMEM)

        out_specs = (out_spec((NX, LANE_TILE)),
                     out_spec((NT, NX, LANE_TILE)))
    else:
        out_specs = (spec((NX, LANE_TILE)), spec((NT, NX, LANE_TILE)))

    xp, J = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((nt, NX, LANE_TILE), dtype),
            jax.ShapeDtypeStruct((nt, NT, NX, LANE_TILE), dtype),
        ),
        interpret=interpret,
    )(*inputs)

    if tiled_out:
        # raw tiles: xp (nt, 13, L), J (nt, 17, 13, L) — for the zero-relayout
        # pipeline into the tiled condense kernel
        return xp, J
    xp = xp.transpose(0, 2, 1).reshape(Mp, NX)[:M]
    J = J.transpose(0, 3, 2, 1).reshape(Mp, NX, NT)[:M]      # (M, 13, 17)
    return xp, J[..., :NX], J[..., NX:]


def make_linearizer_pallas(p, dt: float):
    """Returns linearize(X (M,13), U (M,4), aug_cols) -> (xp, A, B) with the
    same contract as `linearize_rk4_soa` (aug_cols: FoldedDrag with trailing
    M columns, or None)."""
    builder_cache = {}

    def f_for(nb):
        # built eagerly (outside any trace: float() reads of the params) and
        # cached so _call's static `f` argument stays identity-stable
        if nb not in builder_cache:
            builder_cache[nb] = _make_f(p, nb)
        return builder_cache[nb]

    def linearize(X, U, aug_cols=None, interpret=False, tiled_out=False,
                  out_layout=None, aug_per_scenario=False,
                  tangent_dtype=None):
        leaves = None
        nb = None
        if aug_cols is not None:
            leaves = (aug_cols.X, aug_cols.w, aug_cols.L, aug_cols.sigma_f)
            nb = leaves[0].shape[1]
        return _call(X, U, leaves, f_for(nb), dt, interpret,
                     tiled_out=tiled_out, out_layout=out_layout,
                     aug_per_scenario=aug_per_scenario,
                     tangent_dtype=tangent_dtype)

    return linearize
