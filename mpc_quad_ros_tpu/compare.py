"""A/B comparison matrix runner — `compare_trajectories.py` parity.

Reads the reference-format run-matrix JSON ({"runs": [{gpe, trajectory,
v_max, a_max}, ...]}), executes every run (in-process — no subprocess per run;
each run is one jitted episode), and scatter-plots mean position RMSE vs
achieved peak velocity for gpe vs no-gpe
(`/root/reference/src/compare_trajectories.py:14-66`).

`--batched` runs the WHOLE matrix as one heterogeneous batched computation
per GPE mode (mixed v_max ⇒ mixed trajectory lengths — exactly the workload
`run_episode_batch_fused(traj_len=, episode_ticks=)` exists for) instead of
one episode at a time; the reference spawns a subprocess per cell
(`compare_trajectories.py:27-52`).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from .io.config import SimConfig


def run_matrix(config_path: str, out_dir: str = "outputs/comparison", verbose: bool = True):
    runs = SimConfig.from_json(config_path)
    results = []
    from .run import run_sim

    os.makedirs(out_dir, exist_ok=True)
    for cfg in runs:
        logger, outs, extras = run_sim(cfg, verbose=verbose)
        x = np.asarray(outs.x_odom)
        ref = np.asarray(outs.x_ref)
        # drop the final second where the trajectory just holds position
        n_drop = int(1.0 / cfg.t_lookahead * cfg.n_nodes)
        e = np.linalg.norm(x[:-n_drop, :3] - ref[:-n_drop, :3], axis=1)
        v_peak = float(np.linalg.norm(x[:-n_drop, 7:10], axis=1).max())
        results.append({
            "gpe": cfg.gpe, "trajectory": cfg.trajectory, "v_max": cfg.v_max,
            "a_max": cfg.a_max, "mean_rmse_pos": float(e.mean()), "v_peak": v_peak,
        })
        name = f"sim_{cfg.gpe}_trajectory{cfg.trajectory}_v_max{cfg.v_max:g}_a_max{cfg.a_max:g}.pkl"
        logger.save_log(os.path.join(out_dir, name))
    return results


def run_matrix_batched(config_path: str, out_dir: str = "outputs/comparison",
                       verbose: bool = True, max_ticks: int | None = None,
                       gp_path: str | None = None):
    """The whole comparison matrix as ONE heterogeneous batched computation
    per GPE mode (runs with the same gpe share an augmentation type, so they
    batch; mixed v_max gives mixed trajectory lengths, handled by
    `run_episode_batch_fused(traj_len=, episode_ticks=)`).

    Produces the same result rows as `run_matrix` (each run's metrics are
    computed from its own masked row) at batched-solver throughput — the
    sequential path pays one full jit + episode per cell.  `max_ticks`
    truncates every trajectory (quick sweeps / tests).
    """
    import jax
    import jax.numpy as jnp

    from .io.logger import Logger
    from .loop import (EpisodeConfig, run_episode_batch_fused,
                       tracking_rmse_masked)
    from .models.augmented import make_mpc_dynamics
    from .models.ensemble import GPEnsemble
    from .models.params import hummingbird_params
    from .ops import MPCConfig, SQPSolver
    from .run import build_trajectory

    runs = [c.clamp_limits() for c in SimConfig.from_json(config_path)]
    if gp_path is not None:
        # the reference config JSON carries no model path (its gpe-1 runs
        # hardcode outputs/python_simulation/gp_models) — inject it here
        import dataclasses

        runs = [dataclasses.replace(c, gp_path=gp_path) if c.gpe == 1 else c
                for c in runs]
    os.makedirs(out_dir, exist_ok=True)
    dtype = jnp.float32
    results = [None] * len(runs)
    t_start = time.perf_counter()

    by_gpe: dict[int, list[int]] = {}
    for i, c in enumerate(runs):
        by_gpe.setdefault(c.gpe, []).append(i)

    for gpe, idxs in sorted(by_gpe.items()):
        group = [runs[i] for i in idxs]
        # all runs in a group must share the MPC dims (one solver build)
        n_nodes, t_look = group[0].n_nodes, group[0].t_lookahead
        assert all(c.n_nodes == n_nodes and c.t_lookahead == t_look
                   for c in group), "mixed MPC dims in one gpe group"
        p = hummingbird_params(dtype=dtype)
        mpc = MPCConfig(n_nodes=n_nodes, t_horizon=t_look,
                        u_ref=float(p.hover_input))
        ecfg = EpisodeConfig(mpc=mpc, log_rgp_posterior=False)
        solver = SQPSolver(mpc, make_mpc_dynamics(p))
        x0 = jnp.asarray([0, 0, 3, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0], dtype)

        trajs, tss = [], []
        for c in group:
            xt, ts = build_trajectory(c, np.asarray(x0[:3]), mpc.dt)
            if max_ticks is not None:
                xt, ts = xt[:max_ticks], ts[:max_ticks]
            trajs.append(np.asarray(xt, np.float32))
            tss.append(np.asarray(ts))
        lens = np.asarray([t.shape[0] for t in trajs], np.int32)
        T_max = int(lens.max())
        B = len(group)
        traj = np.zeros((B, T_max, 13), np.float32)
        for b, t in enumerate(trajs):
            traj[b, : t.shape[0]] = t

        pb = jax.tree.map(lambda a: jnp.broadcast_to(jnp.asarray(a, dtype),
                                                     (B,) + jnp.shape(a)), p)
        x0b = jnp.broadcast_to(x0, (B, 13))
        rgpb = gp_augb = None
        if gpe == 2:
            # per-run basis ranges follow each run's v_max (as run_sim does)
            states = [GPEnsemble.fromrange([(-c.v_max, c.v_max)] * 3,
                                           c.n_basis, theta=c.rgp_theta,
                                           dtype=dtype).state for c in group]
            rgpb = jax.tree.map(lambda *ls: jnp.stack(ls), *states)
        elif gpe == 1:
            assert all(c.gp_path for c in group), "--gp_path required for gpe 1"
            aug = GPEnsemble.fromdir(group[0].gp_path, "GP").state
            gp_augb = jax.tree.map(
                lambda a: jnp.broadcast_to(jnp.asarray(a, dtype), (B,) + a.shape), aug)

        final, outs = run_episode_batch_fused(
            ecfg, solver, pb, x0b, jnp.asarray(traj), T_max, rgpb,
            gp_aug=gp_augb, traj_len=jnp.asarray(lens),
            episode_ticks=jnp.asarray(lens))
        jax.block_until_ready(outs.x_odom)

        x = np.asarray(outs.x_odom)
        ref = np.asarray(outs.x_ref)
        n_drop = int(1.0 / t_look * n_nodes)
        for b, (i, c) in enumerate(zip(idxs, group)):
            n_keep = int(lens[b]) - n_drop
            e = np.linalg.norm(x[b, :n_keep, :3] - ref[b, :n_keep, :3], axis=1)
            v_peak = float(np.linalg.norm(x[b, :n_keep, 7:10], axis=1).max())
            results[i] = {
                "gpe": c.gpe, "trajectory": c.trajectory, "v_max": c.v_max,
                "a_max": c.a_max, "mean_rmse_pos": float(e.mean()),
                "v_peak": v_peak,
            }
            row = jax.tree.map(
                lambda a: a[b, : int(lens[b])] if a is not None else None, outs)
            name = (f"sim_{c.gpe}_trajectory{c.trajectory}_v_max{c.v_max:g}"
                    f"_a_max{c.a_max:g}.pkl")
            Logger.from_episode(row, t_odom=tss[b][: int(lens[b])]).save_log(
                os.path.join(out_dir, name))
    elapsed = time.perf_counter() - t_start
    if verbose:
        print(f"batched matrix: {len(runs)} runs in {elapsed:.2f}s "
              f"({len(by_gpe)} batched computations)")
    return results


def plot_results(results, save_path=None, show=False):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(9, 6), dpi=100)
    colors = {0: "b", 1: "r", 2: "g"}
    names = {0: "no_gpe", 1: "gpe", 2: "rgp"}
    for r in results:
        ax.scatter(r["v_peak"], r["mean_rmse_pos"], c=colors[r["gpe"]],
                   label=names[r["gpe"]])
    handles, labels = ax.get_legend_handles_labels()
    uniq = dict(zip(labels, handles))
    ax.legend(uniq.values(), uniq.keys())
    ax.set_xlabel("peak velocity [m/s]")
    ax.set_ylabel("mean pos RMSE [m]")
    ax.grid(alpha=0.3)
    if save_path:
        fig.savefig(save_path, bbox_inches="tight")
    if show:
        plt.show()
    plt.close(fig)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True, help="run-matrix JSON")
    parser.add_argument("--out_dir", type=str, default="outputs/comparison")
    parser.add_argument("--plot", type=str, default=None)
    parser.add_argument("--batched", action="store_true",
                        help="run the whole matrix as one heterogeneous "
                             "batched computation per gpe mode")
    parser.add_argument("--gp_path", type=str, default=None,
                        help="GP model dir injected into gpe-1 runs")
    args = parser.parse_args(argv)
    if args.batched:
        results = run_matrix_batched(args.config, args.out_dir,
                                     gp_path=args.gp_path)
    else:
        results = run_matrix(args.config, args.out_dir)
    for r in results:
        print(r)
    if args.plot:
        plot_results(results, save_path=args.plot)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
