"""A/B comparison matrix runner — `compare_trajectories.py` parity.

Reads the reference-format run-matrix JSON ({"runs": [{gpe, trajectory,
v_max, a_max}, ...]}), executes every run (in-process — no subprocess per run;
each run is one jitted episode), and scatter-plots mean position RMSE vs
achieved peak velocity for gpe vs no-gpe
(`/root/reference/src/compare_trajectories.py:14-66`).
"""

from __future__ import annotations

import argparse
import os

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
    args = parser.parse_args(argv)
    results = run_matrix(args.config, args.out_dir)
    for r in results:
        print(r)
    if args.plot:
        plot_results(results, save_path=args.plot)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
