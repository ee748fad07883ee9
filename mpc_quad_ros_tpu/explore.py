"""Iterative exploration driver — `explore_trajectories.py` parity.

Capability parity with `/root/reference/src/explore_trajectories.py:61-125`
(minus its bit-rot): alternate between (a) flying a random trajectory at the
current exploration velocity, (b) training a GP on the collected data, and
(c) asking the Explorer for a faster velocity to explore next — a simple
velocity curriculum for the drag model.
"""

from __future__ import annotations

import argparse
import dataclasses
import os

from .explorer import Explorer
from .io.config import SimConfig


def explore(rounds: int = 5, out_dir: str = "outputs/exploration",
            v_start: float = 10.0, trajectory: int = 1, verbose: bool = True):
    from .models.train import train_gp
    from .run import run_sim

    os.makedirs(out_dir, exist_ok=True)
    gpe = None
    v = v_start
    history = []
    for rnd in range(rounds):
        cfg = SimConfig(gpe=0 if gpe is None else 1, trajectory=trajectory,
                        v_max=v, a_max=v, seed=rnd,
                        gp_path=os.path.join(out_dir, "gp_models") if gpe else None)
        logger, outs, extras = run_sim(cfg, verbose=verbose)
        log_path = os.path.join(out_dir, f"exploration_dataset_run_{rnd + 1}.pkl")
        logger.save_log(log_path)

        gpe = train_gp(log_path, os.path.join(out_dir, "gp_models"), plot=False)
        explorer = Explorer(gpe)
        history.append({"round": rnd, "v_max": v, "rmse": extras["rmse"]})
        v = explorer.velocity_to_explore
        if verbose:
            print(f"round {rnd}: flew v_max={history[-1]['v_max']:.1f}, "
                  f"next exploration velocity {v:.1f}")
    return history


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--rounds", type=int, default=5)
    parser.add_argument("--out_dir", type=str, default="outputs/exploration")
    parser.add_argument("--v_start", type=float, default=10.0)
    args = parser.parse_args(argv)
    for h in explore(args.rounds, args.out_dir, args.v_start):
        print(h)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
