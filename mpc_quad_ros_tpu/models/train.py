"""Offline GP / RGP training CLIs — `gp_train.py` / `rgp_train.py` parity.

`train_gp`: dataset pickle -> DataLoaderGP -> 3 per-axis exact GPs -> NLL fit
-> ensemble saved as `mdl_{x,y,z}.gp` (+ diagnostic plots)
(`/root/reference/src/gp/gp_train.py:60-103`).

`train_rgp`: stream a dataset sample-by-sample through `rgp_regress` and save
the learned ensemble + posterior plots (`/root/reference/src/gp/rgp_train.py:63-153`).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def train_gp(dataset_path: str, save_dir: str, n_training_samples: int = 10,
             theta0=(1.0, 1.0, 1.0), plot: bool = True):
    import jax.numpy as jnp

    from .dataloader import DataLoaderGP
    from .ensemble import GPEnsemble
    from .gp import gp_fit
    import jax

    dl = DataLoaderGP(dataset_path, n_training_samples)
    states = [gp_fit(jnp.asarray(dl.X_train[:, d]), jnp.asarray(dl.y_train[:, d]), theta0)
              for d in range(3)]
    gpe = GPEnsemble(jax.tree.map(lambda *ls: jnp.stack(ls), *states), "GP")
    os.makedirs(save_dir, exist_ok=True)
    gpe.save(save_dir)
    if plot:
        dl.plot(os.path.join(save_dir, "training_data.pdf"))
        _plot_ensemble_fit(gpe, dl, os.path.join(save_dir, "gp_fit.pdf"))
    return gpe


def train_rgp(dataset_path: str, save_dir: str, n_basis: int = 20,
              theta=(1.0, 0.1, 0.1), plot: bool = True):
    import jax
    import jax.numpy as jnp

    from .dataloader import DataLoaderGP
    from .ensemble import GPEnsemble
    from .rgp import rgp_regress

    dl = DataLoaderGP(dataset_path, n_basis)
    v_abs = np.abs(dl.X).max()
    gpe = GPEnsemble.fromrange([(-v_abs, v_abs)] * 3, n_basis, theta=theta,
                               dtype=jnp.float64)
    # stream every sample through the recursive update (one lax.scan per axis)
    X = jnp.asarray(dl.X.T)[:, :, None]   # (3, T, 1)
    y = jnp.asarray(dl.y.T)[:, :, None]

    def stream_axis(st, xy):
        xs, ys = xy

        def step(s, d):
            return rgp_regress(s, d[0], d[1]), None

        out, _ = jax.lax.scan(step, st, (xs, ys))
        return out

    gpe.state = jax.vmap(stream_axis)(gpe.state, (X, y))
    os.makedirs(save_dir, exist_ok=True)
    gpe.save(save_dir)
    if plot:
        dl.plot(os.path.join(save_dir, "training_data.pdf"))
        _plot_ensemble_fit(gpe, dl, os.path.join(save_dir, "rgp_fit.pdf"))
    return gpe


def _plot_ensemble_fit(gpe, dl, path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax.numpy as jnp

    xyz = ["x", "y", "z"]
    fig = plt.figure(figsize=(10, 6), dpi=100)
    for d in range(3):
        plt.subplot(1, 3, d + 1)
        xs = np.linspace(dl.X[:, d].min(), dl.X[:, d].max(), 100)
        mu = np.asarray(gpe.predict(jnp.asarray(np.tile(xs, (3, 1))))[d])
        plt.scatter(dl.X[:, d], dl.y[:, d], s=0.5, alpha=0.4, label="samples")
        plt.plot(xs, mu, "r", label="posterior mean")
        plt.xlabel(f"v_body {xyz[d]} [m/s]")
        plt.legend(fontsize=7)
    plt.tight_layout()
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("mode", choices=("gp", "rgp"))
    parser.add_argument("--data", required=True, help="episode log pickle")
    parser.add_argument("--save_dir", required=True)
    parser.add_argument("-n", type=int, default=10, help="training points / basis vectors")
    parser.add_argument("--tpu", action="store_true",
                        help="use the default (TPU) backend; offline training is a "
                             "tiny problem, so CPU is the default")
    args = parser.parse_args(argv)
    if not args.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.mode == "gp":
        train_gp(args.data, args.save_dir, args.n)
    else:
        train_rgp(args.data, args.save_dir, args.n)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
