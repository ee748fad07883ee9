"""Episode logging: device arrays -> host pickles.

Capability parity with the reference `Logger` (`/root/reference/src/Logger.py`)
and `utils/save_dataset.py`: an append-mode dict-of-lists log plus pickle
save/load with the same key names, so our run logs are drop-in readable by any
reference-style analysis.  The episode loop produces whole stacked arrays in
one shot (the scan output), so the common path is `Logger.from_episode`.
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

import numpy as np


def save_dict(dictionary: dict, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(dictionary, f)


def load_dict(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


class Logger:
    """Dict-of-lists logger (`Logger.py:24-62`)."""

    def __init__(self, filepath: Optional[str] = None):
        self.dictionary: dict = {}
        self.filepath = filepath

    def clear_memory(self) -> None:
        self.dictionary = {}

    def log(self, input_dict: dict) -> None:
        for key, val in input_dict.items():
            self.dictionary.setdefault(key, []).append(val)

    def save_log(self, filepath: Optional[str] = None) -> str:
        path = filepath or self.filepath
        assert path, "no filepath given"
        if not path.endswith(".pkl"):
            path = path + ".pkl"
        save_dict(self.dictionary, path)
        return path

    # ------------------------------------------------------------------ #
    @classmethod
    def from_episode(cls, outs, t_odom=None, filepath: Optional[str] = None,
                     solve_time_s: Optional[float] = None,
                     t_cpu_kind: str = "amortized_episode_wall") -> "Logger":
        """Build a reference-keyed log from an `EpisodeOutput` pytree
        (keys per `execute_trajectory.py:270-273`).

        t_cpu semantics: the reference logs TRUE per-tick solver time
        (`quad_opt.py:350`); a fused-scan episode has no per-tick host
        timestamps, so `solve_time_s / T` is an amortised CONSTANT.  The
        `t_cpu_kind` key says which it is so consumers (the Visualiser's
        solve-time panel) never render fake per-tick variance:
        "amortized_episode_wall" (this path), "per_tick_host_wall" (the
        node/SimLoop path, real per-tick times), or
        "chained_device_latency" (a bench-measured device number)."""
        lg = cls(filepath)
        T = np.asarray(outs.x_odom).shape[0]
        d = {
            "x_odom": list(np.asarray(outs.x_odom)),
            "x_pred_odom": list(np.asarray(outs.x_pred_odom)),
            "x_ref": list(np.asarray(outs.x_ref)),
            "w_odom": list(np.asarray(outs.w_odom)),
            "cost_solution": list(np.asarray(outs.cost_solution)),
            "kkt_residual": list(np.asarray(outs.kkt_residual)),
        }
        if t_odom is not None:
            d["t_odom"] = list(np.asarray(t_odom))
        if solve_time_s is not None:
            d["t_cpu"] = [solve_time_s / T] * T
            d["t_cpu_kind"] = t_cpu_kind
        if outs.rgp_mu_g_t is not None:
            mu = np.asarray(outs.rgp_mu_g_t)
            d["rgp_mu_g_t"] = [list(mu[k]) for k in range(T)]
            d["v_body"] = list(np.asarray(outs.v_body))
            d["a_drag"] = list(np.asarray(outs.a_drag))
        # full posterior keys in the reference's per-tick list-of-3-axis
        # format (`execute_trajectory.py:270-273`): basis locations,
        # covariance and hyperparameters — what the Visualiser's uncertainty
        # bands / posterior animations consume (`Visualiser.py:459-783`)
        if getattr(outs, "rgp_basis_vectors", None) is not None:
            bv = np.asarray(outs.rgp_basis_vectors)       # (T, 3, nb)
            d["rgp_basis_vectors"] = [list(bv[k]) for k in range(T)]
        if getattr(outs, "rgp_C_g_t", None) is not None:
            cg = np.asarray(outs.rgp_C_g_t)               # (T, 3, nb, nb)
            d["rgp_C_g_t"] = [list(cg[k]) for k in range(T)]
        if getattr(outs, "rgp_theta", None) is not None:
            th = np.asarray(outs.rgp_theta)               # (T, 3, 3)
            d["rgp_theta"] = [[list(map(float, row)) for row in th[k]] for k in range(T)]
        lg.dictionary = d
        return lg
