"""3-axis GP/RGP ensemble — user-facing wrapper over the functional states.

Capability parity with the reference `GPEnsemble`
(`/root/reference/src/gp/GPE.py:34-327`): constructors (fromlist / fromrange /
frombasisvectors / fromemptybasisvectors / fromdir), vectorised
predict / predict_using_y / regress over the 3 body axes, fit-all, and
save/load with the reference's on-disk naming (`mdl_x/y/z.gp|.rgp`) and key
layout so model files round-trip with the reference.

The compute path never touches this class — the episode loop carries the raw
stacked `RGPState`/`GPState` pytrees; this wrapper exists for the offline /
CLI / interop surface.
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .rgp import RGPState, rgp_init, rgp_predict, rgp_predict_using_y, rgp_regress
from .gp import GPState, gp_init, gp_predict, gp_fit


_AXES = ("x", "y", "z")


class GPEnsemble:
    def __init__(self, state, type: str, learn=None):
        assert type in ("GP", "RGP")
        self.state = state      # stacked (3, ...) GPState or RGPState
        self.type = type
        # optional stacked (3, ...) RGPLearnState for learn-mode checkpointing
        # (the joint basis+hyperparameter posterior); saved/loaded alongside
        # the base state — the reference persists only theta (`RGP.py:507-534`)
        self.learn = learn

    # ----------------------- constructors -----------------------
    @classmethod
    def fromrange(cls, x_min_max, n_basis, theta=(1.0, 0.1, 0.1), dtype=jnp.float32) -> "GPEnsemble":
        """RGP ensemble with n_basis linspaced basis vectors per axis
        (`GPE.py:128-150`).  n_basis may be an int or a 3-list (equal values)."""
        if isinstance(n_basis, (list, tuple)):
            assert len(set(n_basis)) == 1, "per-axis basis counts must match (stacked state)"
            n_basis = n_basis[0]
        X = jnp.stack([jnp.linspace(lo, hi, n_basis, dtype=dtype) for lo, hi in x_min_max])
        state = jax.vmap(lambda Xd: rgp_init(Xd, theta=jnp.asarray(theta, dtype=dtype)))(X)
        return cls(state, "RGP")

    @classmethod
    def fromemptybasisvectors(cls, X, theta=(1.0, 0.1, 0.1)) -> "GPEnsemble":
        """RGP ensemble from explicit basis vectors, zero prior mean
        (`GPE.py:115-127`; theta defaults to the reference RGP default)."""
        X = jnp.stack([jnp.asarray(Xd) for Xd in X])
        state = jax.vmap(lambda Xd: rgp_init(Xd, theta=jnp.asarray(theta, dtype=X.dtype)))(X)
        return cls(state, "RGP")

    @classmethod
    def frombasisvectors(cls, X, y, C, theta) -> "GPEnsemble":
        """(`GPE.py:66-85`)"""
        states = [rgp_init(jnp.asarray(X[d]), jnp.asarray(y[d]), jnp.asarray(C[d]), jnp.asarray(theta[d]))
                  for d in range(3)]
        return cls(jax.tree.map(lambda *ls: jnp.stack(ls), *states), "RGP")

    @classmethod
    def fromlist(cls, states: list, type: Optional[str] = None) -> "GPEnsemble":
        t = type or ("RGP" if isinstance(states[0], RGPState) else "GP")
        return cls(jax.tree.map(lambda *ls: jnp.stack(ls), *states), t)

    @classmethod
    def fromdir(cls, path: str, type: str) -> "GPEnsemble":
        """Load `mdl_{x,y,z}.gp|.rgp` files (`GPE.py:87-108`).  Files saved by
        the reference (joblib pickles of {X, y, theta, ...}) load too.

        Beyond the reference: our own `.rgp` files carry the posterior
        covariance C_g (the reference drops it and restarts from the prior,
        `RGP.py:507-534`) and, when present, the learn-mode hyperparameter
        posterior (mu_eta, C_eta, C_g_eta) — both restored here."""
        from .rgp import RGPLearnState

        ext = ".gp" if type == "GP" else ".rgp"
        states, learns = [], []
        for ax in _AXES:
            with open(os.path.join(path, f"mdl_{ax}{ext}"), "rb") as f:
                d = _robust_load(f)
            X, y = np.asarray(d["X"]), np.asarray(d["y"])
            theta = np.asarray(d["theta"], dtype=np.float64).ravel()[:3]
            if type == "GP":
                states.append(gp_init(X, y, theta))
                continue
            C = d.get("C_g")
            st = rgp_init(X, y, C=None if C is None else np.asarray(C), theta=theta)
            states.append(st)
            if "mu_eta" in d:
                learns.append(RGPLearnState(
                    base=st,
                    mu_eta=jnp.asarray(np.asarray(d["mu_eta"]), dtype=st.X.dtype),
                    C_eta=jnp.asarray(np.asarray(d["C_eta"]), dtype=st.X.dtype),
                    C_g_eta=jnp.asarray(np.asarray(d["C_g_eta"]), dtype=st.X.dtype),
                ))
        state = jax.tree.map(lambda *ls: jnp.stack(ls), *states)
        learn = (jax.tree.map(lambda *ls: jnp.stack(ls), *learns)
                 if len(learns) == 3 else None)
        return cls(state, type, learn=learn)

    # ----------------------- compute -----------------------
    def predict(self, X_t: jnp.ndarray) -> jnp.ndarray:
        """Per-axis posterior mean; X_t: (3,) or (3, m) -> same leading shape
        (`GPE.py:165-201`)."""
        X_t = jnp.atleast_2d(jnp.asarray(X_t).T).T if jnp.asarray(X_t).ndim == 1 else jnp.asarray(X_t)
        X_t = X_t.reshape(3, -1)
        fn = rgp_predict if self.type == "RGP" else gp_predict
        return jax.vmap(fn)(self.state, X_t)

    def predict_using_y(self, X_t: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """RGP mean with external basis response (the MPC-parameter path,
        `GPE.py:203-241`)."""
        assert self.type == "RGP"
        X_t = jnp.asarray(X_t).reshape(3, -1)
        return jax.vmap(rgp_predict_using_y)(self.state, X_t, y)

    def regress(self, X_t, y_t) -> tuple:
        """Recursive update of all 3 axes (`GPE.py:244-268`).  Mutates the
        wrapper's stored state; returns (mu_g, C_g) like the reference."""
        assert self.type == "RGP"
        X_t = jnp.asarray(X_t).reshape(3, -1)
        y_t = jnp.asarray(y_t).reshape(3, -1)
        self.state = jax.vmap(rgp_regress)(self.state, X_t, y_t)
        return self.state.mu_g, self.state.C_g

    def fit(self, theta0=(1.0, 1.0, 1.0)) -> None:
        """Hyperparameter fit of all 3 batch GPs (`GPE.py:272-284`)."""
        if self.type == "RGP":
            raise NotImplementedError("RGP is not fitted with fit(); use regress()")
        states = [gp_fit(self.state.X[d], self.state.y[d], theta0) for d in range(3)]
        self.state = jax.tree.map(lambda *ls: jnp.stack(ls), *states)

    def get_theta(self) -> list:
        return [list(np.asarray(self.state.theta[d])) for d in range(3)]

    @property
    def basis_vectors(self) -> jnp.ndarray:
        return self.state.X

    # ----------------------- io -----------------------
    def save(self, path: str) -> None:
        """Write `mdl_{x,y,z}.gp|.rgp` (`GPE.py:304-317`), key layout matching
        the reference save formats (`GP.py:315-334`, `RGP.py:507-522`)."""
        os.makedirs(path, exist_ok=True)
        ext = ".gp" if self.type == "GP" else ".rgp"
        for d, ax in enumerate(_AXES):
            if self.type == "GP":
                payload = {
                    "kernel_params": {"L": np.eye(1) * float(self.state.theta[d][0]),
                                      "sigma_f": float(self.state.theta[d][1])},
                    "kernel_type": "SEK",
                    "X": np.asarray(self.state.X[d]),
                    "y": np.asarray(self.state.y[d]),
                    "theta": np.asarray(self.state.theta[d]),
                    "X_dim": 1,
                }
            else:
                payload = {
                    "X": np.asarray(self.state.X[d]),
                    "y": np.asarray(self.state.mu_g[d]),
                    "theta": np.asarray(self.state.theta[d]),
                    # beyond the reference (which drops the posterior
                    # covariance on save, `RGP.py:507-534`): keep C_g so a
                    # reloaded RGP resumes with its learned uncertainty
                    "C_g": np.asarray(self.state.C_g[d]),
                }
                if self.learn is not None:
                    payload["mu_eta"] = np.asarray(self.learn.mu_eta[d])
                    payload["C_eta"] = np.asarray(self.learn.C_eta[d])
                    payload["C_g_eta"] = np.asarray(self.learn.C_g_eta[d])
            with open(os.path.join(path, f"mdl_{ax}{ext}"), "wb") as f:
                pickle.dump(payload, f)


def _robust_load(f):
    """Load either a plain pickle or a joblib dump (reference used joblib)."""
    try:
        return pickle.load(f)
    except Exception:
        f.seek(0)
        import joblib

        return joblib.load(f)
