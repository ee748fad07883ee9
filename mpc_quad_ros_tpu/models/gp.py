"""Exact (batch) Gaussian Process regression — the reference's offline 'gp1' model.

Capability parity with `/root/reference/src/gp/GP.py` (RBF kernel, posterior
mean/cov, Cholesky-based negative log likelihood, L-BFGS-B hyperparameter
fit with positivity bounds).  The predict path is pure jnp (traced into the
MPC dynamics — replacing the reference's CasADi symbolic predict,
`GP.py:153-157`); the offline fit uses scipy L-BFGS-B driving a jax
value_and_grad of the NLL, mirroring the reference's optimizer choice
(`GP.py:195-214`) with exact gradients instead of finite differences.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .rgp import rbf


class GPState(NamedTuple):
    """Trained exact-GP state for a 1-D in / 1-D out regressor.
    Ensemble over 3 body axes = leading dim 3 (vmap)."""

    X: jnp.ndarray        # (n,) training inputs
    y: jnp.ndarray        # (n,) training targets
    alpha: jnp.ndarray    # (n,) = K^-1 y, precomputed for O(n) predict
    K_inv: jnp.ndarray    # (n, n)
    theta: jnp.ndarray    # (3,) [L, sigma_f, noise]


def _kernel_with_noise(X, theta):
    L, sigma_f, noise = theta[0], theta[1], theta[2]
    n = X.shape[-1]
    # the reference adds (noise + 1e-7) * I with noise NOT squared (`GP.py:128-130`)
    return rbf(X, X, L, sigma_f) + (noise + 1e-7) * jnp.eye(n, dtype=X.dtype)


def gp_init(X: jnp.ndarray, y: jnp.ndarray, theta=(1.0, 1.0, 1.0)) -> GPState:
    X = jnp.asarray(X)
    y = jnp.asarray(y, dtype=X.dtype)
    theta = jnp.asarray(theta, dtype=X.dtype)
    K = _kernel_with_noise(X, theta)
    K_inv = jnp.linalg.inv(K)
    return GPState(X=X, y=y, alpha=K_inv @ y, K_inv=K_inv, theta=theta)


def gp_predict(state: GPState, x_star: jnp.ndarray, with_cov: bool = False):
    """Posterior mean (and covariance) at x_star (`GP.py:135-179`)."""
    L, sigma_f = state.theta[0], state.theta[1]
    k_s = rbf(state.X, x_star, L, sigma_f)          # (n, m)
    mu = k_s.T @ state.alpha
    if not with_cov:
        return mu
    k_ss = rbf(x_star, x_star, L, sigma_f)
    cov = k_ss - k_s.T @ state.K_inv @ k_s
    return mu, cov


def gp_nll(X: jnp.ndarray, y: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Cholesky-based negative log marginal likelihood (`GP.py:231-256`)."""
    K = _kernel_with_noise(X, theta)
    Lc = jnp.linalg.cholesky(K)
    s1 = jax.scipy.linalg.solve_triangular(Lc, y, lower=True)
    s2 = jax.scipy.linalg.solve_triangular(Lc.T, s1, lower=False)
    return (
        jnp.sum(jnp.log(jnp.diagonal(Lc)))
        + 0.5 * y @ s2
        + 0.5 * X.shape[-1] * jnp.log(2 * jnp.pi)
    )


def gp_fit(X: jnp.ndarray, y: jnp.ndarray, theta0=(1.0, 1.0, 1.0), low_bnd: float = 0.01) -> GPState:
    """Maximum-likelihood hyperparameter fit: scipy L-BFGS-B with lower
    bounds (like `GP.py:195-214`) driving exact JAX gradients of the NLL."""
    from scipy.optimize import minimize

    X64 = jnp.asarray(np.asarray(X), dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    y64 = jnp.asarray(np.asarray(y), dtype=X64.dtype)
    vg = jax.jit(jax.value_and_grad(lambda th: gp_nll(X64, y64, th)))

    def fun(th_np):
        v, g = vg(jnp.asarray(th_np, dtype=X64.dtype))
        return float(v), np.asarray(g, dtype=np.float64)

    res = minimize(fun, x0=np.asarray(theta0, dtype=np.float64), jac=True,
                   method="L-BFGS-B", bounds=[(low_bnd, None)] * 3)
    return gp_init(X, y, theta=res.x)


# Ensemble forms (3 body axes as a leading dim — `GPE.py` equivalent)
ensemble_gp_predict = jax.vmap(gp_predict)


def ensemble_gp_init(X: jnp.ndarray, y: jnp.ndarray, theta: jnp.ndarray) -> GPState:
    """X, y: (3, n); theta: (3, 3)."""
    return jax.vmap(gp_init)(X, y, theta)


def ensemble_gp_fit(X: jnp.ndarray, y: jnp.ndarray, theta0=(1.0, 1.0, 1.0)) -> GPState:
    """Fit 3 per-axis GPs (host-side loop; offline path)."""
    states = [gp_fit(X[d], y[d], theta0) for d in range(X.shape[0])]
    return jax.tree.map(lambda *ls: jnp.stack(ls), *states)
