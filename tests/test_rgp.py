"""RGP tests against an independent NumPy oracle implementing the recursive
GP equations from Huber's paper ("Recursive Gaussian process: on-line
regression and learning"), written here from the math — not from the
reference code."""

import numpy as np
import jax
import jax.numpy as jnp

from mpc_quad_ros_tpu.models.rgp import (
    rgp_init,
    rgp_predict,
    rgp_predict_using_y,
    rgp_regress,
    rgp_learn_init,
    rgp_learn,
    ensemble_init,
)


# ----------------------- independent numpy oracle -----------------------
def np_kernel(x1, x2, L, sf):
    d = x1[:, None] - x2[None, :]
    return sf**2 * np.exp(-0.5 * d**2 / L**2)


class NpRGP:
    def __init__(self, X, y, theta):
        self.X, self.L, self.sf, self.sn = X, theta[0], theta[1], theta[2]
        self.Kx = np_kernel(X, X, self.L, self.sf) + self.sn**2 * np.eye(len(X))
        self.Kinv = np.linalg.inv(self.Kx)
        self.mu = y.copy()
        self.C = self.Kx.copy()

    def predict(self, xs):
        J = np_kernel(xs, self.X, self.L, self.sf) @ self.Kinv
        mu_p = J @ self.mu
        B = np_kernel(xs, xs, self.L, self.sf) - J @ np_kernel(self.X, xs, self.L, self.sf)
        Cp = B + J @ self.C @ J.T
        return mu_p, Cp, J

    def regress(self, xt, yt):
        mu_p, Cp, J = self.predict(xt)
        G = self.C @ J.T @ np.linalg.inv(Cp + self.sn**2 * np.eye(len(xt)))
        self.mu = self.mu + G @ (yt - mu_p)
        self.C = self.C - G @ J @ self.C
        return self.mu, self.C


def test_predict_matches_oracle():
    rng = np.random.default_rng(0)
    X = np.linspace(-5, 5, 10)
    y = rng.standard_normal(10)
    theta = (2.0, 0.8, 0.05)
    ours = rgp_init(jnp.asarray(X), jnp.asarray(y), theta=theta)
    ref = NpRGP(X, y, theta)

    xs = rng.uniform(-6, 6, 7)
    mu, Cp, J = rgp_predict(ours, jnp.asarray(xs), with_cov=True)
    mu_r, Cp_r, J_r = ref.predict(xs)
    np.testing.assert_allclose(np.asarray(mu), mu_r, atol=1e-10)
    np.testing.assert_allclose(np.asarray(Cp), Cp_r, atol=1e-10)
    np.testing.assert_allclose(np.asarray(J), J_r, atol=1e-10)


def test_regress_stream_matches_oracle():
    rng = np.random.default_rng(1)
    X = np.linspace(-3, 3, 8)
    theta = (1.0, 0.5, 0.1)
    ours = rgp_init(jnp.asarray(X), theta=theta)
    ref = NpRGP(X, np.zeros(8), theta)

    true_f = lambda x: -0.3 * x**2 * np.sign(x)
    for k in range(200):
        xt = rng.uniform(-3, 3, 1)
        yt = true_f(xt) + 0.05 * rng.standard_normal(1)
        ours = rgp_regress(ours, jnp.asarray(xt), jnp.asarray(yt))
        ref.regress(xt, yt)

    np.testing.assert_allclose(np.asarray(ours.mu_g), ref.mu, atol=1e-8)
    np.testing.assert_allclose(np.asarray(ours.C_g), ref.C, atol=1e-8)

    # and the stream actually learned the function at the basis vectors
    err = np.abs(np.asarray(ours.mu_g) - true_f(X))
    assert err.mean() < 0.15


def test_predict_using_y_is_linear_in_y():
    """The MPC-injection path must equal J_t @ y (linear form the reference
    built symbolically)."""
    X = jnp.linspace(-4, 4, 12)
    st = rgp_init(X, theta=(3.0, 0.1, 0.01))
    xs = jnp.asarray([1.7])
    y = jnp.sin(X)
    got = rgp_predict_using_y(st, xs, y)
    # linearity + matches predict when y == mu_g
    st2 = st._replace(mu_g=y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(rgp_predict(st2, xs)), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(rgp_predict_using_y(st, xs, 2.0 * y)), 2.0 * np.asarray(got), atol=1e-12
    )


def test_regress_scan_and_vmap():
    """The update must run under lax.scan (episode loop) and vmap (batch)."""
    st = ensemble_init([(-10, 10)] * 3, 10, theta=(3.0, 0.1, 0.01), dtype=jnp.float64)
    B = 5
    batch_st = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), st)

    def tick(state, data):
        xt, yt = data
        state = jax.vmap(jax.vmap(rgp_regress))(state, xt, yt)
        return state, state.mu_g

    key = jax.random.PRNGKey(0)
    xs = jax.random.uniform(key, (20, B, 3, 1), minval=-10, maxval=10)
    ys = -0.05 * xs**2 * jnp.sign(xs)
    final, mus = jax.lax.scan(tick, batch_st, (xs, ys))
    assert mus.shape == (20, B, 3, 10)
    assert np.isfinite(np.asarray(final.C_g)).all()


def test_covariance_contracts_and_stays_psd():
    st = rgp_init(jnp.linspace(-5, 5, 15), theta=(1.5, 0.4, 0.05))
    tr0 = float(jnp.trace(st.C_g))
    rng = np.random.default_rng(3)
    for _ in range(300):
        xt = rng.uniform(-5, 5, 1)
        st = rgp_regress(st, jnp.asarray(xt), jnp.asarray([0.3]))
    tr = float(jnp.trace(st.C_g))
    assert tr < tr0
    evals = np.linalg.eigvalsh(np.asarray(st.C_g))
    assert evals.min() > -1e-9


def test_learn_updates_hyperparameters_finitely():
    """The RGP* learn step should run, stay finite, and move eta."""
    st = rgp_init(jnp.linspace(-2, 2, 6), theta=(1.0, 0.5, 0.1))
    ls = rgp_learn_init(st)
    rng = np.random.default_rng(4)
    for _ in range(10):
        xt = rng.uniform(-2, 2, 1)
        yt = np.sin(xt)
        ls = rgp_learn(ls, jnp.asarray(xt), jnp.asarray(yt))
    assert np.isfinite(np.asarray(ls.mu_eta)).all()
    assert np.isfinite(np.asarray(ls.base.mu_g)).all()
    assert not np.allclose(np.asarray(ls.mu_eta), [1.0, 0.5, 0.1])


def test_learn_state_roundtrips_through_ensemble_save(tmp_path):
    """RGPLearnState (and the posterior covariance C_g the reference drops,
    `RGP.py:507-534`) must survive GPEnsemble.save/load — VERDICT r1 #8."""
    import jax
    from mpc_quad_ros_tpu.models.ensemble import GPEnsemble
    from mpc_quad_ros_tpu.models.rgp import rgp_learn_init, rgp_learn

    gpe = GPEnsemble.fromrange([(-3, 3)] * 3, 6, theta=(1.0, 0.5, 0.1),
                               dtype=jnp.float64)
    # stream a few samples through learn on each axis
    learn = jax.vmap(rgp_learn_init)(gpe.state)
    rng = np.random.default_rng(7)
    for _ in range(5):
        xt = jnp.asarray(rng.uniform(-3, 3, (3, 1)))
        yt = jnp.sin(xt)
        learn = jax.vmap(rgp_learn)(learn, xt, yt)
    gpe.state = learn.base
    gpe.learn = learn
    gpe.save(str(tmp_path))

    loaded = GPEnsemble.fromdir(str(tmp_path), "RGP")
    np.testing.assert_allclose(np.asarray(loaded.state.mu_g), np.asarray(learn.base.mu_g), rtol=1e-6)
    # C_g restored exactly (NOT reset to the prior like the reference)
    np.testing.assert_allclose(np.asarray(loaded.state.C_g), np.asarray(learn.base.C_g), rtol=1e-6)
    assert loaded.learn is not None
    np.testing.assert_allclose(np.asarray(loaded.learn.mu_eta), np.asarray(learn.mu_eta), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(loaded.learn.C_eta), np.asarray(learn.C_eta), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(loaded.learn.C_g_eta), np.asarray(learn.C_g_eta), rtol=1e-6)
    # plain (no-learn) saves still round-trip and carry no learn state
    gpe2 = GPEnsemble.fromrange([(-3, 3)] * 3, 6, theta=(1.0, 0.5, 0.1))
    gpe2.save(str(tmp_path / "plain"))
    loaded2 = GPEnsemble.fromdir(str(tmp_path / "plain"), "RGP")
    assert loaded2.learn is None
    np.testing.assert_allclose(np.asarray(loaded2.state.C_g), np.asarray(gpe2.state.C_g), rtol=1e-6)
