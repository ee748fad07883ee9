"""Unit tests for quaternion/rotation algebra.

Independent oracles: scipy.spatial.transform.Rotation and hand-written
closed-form identities (NOT the reference implementation)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as R

from mpc_quad_ros_tpu.utils import (
    q_to_rot_mat,
    v_dot_q,
    q_dot_q,
    quaternion_inverse,
    unit_quat,
    quaternion_derivative,
    skew_symmetric4,
    euler_to_quaternion,
    quaternion_to_euler,
    undo_quaternion_flip,
    get_reference_chunk,
)


def rand_quat(rng, n=None):
    q = rng.standard_normal((n, 4) if n else (4,))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_rot_mat_matches_scipy():
    rng = np.random.default_rng(0)
    q = rand_quat(rng, 32)
    ours = np.asarray(q_to_rot_mat(jnp.asarray(q)))
    # scipy uses xyzw order
    theirs = R.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_v_dot_q_rotates():
    rng = np.random.default_rng(1)
    q = rand_quat(rng, 16)
    v = rng.standard_normal((16, 3))
    ours = np.asarray(v_dot_q(jnp.asarray(v), jnp.asarray(q)))
    theirs = R.from_quat(q[:, [1, 2, 3, 0]]).apply(v)
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_q_dot_q_composition():
    rng = np.random.default_rng(2)
    q, r = rand_quat(rng, 8), rand_quat(rng, 8)
    composed = np.asarray(q_dot_q(jnp.asarray(q), jnp.asarray(r)))
    # q_dot_q(q, r) is the Hamilton product q ⊗ r, so R(q ⊗ r) = R(q) R(r)
    Rq = R.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    Rr = R.from_quat(r[:, [1, 2, 3, 0]]).as_matrix()
    Rc = R.from_quat(composed[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(Rc, Rq @ Rr, atol=1e-12)


def test_inverse_and_unit():
    rng = np.random.default_rng(3)
    q = rand_quat(rng, 8)
    qi = np.asarray(quaternion_inverse(jnp.asarray(q)))
    ident = np.asarray(q_dot_q(jnp.asarray(q), jnp.asarray(qi)))
    np.testing.assert_allclose(np.abs(ident[:, 0]), 1.0, atol=1e-12)
    np.testing.assert_allclose(ident[:, 1:], 0.0, atol=1e-12)
    nq = np.asarray(unit_quat(jnp.asarray(rng.standard_normal((5, 4)))))
    np.testing.assert_allclose(np.linalg.norm(nq, axis=-1), 1.0, atol=1e-12)


def test_quaternion_derivative_matches_skew_form():
    rng = np.random.default_rng(4)
    q = rand_quat(rng, 8)
    w = rng.standard_normal((8, 3))
    closed = np.asarray(quaternion_derivative(jnp.asarray(q), jnp.asarray(w)))
    S = np.asarray(skew_symmetric4(jnp.asarray(w)))
    np.testing.assert_allclose(closed, 0.5 * np.einsum("nij,nj->ni", S, q), atol=1e-12)


def test_euler_roundtrip():
    rng = np.random.default_rng(5)
    rpy = rng.uniform(-1.2, 1.2, (16, 3))
    q = euler_to_quaternion(rpy[:, 0], rpy[:, 1], rpy[:, 2])
    back = np.asarray(quaternion_to_euler(q))
    np.testing.assert_allclose(back, rpy, atol=1e-10)


def test_undo_quaternion_flip():
    rng = np.random.default_rng(6)
    q = rand_quat(rng, 4)
    flipped = np.asarray(undo_quaternion_flip(jnp.asarray(q), jnp.asarray(-q)))
    np.testing.assert_allclose(flipped, q, atol=0)


def test_reference_chunk_semantics():
    """Oracle: a direct NumPy transcription of the documented semantics
    (strided slice + repeat-last padding) checked over every index."""
    T, d, N, skip = 23, 2, 5, 3
    traj = np.arange(T * d, dtype=float).reshape(T, d)

    def oracle(i):
        rows = []
        for j in range(N):
            rows.append(traj[min(i + j * skip, T - 1)])
        return np.stack(rows)

    for i in range(T + 5):
        got = np.asarray(get_reference_chunk(jnp.asarray(traj), i, N, skip))
        np.testing.assert_array_equal(got, oracle(i))


def test_chunk_jits_and_vmaps():
    traj = jnp.arange(40.0).reshape(20, 2)
    f = jax.jit(lambda idx: get_reference_chunk(traj, idx, 5, 2))
    out = jax.vmap(f)(jnp.arange(10))
    assert out.shape == (10, 5, 2)
