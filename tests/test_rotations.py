import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from onepose_plus_plus_tpu.geometry import (
    angle_axis_to_matrix,
    matrix_to_angle_axis,
    qvec_to_matrix,
    matrix_to_qvec,
    angle_axis_rotate_point,
)


def random_rotvecs(n, seed=0, scale=2.0):
    rng = np.random.RandomState(seed)
    return (rng.randn(n, 3) * scale).astype(np.float32)


def test_angle_axis_to_matrix_matches_scipy():
    aa = random_rotvecs(64)
    R_ours = np.asarray(angle_axis_to_matrix(jnp.asarray(aa)))
    R_scipy = Rotation.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(R_ours, R_scipy, atol=1e-4)


def test_angle_axis_near_zero():
    aa = np.array([[0.0, 0.0, 0.0], [1e-9, 0.0, 0.0]], np.float32)
    R = np.asarray(angle_axis_to_matrix(jnp.asarray(aa)))
    np.testing.assert_allclose(R, np.stack([np.eye(3)] * 2), atol=1e-5)


def test_log_exp_roundtrip():
    # compare via matrices: the log map returns the canonical |theta| <= pi rep
    aa = random_rotvecs(32, seed=1, scale=1.5)
    R = angle_axis_to_matrix(jnp.asarray(aa))
    aa_back = matrix_to_angle_axis(R)
    R_back = np.asarray(angle_axis_to_matrix(aa_back))
    np.testing.assert_allclose(R_back, np.asarray(R), atol=1e-3)
    # vectors already in the canonical ball round-trip exactly
    aa_small = random_rotvecs(32, seed=5, scale=0.6)
    aa_small = aa_small / np.maximum(1.0, np.linalg.norm(aa_small, axis=1, keepdims=True) / 3.0)
    back = np.asarray(matrix_to_angle_axis(angle_axis_to_matrix(jnp.asarray(aa_small))))
    np.testing.assert_allclose(back, aa_small, atol=1e-3)


def test_rotate_point_matches_matrix():
    aa = random_rotvecs(16, seed=2)
    pts = np.random.RandomState(3).randn(16, 3).astype(np.float32)
    R = np.asarray(angle_axis_to_matrix(jnp.asarray(aa)))
    expected = np.einsum("nij,nj->ni", R, pts)
    got = np.asarray(angle_axis_rotate_point(jnp.asarray(aa), jnp.asarray(pts)))
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_qvec_roundtrip():
    aa = random_rotvecs(32, seed=4)
    R = angle_axis_to_matrix(jnp.asarray(aa))
    q = matrix_to_qvec(R)
    R_back = np.asarray(qvec_to_matrix(q))
    np.testing.assert_allclose(R_back, np.asarray(R), atol=1e-4)
    # scipy cross-check (scipy uses xyzw order)
    q_np = np.asarray(q)
    R_scipy = Rotation.from_quat(np.concatenate([q_np[:, 1:], q_np[:, :1]], 1)).as_matrix()
    np.testing.assert_allclose(R_scipy, np.asarray(R), atol=1e-4)


@pytest.mark.slow
def test_grad_through_rodrigues():
    def loss(aa):
        R = angle_axis_to_matrix(aa)
        return jnp.sum(R**2)

    g = jax.grad(loss)(jnp.array([0.1, -0.2, 0.3]))
    assert np.all(np.isfinite(np.asarray(g)))
    g0 = jax.grad(loss)(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g0)))
