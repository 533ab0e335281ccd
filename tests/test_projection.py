import numpy as np
import jax.numpy as jnp

from onepose_plus_plus_tpu.geometry import (
    project_points,
    unproject_depth,
    crop_resize_K,
)
from onepose_plus_plus_tpu.geometry.rotations import angle_axis_to_matrix


def make_pose(aa, t):
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.asarray(angle_axis_to_matrix(jnp.asarray(aa)))
    T[:3, 3] = t
    return T


def test_project_unproject_roundtrip():
    K = jnp.array([[500.0, 0, 256], [0, 500.0, 256], [0, 0, 1]])
    T = jnp.asarray(make_pose(np.array([0.1, 0.2, -0.1], np.float32), [0.05, -0.02, 1.5]))
    rng = np.random.RandomState(0)
    pts = rng.randn(100, 3).astype(np.float32) * 0.1
    uv, depth = project_points(K, T, jnp.asarray(pts))
    assert np.all(np.asarray(depth) > 0)
    cam_pts = unproject_depth(K, uv, depth)
    world_back = (np.asarray(cam_pts) - np.asarray(T)[:3, 3]) @ np.asarray(T)[:3, :3]
    np.testing.assert_allclose(world_back, pts, atol=1e-4)


def test_crop_resize_K():
    K = jnp.array([[500.0, 0, 300], [0, 480.0, 200], [0, 0, 1]])
    bbox = jnp.array([100.0, 50.0, 356.0, 306.0])  # 256x256 crop
    K2 = crop_resize_K(K, bbox, (512, 512))
    # a point at bbox corner maps to (0, 0); center maps to center
    np.testing.assert_allclose(np.asarray(K2[0, 2]), (300 - 100) * 2.0)
    np.testing.assert_allclose(np.asarray(K2[1, 2]), (200 - 50) * 2.0)
    np.testing.assert_allclose(np.asarray(K2[0, 0]), 1000.0)
