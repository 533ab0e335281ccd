"""Pinhole camera projection math (batched, JAX).

Replaces the reference's scattered numpy/cv2 projection helpers
(``src/utils/data_utils.py:239-299`` crop/intrinsic math,
``src/utils/vis_utils.py`` reprojection) with batched jit-able functions.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-9


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply rigid transform T [..., 4, 4] (or [..., 3, 4]) to points [..., N, 3]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def project_points(K: jnp.ndarray, T: jnp.ndarray, pts3d: jnp.ndarray):
    """Project world points into an image.

    Args:
        K: [..., 3, 3] intrinsics.
        T: [..., 4, 4] world->camera pose.
        pts3d: [..., N, 3] world points.
    Returns:
        uv: [..., N, 2] pixel coordinates, depth: [..., N] camera-frame z.
    """
    pc = transform_points(T, pts3d)  # [..., N, 3]
    depth = pc[..., 2]
    uvw = pc @ jnp.swapaxes(K, -1, -2)
    uv = uvw[..., :2] / (uvw[..., 2:3] + _EPS)
    return uv, depth


def unproject_depth(K: jnp.ndarray, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Lift pixels [..., N, 2] with depth [..., N] into camera-frame points [..., N, 3]."""
    fx = K[..., 0, 0][..., None]
    fy = K[..., 1, 1][..., None]
    cx = K[..., 0, 2][..., None]
    cy = K[..., 1, 2][..., None]
    x = (uv[..., 0] - cx) / fx * depth
    y = (uv[..., 1] - cy) / fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def compose_K(fx, fy, cx, cy, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], dtype=dtype)


def crop_resize_K(K: jnp.ndarray, bbox_xyxy: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Update intrinsics for a crop (bbox [x0, y0, x1, y1]) followed by a resize.

    Semantics of reference ``get_K_crop_resize`` (``src/utils/data_utils.py``):
    crop shifts the principal point; resize scales focal and principal point.
    """
    x0, y0, x1, y1 = bbox_xyxy[..., 0], bbox_xyxy[..., 1], bbox_xyxy[..., 2], bbox_xyxy[..., 3]
    out_h, out_w = out_hw
    sx = out_w / (x1 - x0)
    sy = out_h / (y1 - y0)
    K_new = jnp.zeros_like(K)
    K_new = K_new.at[..., 0, 0].set(K[..., 0, 0] * sx)
    K_new = K_new.at[..., 1, 1].set(K[..., 1, 1] * sy)
    K_new = K_new.at[..., 0, 2].set((K[..., 0, 2] - x0) * sx)
    K_new = K_new.at[..., 1, 2].set((K[..., 1, 2] - y0) * sy)
    K_new = K_new.at[..., 2, 2].set(1.0)
    return K_new
