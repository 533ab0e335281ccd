"""Geometric residuals for SfM refinement (JAX).

Port of the reference depth-refinement residual semantics
(``src/KeypointFreeSfM/post_optimization/optimizer/residual.py:6-78``):
unproject a keyframe observation by its depth, transform to a related view,
project, and measure the 2D distance to the fine-refined match. Written
batched and differentiable so ``jax.jacfwd`` supplies exact Jacobians to the
LM solvers in :mod:`~onepose_plus_plus_tpu.geometry.levenberg_marquardt`.
"""
from __future__ import annotations

import jax.numpy as jnp

from .rotations import angle_axis_rotate_point

_EPS = 1e-9


def unproject(uv: jnp.ndarray, depth: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Pixel [..., 2] + depth [...] + K [..., 3, 3] -> camera-frame [..., 3]."""
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    x = (uv[..., 0] - cx) / fx * depth
    y = (uv[..., 1] - cy) / fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def depth_residual_track(
    depth: jnp.ndarray,
    uv0: jnp.ndarray,
    uv1: jnp.ndarray,
    K0: jnp.ndarray,
    K1: jnp.ndarray,
    pose0_aa: jnp.ndarray,
    pose0_t: jnp.ndarray,
    pose1_aa: jnp.ndarray,
    pose1_t: jnp.ndarray,
    obs_valid: jnp.ndarray,
) -> jnp.ndarray:
    """Residuals of one track's scalar depth against its V related views.

    Mirrors reference ``depth_residual`` (``residual.py:6-78``): keyframe pixel
    ``uv0`` at ``depth`` -> camera0 -> world (inverse pose0, angle-axis) ->
    camera1 (pose1) -> project with K1 -> 2D offset to fine match ``uv1``.

    Args:
        depth: scalar (or [1]) keyframe depth being optimized.
        uv0: [2] keyframe observation pixel.
        uv1: [V, 2] fine-refined matches in related views.
        K0: [3, 3]; K1: [V, 3, 3].
        pose0_aa/pose0_t: [3]/[3] world->cam0 (angle-axis, translation).
        pose1_aa/pose1_t: [V, 3]/[V, 3] world->cam1 per related view.
        obs_valid: [V] bool mask (padded views contribute zero residual).
    Returns:
        [2V] residual vector in pixels.
    """
    d = jnp.reshape(depth, ())
    pc0 = unproject(uv0, d, K0)  # [3]
    # world = R0^T (pc0 - t0)  == rotate by -aa
    pw = angle_axis_rotate_point(-pose0_aa, pc0 - pose0_t)  # [3]
    pc1 = (
        angle_axis_rotate_point(pose1_aa, jnp.broadcast_to(pw, pose1_aa.shape))
        + pose1_t
    )  # [V, 3]
    z = jnp.where(jnp.abs(pc1[..., 2:3]) < _EPS, _EPS, pc1[..., 2:3])
    xy = pc1[..., :2] / z
    u = K1[..., 0, 0] * xy[..., 0] + K1[..., 0, 2]
    v = K1[..., 1, 1] * xy[..., 1] + K1[..., 1, 2]
    uv_hat = jnp.stack([u, v], axis=-1)  # [V, 2]
    r = (uv_hat - uv1) * obs_valid[..., None].astype(uv1.dtype)
    return r.reshape(-1)
