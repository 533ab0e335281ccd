"""Two-view epipolar geometry for match verification (batched, JAX).

TPU-native replacement for COLMAP's ``matches_importer`` geometric-verification
stage (reference ``src/sfm_utils/triangulation.py:19-35,144-163`` shells out to
the COLMAP C++ binary). Camera poses are known in the OnePose++ SfM setting
(``generate_empty.py`` writes them from ARKit/GT), so verification reduces to
thresholding the Sampson distance under the essential matrix derived from the
relative pose — an embarrassingly batched computation that maps onto the VPU
instead of a subprocess boundary.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> skew-symmetric [..., 3, 3] such that skew(v) @ p = v x p."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zeros = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zeros, -z, y], axis=-1),
            jnp.stack([z, zeros, -x], axis=-1),
            jnp.stack([-y, x, zeros], axis=-1),
        ],
        axis=-2,
    )


def relative_pose(T0: jnp.ndarray, T1: jnp.ndarray):
    """Relative transform cam0 -> cam1 from world->cam poses [..., 4, 4].

    Returns (R01, t01) with x1 = R01 @ x0 + t01.
    """
    R0, t0 = T0[..., :3, :3], T0[..., :3, 3]
    R1, t1 = T1[..., :3, :3], T1[..., :3, 3]
    R01 = R1 @ jnp.swapaxes(R0, -1, -2)
    t01 = t1 - jnp.einsum("...ij,...j->...i", R01, t0)
    return R01, t01


def essential_from_poses(T0: jnp.ndarray, T1: jnp.ndarray) -> jnp.ndarray:
    """Essential matrix E [..., 3, 3] with x1n^T E x0n = 0 (normalized coords)."""
    R01, t01 = relative_pose(T0, T1)
    return skew(t01) @ R01


def fundamental_from_poses(
    K0: jnp.ndarray, K1: jnp.ndarray, T0: jnp.ndarray, T1: jnp.ndarray
) -> jnp.ndarray:
    """Fundamental matrix F [..., 3, 3] with x1^T F x0 = 0 (pixel coords)."""
    E = essential_from_poses(T0, T1)
    K1_inv_T = jnp.swapaxes(jnp.linalg.inv(K1), -1, -2)
    K0_inv = jnp.linalg.inv(K0)
    return K1_inv_T @ E @ K0_inv


def sampson_distance(
    F: jnp.ndarray, pts0: jnp.ndarray, pts1: jnp.ndarray
) -> jnp.ndarray:
    """First-order geometric (Sampson) distance in squared pixels.

    Args:
        F: [..., 3, 3] fundamental matrix.
        pts0, pts1: [..., N, 2] pixel correspondences.
    Returns:
        [..., N] squared Sampson distance.
    """
    ones = jnp.ones_like(pts0[..., :1])
    x0 = jnp.concatenate([pts0, ones], axis=-1)  # [..., N, 3]
    x1 = jnp.concatenate([pts1, ones], axis=-1)
    Fx0 = jnp.einsum("...ij,...nj->...ni", F, x0)  # [..., N, 3]
    Ftx1 = jnp.einsum("...ji,...nj->...ni", F, x1)
    x1Fx0 = jnp.sum(x1 * Fx0, axis=-1)  # [..., N]
    denom = (
        Fx0[..., 0] ** 2 + Fx0[..., 1] ** 2 + Ftx1[..., 0] ** 2 + Ftx1[..., 1] ** 2
    )
    return (x1Fx0**2) / (denom + _EPS)


def epipolar_error(
    F: jnp.ndarray, pts0: jnp.ndarray, pts1: jnp.ndarray
) -> jnp.ndarray:
    """Symmetric point-to-epipolar-line distance in pixels (COLMAP's metric)."""
    ones = jnp.ones_like(pts0[..., :1])
    x0 = jnp.concatenate([pts0, ones], axis=-1)
    x1 = jnp.concatenate([pts1, ones], axis=-1)
    Fx0 = jnp.einsum("...ij,...nj->...ni", F, x0)
    Ftx1 = jnp.einsum("...ji,...nj->...ni", F, x1)
    x1Fx0 = jnp.abs(jnp.sum(x1 * Fx0, axis=-1))
    d1 = x1Fx0 / jnp.sqrt(Fx0[..., 0] ** 2 + Fx0[..., 1] ** 2 + _EPS)
    d0 = x1Fx0 / jnp.sqrt(Ftx1[..., 0] ** 2 + Ftx1[..., 1] ** 2 + _EPS)
    return 0.5 * (d0 + d1)


@jax.jit
def verify_matches(
    K0: jnp.ndarray,
    K1: jnp.ndarray,
    T0: jnp.ndarray,
    T1: jnp.ndarray,
    pts0: jnp.ndarray,
    pts1: jnp.ndarray,
    valid: jnp.ndarray,
    max_error_px: float = 4.0,
) -> jnp.ndarray:
    """Batched geometric verification of fixed-capacity match sets.

    Replaces COLMAP geometric verification for the known-pose triangulation
    path. All arrays carry a leading pair-batch dimension; ``valid`` masks the
    padded match slots.

    Args:
        K0, K1: [B, 3, 3]; T0, T1: [B, 4, 4]; pts0, pts1: [B, N, 2];
        valid: [B, N] bool.
    Returns:
        inlier mask [B, N] bool (subset of ``valid``).
    """
    F = fundamental_from_poses(K0, K1, T0, T1)
    err = epipolar_error(F, pts0, pts1)
    return valid & (err <= max_error_px)
