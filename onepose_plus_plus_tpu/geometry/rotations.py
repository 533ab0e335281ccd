"""SO(3) parameterizations in JAX.

TPU-native replacement for the reference's pytorch3d dependency
(``so3_exponential_map`` / ``so3_log_map`` used by
reference ``src/KeypointFreeSfM/post_optimization/optimizer/optimizer.py:264`` and
``residual.py:55-57``) and for COLMAP qvec<->rotmat conversion
(reference ``src/utils/colmap/read_write_model.py``).

All functions are batched over leading dimensions and safe under ``jax.grad``
(Taylor fallbacks near theta=0).
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def angle_axis_to_matrix(aa: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: angle-axis [..., 3] -> rotation matrix [..., 3, 3]."""
    theta2 = jnp.sum(aa * aa, axis=-1, keepdims=True)  # [..., 1]
    theta = jnp.sqrt(theta2 + _EPS)
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallback near zero
    small = theta2[..., 0] < 1e-8
    sin_over = jnp.where(small, 1.0 - theta2[..., 0] / 6.0, jnp.sin(theta[..., 0]) / theta[..., 0])
    one_minus_cos_over = jnp.where(
        small, 0.5 - theta2[..., 0] / 24.0, (1.0 - jnp.cos(theta[..., 0])) / (theta2[..., 0] + _EPS)
    )
    kx, ky, kz = aa[..., 0], aa[..., 1], aa[..., 2]
    zeros = jnp.zeros_like(kx)
    K = jnp.stack(
        [
            jnp.stack([zeros, -kz, ky], axis=-1),
            jnp.stack([kz, zeros, -kx], axis=-1),
            jnp.stack([-ky, kx, zeros], axis=-1),
        ],
        axis=-2,
    )  # [..., 3, 3]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=aa.dtype), K.shape)
    return (
        eye
        + sin_over[..., None, None] * K
        + one_minus_cos_over[..., None, None] * (K @ K)
    )


def angle_axis_rotate_point(aa: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Rotate points [..., 3] by angle-axis [..., 3] without forming the matrix.

    Matches the reference ``AngleAxisRotatePoint`` semantics
    (``optimizer/residual_utils.py:3-59``): p*cos(t) + (k x p)*sin(t) + k (k.p)(1-cos t).
    """
    theta2 = jnp.sum(aa * aa, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta2 + _EPS)
    k = aa / theta
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    kxp = jnp.cross(k, pts)
    kdotp = jnp.sum(k * pts, axis=-1, keepdims=True)
    rotated = pts * cos_t + kxp * sin_t + k * kdotp * (1.0 - cos_t)
    # small-angle: p + aa x p (first order)
    small = theta2 < 1e-12
    return jnp.where(small, pts + jnp.cross(aa, pts), rotated)


def matrix_to_angle_axis(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> angle-axis [..., 3] (log map).

    Goes through the quaternion (Shepperd construction below) so the map is
    robust at BOTH log-map degeneracies: theta ~ 0 and theta ~ pi (a direct
    skew-part extraction loses the axis at pi, which bites real look-at
    cameras facing backwards).
    """
    q = matrix_to_qvec(R)  # w >= 0 canonical
    w = q[..., 0]
    xyz = q[..., 1:]
    norm = jnp.linalg.norm(xyz, axis=-1)
    theta = 2.0 * jnp.arctan2(norm, w)
    # theta / norm with limit 2/w as norm -> 0
    scale = jnp.where(norm < 1e-9, 2.0 / jnp.maximum(w, _EPS), theta / (norm + _EPS))
    return xyz * scale[..., None]


def qvec_to_matrix(qvec: jnp.ndarray) -> jnp.ndarray:
    """COLMAP-convention quaternion [..., 4] (w, x, y, z) -> matrix [..., 3, 3]."""
    w, x, y, z = qvec[..., 0], qvec[..., 1], qvec[..., 2], qvec[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * y**2 - 2 * z**2, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w], -1),
            jnp.stack([2 * x * y + 2 * z * w, 1 - 2 * x**2 - 2 * z**2, 2 * y * z - 2 * x * w], -1),
            jnp.stack([2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x**2 - 2 * y**2], -1),
        ],
        axis=-2,
    )


def matrix_to_qvec(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> COLMAP quaternion [..., 4] (w, x, y, z).

    Branch-free Shepperd-style construction (works batched under jit).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate constructions; pick the numerically best by largest pivot.
    qw0 = jnp.sqrt(jnp.clip(1.0 + tr, _EPS, None)) / 2.0
    q0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)], -1)

    qx1 = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, _EPS, None)) / 2.0
    q1 = jnp.stack([(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1)], -1)

    qy2 = jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, _EPS, None)) / 2.0
    q2 = jnp.stack([(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2)], -1)

    qz3 = jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, _EPS, None)) / 2.0
    q3 = jnp.stack([(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3], -1)

    pivots = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22], -1)
    best = jnp.argmax(pivots, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)  # [..., 4, 4]
    q = jnp.take_along_axis(qs, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    # canonical sign: w >= 0
    return q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
