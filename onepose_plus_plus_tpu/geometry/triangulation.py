"""Multi-view triangulation (batched DLT + reprojection filtering, JAX).

TPU-native replacement for COLMAP's ``point_triangulator`` (reference
``src/sfm_utils/triangulation.py:165-190`` runs the C++ binary with all
``ba_refine_*`` flags off, i.e. poses fixed and only 3D points estimated).
Here every feature track becomes one fixed-capacity row of a batched linear
system solved in one vmapped pass on device:

  - DLT: for observations (u_i, v_i) with projection P_i = K_i [R_i | t_i],
    each view contributes rows (u_i * P_i[2] - P_i[0]) and
    (v_i * P_i[2] - P_i[1]); the homogeneous point is the null vector of the
    stacked A. We solve via the normal equations' smallest eigenvector
    (A^T A is 4x4 — eigh of a tiny symmetric matrix, batched).
  - Cheirality + reprojection filtering mirror COLMAP's defaults
    (min triangulation angle 1.5 deg, max reproj error 4 px).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_EPS = 1e-12


def projection_matrix(K: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """P = K [R|t]: [..., 3, 3] x [..., 4, 4] -> [..., 3, 4]."""
    return K @ T[..., :3, :4]


def triangulate_tracks(
    P: jnp.ndarray, uv: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """DLT-triangulate a batch of fixed-capacity tracks.

    Args:
        P: [T, V, 3, 4] per-observation projection matrices (V = max track len).
        uv: [T, V, 2] pixel observations.
        valid: [T, V] bool observation mask.
    Returns:
        xyz: [T, 3] world points (garbage where <2 valid observations).
    """
    w = valid.astype(P.dtype)[..., None]  # [T, V, 1]
    r0 = uv[..., 0:1] * P[..., 2, :] - P[..., 0, :]  # [T, V, 4]
    r1 = uv[..., 1:2] * P[..., 2, :] - P[..., 1, :]
    # Normalize rows for conditioning, zero out invalid observations.
    r0 = r0 / (jnp.linalg.norm(r0, axis=-1, keepdims=True) + _EPS) * w
    r1 = r1 / (jnp.linalg.norm(r1, axis=-1, keepdims=True) + _EPS) * w
    A = jnp.concatenate([r0, r1], axis=-2)  # [T, 2V, 4]
    AtA = jnp.einsum("tva,tvb->tab", A, A)  # [T, 4, 4]
    # Smallest eigenvector of a symmetric 4x4 — cheap and batched.
    _, vecs = jnp.linalg.eigh(AtA)
    X = vecs[..., :, 0]  # [T, 4]
    return X[..., :3] / (X[..., 3:4] + jnp.where(X[..., 3:4] >= 0, _EPS, -_EPS))


def triangulation_angles(
    centers: jnp.ndarray, xyz: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """Max pairwise triangulation angle (radians) per track.

    Args:
        centers: [T, V, 3] camera centers; xyz: [T, 3]; valid: [T, V].
    Returns:
        [T] maximum angle between any two valid viewing rays.
    """
    rays = centers - xyz[:, None, :]  # [T, V, 3]
    rays = rays / (jnp.linalg.norm(rays, axis=-1, keepdims=True) + _EPS)
    cosang = jnp.einsum("tvc,twc->tvw", rays, rays)
    pair_ok = valid[:, :, None] & valid[:, None, :]
    v = valid.shape[-1]
    eye = jnp.eye(v, dtype=bool)
    cosang = jnp.where(pair_ok & ~eye, cosang, 1.0)
    return jnp.arccos(jnp.clip(jnp.min(cosang, axis=(-2, -1)), -1.0, 1.0))


def _score_point(P, T, uv, valid, xyz, max_reproj_px):
    """Per-observation reprojection error / depth / inlier mask for xyz [Tr, 3]."""
    Xh = jnp.concatenate([xyz, jnp.ones_like(xyz[..., :1])], axis=-1)  # [Tr, 4]
    proj = jnp.einsum("tvij,tj->tvi", P, Xh)  # [Tr, V, 3]
    depth = jnp.einsum("tvij,tj->tvi", T[..., :3, :4], Xh)[..., 2]  # [Tr, V]
    uv_hat = proj[..., :2] / (proj[..., 2:3] + _EPS)
    reproj_err = jnp.linalg.norm(uv_hat - uv, axis=-1)  # [Tr, V]
    inlier = valid & (reproj_err <= max_reproj_px) & (depth > _EPS)
    return reproj_err, depth, inlier


@partial(jax.jit, static_argnames=())
def triangulate_and_filter(
    K: jnp.ndarray,
    T: jnp.ndarray,
    uv: jnp.ndarray,
    valid: jnp.ndarray,
    max_reproj_px: float = 4.0,
    min_tri_angle_deg: float = 1.5,
):
    """Robust track triangulation with COLMAP-equivalent acceptance tests.

    COLMAP's ``EstimateTriangulation`` RANSACs over observation *pairs*; with
    fixed small track capacity V we enumerate all V(V-1)/2 pairs instead:
    two-view-triangulate every pair, score support (reproj <= threshold,
    positive depth), pick the best candidate, then re-run the full DLT on its
    consensus set. Everything stays batched [Tr, ...] — no per-track loops.

    Args:
        K: [Tr, V, 3, 3] intrinsics per observation.
        T: [Tr, V, 4, 4] world->cam poses per observation.
        uv: [Tr, V, 2] pixel observations.
        valid: [Tr, V] observation mask.
    Returns:
        xyz: [Tr, 3] points;
        obs_inlier: [Tr, V] per-observation inlier mask (reproj <= threshold);
        track_ok: [Tr] track acceptance (>=2 inlier obs, positive depth on
        inliers, triangulation angle above threshold);
        reproj_err: [Tr, V] per-observation reprojection error in px.
    """
    tr, v = valid.shape
    P = projection_matrix(K, T)  # [Tr, V, 3, 4]

    # --- stage 1: all-pairs two-view hypotheses.
    ii, jj = jnp.triu_indices(v, k=1)  # [Np]
    np_ = ii.shape[0]
    pair_P = jnp.stack([P[:, ii], P[:, jj]], axis=2)  # [Tr, Np, 2, 3, 4]
    pair_uv = jnp.stack([uv[:, ii], uv[:, jj]], axis=2)  # [Tr, Np, 2, 2]
    pair_valid = valid[:, ii] & valid[:, jj]  # [Tr, Np]
    both = jnp.ones((tr * np_, 2), dtype=bool)
    xyz_h = triangulate_tracks(
        pair_P.reshape(tr * np_, 2, 3, 4), pair_uv.reshape(tr * np_, 2, 2), both
    ).reshape(tr, np_, 3)

    # score every hypothesis against every observation: [Tr, Np, V]
    Xh = jnp.concatenate([xyz_h, jnp.ones_like(xyz_h[..., :1])], axis=-1)
    proj = jnp.einsum("tvij,tnj->tnvi", P, Xh)
    depth_h = jnp.einsum("tvij,tnj->tnvi", T[..., :3, :4], Xh)[..., 2]
    uv_hat = proj[..., :2] / (proj[..., 2:3] + _EPS)
    err_h = jnp.linalg.norm(uv_hat - uv[:, None], axis=-1)
    support = (
        valid[:, None, :] & (err_h <= max_reproj_px) & (depth_h > _EPS)
    )  # [Tr, Np, V]
    counts = jnp.where(pair_valid, jnp.sum(support, axis=-1), -1)
    best = jnp.argmax(counts, axis=-1)  # [Tr]
    consensus = jnp.take_along_axis(
        support, best[:, None, None], axis=1
    )[:, 0]  # [Tr, V]

    # --- stage 2: full DLT on the consensus set.
    xyz = triangulate_tracks(P, uv, consensus)
    reproj_err, depth, obs_inlier = _score_point(P, T, uv, valid, xyz, max_reproj_px)

    # If refit lost support (degenerate), fall back to the best hypothesis.
    xyz_best = jnp.take_along_axis(xyz_h, best[:, None, None], axis=1)[:, 0]
    err_b, depth_b, inl_b = _score_point(P, T, uv, valid, xyz_best, max_reproj_px)
    use_refit = jnp.sum(obs_inlier, axis=-1) >= jnp.sum(inl_b, axis=-1)
    xyz = jnp.where(use_refit[:, None], xyz, xyz_best)
    reproj_err = jnp.where(use_refit[:, None], reproj_err, err_b)
    obs_inlier = jnp.where(use_refit[:, None], obs_inlier, inl_b)

    centers = -jnp.einsum(
        "tvji,tvj->tvi", T[..., :3, :3], T[..., :3, 3]
    )  # -R^T t
    angle = triangulation_angles(centers, xyz, obs_inlier)
    track_ok = (
        (jnp.sum(obs_inlier, axis=-1) >= 2)
        & (angle >= jnp.deg2rad(min_tri_angle_deg))
        & jnp.all(jnp.isfinite(xyz), axis=-1)
    )
    return xyz, obs_inlier, track_ok, reproj_err


def triangulate_two_view(
    K0: jnp.ndarray,
    K1: jnp.ndarray,
    T0: jnp.ndarray,
    T1: jnp.ndarray,
    pts0: jnp.ndarray,
    pts1: jnp.ndarray,
):
    """Two-view DLT for [B, N, 2] correspondences -> [B, N, 3] world points."""
    P0 = projection_matrix(K0, T0)  # [B, 3, 4]
    P1 = projection_matrix(K1, T1)
    b, n = pts0.shape[0], pts0.shape[1]
    P = jnp.stack([P0, P1], axis=1)  # [B, 2, 3, 4]
    P = jnp.broadcast_to(P[:, None], (b, n, 2, 3, 4)).reshape(b * n, 2, 3, 4)
    uv = jnp.stack([pts0, pts1], axis=2).reshape(b * n, 2, 2)
    valid = jnp.ones((b * n, 2), dtype=bool)
    xyz = triangulate_tracks(P, uv, valid)
    return xyz.reshape(b, n, 3)
