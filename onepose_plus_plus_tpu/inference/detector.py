"""Local-feature object detection: first-frame / lost-track bbox discovery.

Behavioral port of reference
``src/local_feature_object_detector/local_feature_2D_detector.py:37-226``:
match reference DB views (sampled from the SfM model) against the full query
frame with LoFTR, fit an affine transform per view with RANSAC
(cv2.estimateAffine2D replacement), project the DB image corners into the
query to get a bbox, pick the view with most inliers; fall back to a centered
box when matching fails; or project the 3D box with the previous frame's pose
(``previous_pose_detect``) while tracking.

TPU-native: all DB views match against the query in ONE batched LoFTR forward,
and the per-view affine RANSACs run vmapped in the same device program.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.preprocessing import crop_img_by_bbox, square_bbox

_EPS = 1e-9


def _fit_affine(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """LSQ affine A [2, 3] from src [S, 2] -> dst [S, 2]."""
    s = src.shape[0]
    X = jnp.concatenate([src, jnp.ones((s, 1), src.dtype)], axis=1)  # [S, 3]
    # solve X @ A.T = dst  (normal equations, 3x3)
    XtX = X.T @ X + 1e-6 * jnp.eye(3, dtype=src.dtype)
    At = jnp.linalg.solve(XtX, X.T @ dst)  # [3, 2]
    return At.T  # [2, 3]


@partial(jax.jit, static_argnames=("num_hypotheses", "sample_size"))
def ransac_affine(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    valid: jnp.ndarray,
    rng: jax.Array,
    inlier_threshold_px: float = 4.0,
    num_hypotheses: int = 256,
    sample_size: int = 3,
):
    """RANSAC 2D affine fit (cv2.estimateAffine2D equivalent, batched inside).

    Args:
        src, dst: [N, 2]; valid: [N] bool; rng: PRNG key.
    Returns:
        (A [2, 3], inliers [N] bool, num_inliers int32).
    """
    n = src.shape[0]
    g = jax.random.gumbel(rng, (num_hypotheses, n))
    scores = jnp.where(valid[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(scores, sample_size)  # [H, S]
    A_h = jax.vmap(_fit_affine)(src[idx], dst[idx])  # [H, 2, 3]

    ones = jnp.ones((n, 1), src.dtype)
    X = jnp.concatenate([src, ones], axis=1)  # [N, 3]
    pred = jnp.einsum("hij,nj->hni", A_h, X)  # [H, N, 2]
    err = jnp.linalg.norm(pred - dst[None], axis=-1)
    inl = (err <= inlier_threshold_px) & valid[None]
    counts = jnp.sum(inl, axis=-1)
    finite = jnp.all(jnp.isfinite(A_h), axis=(1, 2))
    counts = jnp.where(finite, counts, -1)
    best = jnp.argmax(counts)
    # refit on the best consensus set (weighted LSQ)
    w = inl[best].astype(src.dtype)
    Xw = X * w[:, None]
    XtX = Xw.T @ X + 1e-6 * jnp.eye(3, dtype=src.dtype)
    At = jnp.linalg.solve(XtX, Xw.T @ dst)
    A = At.T
    pred_f = X @ At
    err_f = jnp.linalg.norm(pred_f - dst, axis=-1)
    inl_f = (err_f <= inlier_threshold_px) & valid
    return A, inl_f, jnp.sum(inl_f).astype(jnp.int32)


class LocalFeatureObjectDetector:
    """Detect the object bbox in a full query frame via DB-view matching."""

    def __init__(
        self,
        matcher_coarse_fn,
        db_images: np.ndarray,  # [V, H, W] grayscale network-res DB views
        output_size: int = 512,
        detect_threshold_px: float = 4.0,
        min_matches: int = 6,
    ):
        """Args:
        matcher_coarse_fn: jitted (img0 [B,H,W,1], img1 [B,H',W',1]) ->
            coarse-match dict (LoFTRMatcher ``match_coarse`` surface); img0
            are DB views, img1 the (tiled) query.
        db_images: reference views sampled from the SfM model images
            (reference samples ~15, ``local_feature_2D_detector.py:37``).
        """
        self.matcher_coarse_fn = matcher_coarse_fn
        self.db_images = db_images
        self.output_size = output_size
        self.detect_threshold_px = detect_threshold_px
        self.min_matches = min_matches

    def detect_bbox(
        self, query: np.ndarray, rng: jax.Array
    ) -> Tuple[np.ndarray, int]:
        """Best bbox [x0, y0, x1, y1] in query pixels + inlier count.

        One batched LoFTR forward over all DB views + vmapped affine RANSAC;
        the view with most inliers wins (reference ``detect_by_matching``).
        """
        v, dh, dw = self.db_images.shape
        img0 = self.db_images[..., None].astype(np.float32)
        img1 = np.tile(query[None, ..., None].astype(np.float32), (v, 1, 1, 1))
        res = self.matcher_coarse_fn(jnp.asarray(img0), jnp.asarray(img1))
        mk0 = res["mkpts0_c"]  # [V, K, 2] in DB-view pixels
        mk1 = res["mkpts1_c"]  # [V, K, 2] in query pixels
        mask = res["match_mask"].astype(bool)

        keys = jax.random.split(rng, v)
        A, inl, counts = jax.vmap(
            lambda s, d, m, k: ransac_affine(
                s, d, m, k, inlier_threshold_px=self.detect_threshold_px
            )
        )(mk0, mk1, mask, keys)
        counts = np.asarray(counts)
        best = int(np.argmax(counts))
        n_inl = int(counts[best])
        if n_inl < self.min_matches:
            # centered fallback box (reference :84-91)
            h, w = query.shape
            half = min(h, w) // 2
            cx, cy = w // 2, h // 2
            return (
                np.array([cx - half, cy - half, cx + half, cy + half], np.float64),
                n_inl,
            )
        corners = np.array(
            [[0, 0, 1], [dw, 0, 1], [dw, dh, 1], [0, dh, 1]], np.float64
        )
        proj = corners @ np.asarray(A[best]).T  # [4, 2]
        x0, y0 = proj.min(axis=0)
        x1, y1 = proj.max(axis=0)
        return np.array([x0, y0, x1, y1]), n_inl

    def detect(
        self,
        query: np.ndarray,
        K: np.ndarray,
        rng: jax.Array,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
        """Detect + square-crop + resize; returns (crop, K_crop, bbox, inliers)."""
        bbox, n_inl = self.detect_bbox(query, rng)
        bbox_sq = square_bbox(bbox)
        crop, K_crop = crop_img_by_bbox(query, bbox_sq, K, self.output_size)
        return crop, K_crop, bbox_sq, n_inl

    def previous_pose_detect(
        self,
        query: np.ndarray,
        K: np.ndarray,
        pose_prev: np.ndarray,
        box_corners_3d: np.ndarray,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Tracking-mode bbox: project the object 3D box with the previous
        frame's pose (reference ``previous_pose_detect``)."""
        pc = box_corners_3d @ pose_prev[:3, :3].T + pose_prev[:3, 3]
        uv = (pc @ K.T)[:, :2] / np.clip((pc @ K.T)[:, 2:3], _EPS, None)
        x0, y0 = uv.min(axis=0)
        x1, y1 = uv.max(axis=0)
        bbox_sq = square_bbox(np.array([x0, y0, x1, y1]))
        crop, K_crop = crop_img_by_bbox(query, bbox_sq, K, self.output_size)
        return crop, K_crop, bbox_sq
