"""Dual-softmax coarse matching with fixed-capacity match selection.

TPU-native redesign of the reference coarse matcher
(``src/models/OnePosePlus/utils/coarse_matching.py:56-251``): instead of the
data-dependent ``torch.where`` over the mutual-nearest-neighbor mask, matches
live in K static slots per sample selected with ``lax.top_k`` and carry a
validity mask. Under mutual-NN each row (3D point / grid-0 cell) has at most
one matching column, so row-wise selection is lossless as long as
K >= #matches; overflow drops the lowest-confidence matches first.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class CoarseMatches(NamedTuple):
    """K fixed match slots per batch element."""

    i_ids: jnp.ndarray  # [N, K] int32 — row index (3D point id / grid-0 cell)
    j_ids: jnp.ndarray  # [N, K] int32 — column index (query grid cell)
    mconf: jnp.ndarray  # [N, K] confidence (0 for invalid or GT-padded slots)
    mask: jnp.ndarray   # [N, K] bool validity


def dual_softmax_confidence(
    feat0: jnp.ndarray,
    feat1: jnp.ndarray,
    temperature: float,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
    feat_norm: str = "sqrt_feat_dim",
) -> jnp.ndarray:
    """Dual-softmax confidence matrix [N, L, S] from features [N, L, C], [N, S, C].

    Matches reference semantics: features scaled by 1/sqrt(C) (``sqrt_feat_dim``
    normalizer), similarity divided by (temperature + 1e-4), -1e9 added at
    masked positions, then softmax over rows times softmax over columns.
    """
    # matching numerics are f32 regardless of the model compute dtype (the
    # backbone/transformer may hand over bf16 features)
    feat0 = feat0.astype(jnp.float32)
    feat1 = feat1.astype(jnp.float32)
    if feat_norm == "sqrt_feat_dim":
        scale = 1.0 / (feat0.shape[-1] ** 0.5)
        feat0 = feat0 * scale
        feat1 = feat1 * scale
    elif feat_norm not in ("none", None):
        raise ValueError(f"unknown feat_norm {feat_norm}")

    sim = jnp.einsum("nlc,nsc->nls", feat0, feat1) / (temperature + 1e-4)
    if mask0 is not None or mask1 is not None:
        n, l, s = sim.shape
        m0 = mask0 if mask0 is not None else jnp.ones((n, l), bool)
        m1 = mask1 if mask1 is not None else jnp.ones((n, s), bool)
        valid = m0[:, :, None].astype(bool) & m1[:, None, :].astype(bool)
        sim = sim + jnp.where(valid, 0.0, -1e9)
    return jax.nn.softmax(sim, axis=1) * jax.nn.softmax(sim, axis=2)


def dual_softmax_log_confidence(
    feat0: jnp.ndarray,
    feat1: jnp.ndarray,
    temperature: float,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
    feat_norm: str = "sqrt_feat_dim",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(conf, log_conf): ``dual_softmax_confidence`` plus its stable log.

    ``log_conf = log_softmax(sim, 1) + log_softmax(sim, 2)`` stays finite (and
    differentiable with bounded gradients w.r.t. the similarity logits) even
    where the softmax *product* underflows f32 — the regime in which the
    clamped reference focal loss (``src/lightning_model/losses.py:26-35``,
    ``torch.clamp(conf, 1e-6, ...)``) loses its positive-term gradient.
    Used by the log-space coarse loss (``train.losses.coarse_focal_loss``).
    """
    feat0 = feat0.astype(jnp.float32)
    feat1 = feat1.astype(jnp.float32)
    if feat_norm == "sqrt_feat_dim":
        scale = 1.0 / (feat0.shape[-1] ** 0.5)
        feat0 = feat0 * scale
        feat1 = feat1 * scale
    elif feat_norm not in ("none", None):
        raise ValueError(f"unknown feat_norm {feat_norm}")
    sim = jnp.einsum("nlc,nsc->nls", feat0, feat1) / (temperature + 1e-4)
    if mask0 is not None or mask1 is not None:
        n, l, s = sim.shape
        m0 = mask0 if mask0 is not None else jnp.ones((n, l), bool)
        m1 = mask1 if mask1 is not None else jnp.ones((n, s), bool)
        valid = m0[:, :, None].astype(bool) & m1[:, None, :].astype(bool)
        sim = sim + jnp.where(valid, 0.0, -1e9)
    log_conf = jax.nn.log_softmax(sim, axis=1) + jax.nn.log_softmax(sim, axis=2)
    return jnp.exp(log_conf), log_conf


def _border_keep(h: int, w: int, border: int, two_sided: bool) -> jnp.ndarray:
    """[h*w] bool — grid cells outside the removed border.

    ``two_sided=False`` replicates the reference 2D-3D matcher quirk where the
    torch slice ``m[..., -b:0]`` is empty, so only the top/left borders are
    removed (``coarse_matching.py:10-20``). ``two_sided=True`` is the original
    LoFTR behavior (all four borders removed) used by the image-pair matcher.
    """
    r = jnp.arange(h * w) // w
    c = jnp.arange(h * w) % w
    keep = (r >= border) & (c >= border)
    if two_sided:
        keep = keep & (r < h - border) & (c < w - border)
    return keep


def select_topk_matches(
    conf: jnp.ndarray,
    grid_hw: Tuple[int, int],
    thr: float,
    border_rm: int,
    k: int,
    axis: int = 2,
    border_two_sided: bool = False,
    row_grid_hw: Optional[Tuple[int, int]] = None,
) -> CoarseMatches:
    """Mutual-nearest-neighbor + threshold + border filter, into K static slots.

    Args:
        conf: [N, L, S] dual-softmax confidence.
        grid_hw: (h, w) of the S axis grid (query image coarse grid).
        thr: confidence threshold.
        border_rm: border cells to remove on the S grid.
        k: number of match slots.
        axis: which axis the per-row unique column lives on (always 2 here).
        border_two_sided: see ``_border_keep``.
        row_grid_hw: if given, the L axis is also a (h, w) grid whose border is
            removed too (image-pair matching); otherwise L indexes 3D points.
    """
    del axis
    n, l, s = conf.shape
    h, w = grid_hw
    assert h * w == s, f"grid {grid_hw} != S {s}"

    row_max = jnp.max(conf, axis=2, keepdims=True)
    col_max = jnp.max(conf, axis=1, keepdims=True)
    mutual = (conf == row_max) & (conf == col_max)
    valid = mutual & (conf > thr)
    valid = valid & _border_keep(h, w, border_rm, border_two_sided)[None, None, :]
    if row_grid_hw is not None:
        rh, rw = row_grid_hw
        assert rh * rw == l
        valid = valid & _border_keep(rh, rw, border_rm, border_two_sided)[None, :, None]

    # Under mutual-NN each row has at most one valid column.
    row_has = jnp.any(valid, axis=2)  # [N, L]
    j_of_row = jnp.argmax(jnp.where(valid, conf, -1.0), axis=2)  # [N, L]
    conf_of_row = jnp.take_along_axis(conf, j_of_row[:, :, None], axis=2)[..., 0]
    score = jnp.where(row_has, conf_of_row, -1.0)

    k_eff = min(k, l)
    top_score, i_ids = jax.lax.top_k(score, k_eff)  # [N, K_eff]
    if k_eff < k:
        pad = k - k_eff
        top_score = jnp.pad(top_score, ((0, 0), (0, pad)), constant_values=-1.0)
        i_ids = jnp.pad(i_ids, ((0, 0), (0, pad)))
    j_ids = jnp.take_along_axis(j_of_row, i_ids, axis=1)
    mask = top_score > 0.0
    mconf = jnp.where(mask, top_score, 0.0)
    return CoarseMatches(i_ids.astype(jnp.int32), j_ids.astype(jnp.int32), mconf, mask)


def pad_matches_with_gt(
    matches: CoarseMatches,
    gt_cell: jnp.ndarray,
    rng: jax.Array,
    num_gt_min: int,
) -> CoarseMatches:
    """Training-time GT padding: append ``num_gt_min`` GT slots to the K
    prediction slots (output has K + num_gt_min slots).

    Redesign of reference ``get_coarse_match`` training padding
    (``coarse_matching.py:177-217``): the reference random-subsamples predicted
    matches to a capacity and pads with >= num_gt_min random ground-truth
    correspondences whose confidence is set to 0 so downstream consumers can
    separate them (a GT-padded slot has mconf == 0 but mask True). Here the
    prediction capacity is enforced up front by ``select_topk_matches`` (top-K
    by confidence rather than a random subset — a deliberate deviation that
    keeps shapes static; overflow drops the least-confident matches).

    Args:
        matches: prediction slots from ``select_topk_matches`` (K slots).
        gt_cell: [N, L] int — GT column for each row (-1 = no GT match).
            Sparse equivalent of the reference's dense ``conf_matrix_gt``.
        rng: PRNG key.
        num_gt_min: number of GT slots to append.
    """
    n, k = matches.i_ids.shape
    rng_gt = rng
    pred_i, pred_j = matches.i_ids, matches.j_ids
    pred_conf, pred_mask = matches.mconf, matches.mask

    # --- sample GT rows for the tail slots --------------------------------
    gt_row_valid = gt_cell >= 0  # [N, L]
    gt_j_of_row = jnp.maximum(gt_cell, 0)  # [N, L]
    # Gumbel-top-k over rows ~ sampling without replacement proportional to mask
    g = jax.random.gumbel(rng_gt, gt_row_valid.shape)
    gt_scores = jnp.where(gt_row_valid, g, -jnp.inf)
    _, gt_rows_sorted = jax.lax.top_k(gt_scores, num_gt_min)  # [N, num_gt_min]
    n_gt = jnp.sum(gt_row_valid, axis=1, keepdims=True)  # [N, 1]
    # wrap around if fewer GT rows than slots (sample with replacement effect)
    slot_idx = jnp.arange(num_gt_min)[None, :]
    take = jnp.where(n_gt > 0, jnp.minimum(slot_idx, n_gt - 1), 0)
    gt_i = jnp.take_along_axis(gt_rows_sorted, take, axis=1)
    gt_j = jnp.take_along_axis(gt_j_of_row, gt_i, axis=1)
    gt_mask = jnp.broadcast_to(n_gt > 0, (n, num_gt_min))

    i_ids = jnp.concatenate([pred_i, gt_i.astype(jnp.int32)], axis=1)
    j_ids = jnp.concatenate([pred_j, gt_j.astype(jnp.int32)], axis=1)
    mconf = jnp.concatenate([pred_conf, jnp.zeros((n, num_gt_min), pred_conf.dtype)], axis=1)
    mask = jnp.concatenate([pred_mask, gt_mask], axis=1)
    return CoarseMatches(i_ids, j_ids, mconf, mask)
