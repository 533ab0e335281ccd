"""Training losses for the 2D-3D matcher (focal coarse + std-weighted fine L2).

Behavioral port of reference ``src/lightning_model/losses.py:7-142`` and
``src/models/OnePosePlus/utils/fine_supervision.py:4-31`` — redesigned for
static shapes:

* GT is carried sparsely as ``gt_cell [N, L]`` (coarse grid cell of each 3D
  point, -1 = unmatched) and ``gt_fine_xy [N, L, 2]`` (exact projected pixel)
  instead of the reference's dense ``conf_matrix_gt [L, S]`` /
  ``fine_location_matrix_gt [L, S, 2]`` tensors; the dense semantics are
  recovered on device with index comparisons that XLA fuses into the loss.
* Matches live in K static slots with validity masks; data-dependent boolean
  indexing (``conf[conf_gt == 1]``) becomes masked reductions.
* The reference's "assign a false supervision to avoid ddp deadlock"
  (``losses.py:89-91``) is unnecessary: masked sums always produce defined
  gradients on every device, so SPMD never deadlocks.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LossConfig:
    coarse_type: str = "focal"
    focal_alpha: float = 0.5
    focal_gamma: float = 2.0
    pos_weight: float = 1.0
    neg_weight: float = 1.0
    coarse_weight: float = 1.0
    # log-space positive focal term (default): the reference clamps conf to
    # [1e-6, 1-1e-6] (``losses.py:26``), which ZEROES the positive-term
    # gradient whenever a GT cell's dual-softmax confidence sits below 1e-6 —
    # at diffuse confidences (e.g. toy/overfit scale, or any training
    # collapse) the coarse loss saturates at -alpha*log(1e-6) and training
    # dies (round-2 0.0-accuracy root cause; see artifacts/train_parity).
    # log_space=True computes -alpha*(1-conf)^gamma*log_conf from the stable
    # log-softmax sum instead: identical inside the clamp range, healthy
    # bounded gradients outside it. False reproduces the exact reference
    # clamp semantics (parity tests).
    log_space: bool = True
    fine_type: str = "l2_with_std"
    # base fine weight; the effective weight applied in compute_losses is
    # fine_weight * (window_size / 5)^2 (reference train_onepose_plus.py:41)
    fine_weight: float = 0.25
    fine_correct_thr: float = 1.0


def effective_fine_weight(cfg: LossConfig, window_size: int) -> float:
    """Reference autoscale: ``0.25 * (W/5)^2`` (``train_onepose_plus.py:41``)."""
    return cfg.fine_weight * (window_size / 5.0) ** 2


def coarse_focal_loss(
    conf: jnp.ndarray,
    gt_cell: jnp.ndarray,
    cfg: LossConfig,
    c_weight: Optional[jnp.ndarray] = None,
    log_conf: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Focal BCE on the dual-softmax confidence matrix vs {0,1} GT.

    Args:
        conf: [N, L, S] dual-softmax confidence.
        gt_cell: [N, L] int32 — GT coarse cell for each 3D point, -1 if none.
        c_weight: optional [N, L, S] padding weight (reference ``compute_c_weight``).
        log_conf: optional [N, L, S] stable log-confidence (from
            ``dual_softmax_log_confidence``); derived from ``conf`` if absent.

    Reference semantics (``losses.py:18-56``): mean of weighted focal terms
    over positive entries plus over negative entries, each normalized by the
    *count* of entries in that class (weights scale the numerator only). With
    ``cfg.log_space`` (default) the positive term runs unclamped in log space
    — see ``LossConfig.log_space`` for why the reference clamp kills training
    at diffuse confidences.
    """
    assert cfg.coarse_type == "focal", cfg.coarse_type
    n, l, s = conf.shape
    cell_ids = jnp.arange(s, dtype=gt_cell.dtype)[None, None, :]
    pos = gt_cell[:, :, None] == cell_ids  # [N, L, S] bool
    alpha, gamma = cfg.focal_alpha, cfg.focal_gamma

    if cfg.log_space:
        if log_conf is None:
            # FALLBACK ONLY — log-space callers should pass log_conf from
            # dual_softmax_log_confidence. Recovering it from conf cannot be
            # made stable: once conf underflows f32 to exactly 0 at a GT cell,
            # log(max(conf, 1e-38)) is constant there and the positive-term
            # gradient dies — the same saturation failure log_space exists to
            # fix, relocated from 1e-6 to ~1e-38 (round-3 advisor finding).
            log_conf = jnp.log(jnp.maximum(conf, 1e-38))
        # cap at log(1-1e-6) so the negative term's log1p stays finite and
        # the positive term stays >= 0
        log_conf = jnp.minimum(log_conf, -1e-6)
        conf = jnp.exp(log_conf)
        loss_pos = -alpha * (1.0 - conf) ** gamma * log_conf
        loss_neg = -(1.0 - alpha) * conf**gamma * jnp.log1p(-conf)
    else:
        conf = jnp.clip(conf, 1e-6, 1.0 - 1e-6)
        loss_pos = -alpha * (1.0 - conf) ** gamma * jnp.log(conf)
        loss_neg = -(1.0 - alpha) * conf**gamma * jnp.log(1.0 - conf)
    if c_weight is not None:
        loss_pos = loss_pos * c_weight
        loss_neg = loss_neg * c_weight

    n_pos = jnp.sum(pos)
    n_neg = pos.size - n_pos
    pos_f = pos.astype(conf.dtype)
    mean_pos = jnp.sum(loss_pos * pos_f) / jnp.maximum(n_pos, 1)
    mean_neg = jnp.sum(loss_neg * (1.0 - pos_f)) / jnp.maximum(n_neg, 1)
    return cfg.pos_weight * mean_pos + cfg.neg_weight * mean_neg


def fine_supervision(
    i_ids: jnp.ndarray,
    j_ids: jnp.ndarray,
    gt_cell: jnp.ndarray,
    gt_fine_xy: jnp.ndarray,
    hw_c: Tuple[int, int],
    coarse_scale: float,
    fine_scale: float,
    window_size: int,
    query_image_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """GT fine offsets ``expec_f_gt [N, K, 2]`` at the predicted coarse matches.

    Port of ``fine_supervision.py:4-31``: the GT fine location of 3D point i is
    looked up at the *predicted* (i, j); a prediction in the wrong coarse cell
    reads location 0 (dense-matrix semantics), yielding an out-of-window offset
    that the loss's correct_mask filters out.
    """
    radius = window_size // 2
    w_c = hw_c[1]
    cs = jnp.asarray(coarse_scale, jnp.float32)
    fs = jnp.asarray(fine_scale, jnp.float32)
    if query_image_scale is not None:
        # [N, 2] (h_scale, w_scale) -> per-sample (x, y) scale
        sc = query_image_scale[:, None, ::-1]
        cs = cs * sc
        fs = fs * sc
    mkpts_query = (
        jnp.stack([j_ids % w_c, j_ids // w_c], axis=-1).astype(jnp.float32) * cs
    )  # [N, K, 2]
    gt_xy = jnp.take_along_axis(gt_fine_xy, i_ids[..., None], axis=1)  # [N, K, 2]
    gt_j = jnp.take_along_axis(gt_cell, i_ids, axis=1)  # [N, K]
    hit = (gt_j == j_ids) & (gt_j >= 0)
    gt_xy = jnp.where(hit[..., None], gt_xy, 0.0)
    return (gt_xy - mkpts_query) / fs / radius


def fine_l2_std_loss(
    expec_f: jnp.ndarray,
    expec_f_gt: jnp.ndarray,
    slot_mask: jnp.ndarray,
    cfg: LossConfig,
) -> jnp.ndarray:
    """Std-weighted L2 on normalized fine offsets (``losses.py:66-103``).

    Args:
        expec_f: [N, K, 3] (x, y, std) predictions.
        expec_f_gt: [N, K, 2] normalized GT offsets.
        slot_mask: [N, K] bool match-slot validity.
    """
    x = expec_f.reshape(-1, 3)
    gt = expec_f_gt.reshape(-1, 2)
    m = slot_mask.reshape(-1)

    correct = (jnp.max(jnp.abs(gt), axis=1) < cfg.fine_correct_thr) & m
    inv_std = 1.0 / jnp.clip(x[:, 2], 1e-10, None)
    # reference normalizes by the mean inverse std over all matches (detached)
    denom = jnp.maximum(jnp.sum(m), 1)
    mean_inv = jnp.sum(jnp.where(m, inv_std, 0.0)) / denom
    weight = jax.lax.stop_gradient(inv_std / jnp.maximum(mean_inv, 1e-10))

    offset_l2 = jnp.sum((gt - x[:, :2]) ** 2, axis=1)
    n_correct = jnp.sum(correct)
    loss = jnp.sum(jnp.where(correct, offset_l2 * weight, 0.0)) / jnp.maximum(
        n_correct, 1
    )
    return loss


def compute_losses(
    out: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    cfg: LossConfig,
    window_size: int,
    coarse_scale: float = 8.0,
    fine_scale: float = 2.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total loss + scalars from model outputs and a training batch.

    Expects ``out`` from ``OnePosePlusModel.__call__(train=True)`` and batch
    keys ``gt_cell`` [N, L], ``gt_fine_xy`` [N, L, 2]; optional
    ``query_image_scale``.
    """
    if "conf_matrix" in out:
        loss_c = coarse_focal_loss(
            out["conf_matrix"], batch["gt_cell"], cfg,
            c_weight=batch.get("c_weight"),
            log_conf=out.get("log_conf_matrix"),
        )
        max_conf = jnp.max(out["conf_matrix"])
    else:
        # fused TPU train path: the model hands over the coarse features and
        # the streaming focal-loss kernels never materialize [L, S]
        from ..ops.pallas_coarse_loss import fused_coarse_focal_loss

        if batch.get("c_weight") is not None:
            raise ValueError("c_weight unsupported on the fused coarse loss")
        if not cfg.log_space:
            raise ValueError(
                "the fused coarse loss is log-space only (set "
                "coarse_matching.use_fused_kernel=False for clamped-reference "
                "semantics)"
            )
        ctx = out["coarse_loss_ctx"]
        f0, f1 = ctx["feats"]
        loss_c, max_conf = fused_coarse_focal_loss(
            f0,
            f1,
            batch["gt_cell"],
            ctx["temperature"],
            cfg.focal_alpha,
            cfg.focal_gamma,
            cfg.pos_weight,
            cfg.neg_weight,
            feat_norm=ctx["feat_norm"],
        )
    loss = loss_c * cfg.coarse_weight
    scalars = {"loss_c": loss_c}
    if "expec_f" in out:
        expec_f_gt = fine_supervision(
            out["i_ids"],
            out["j_ids"],
            batch["gt_cell"],
            batch["gt_fine_xy"],
            out["hw_c"],
            coarse_scale,
            fine_scale,
            window_size,
            batch.get("query_image_scale"),
        )
        loss_f = fine_l2_std_loss(
            out["expec_f"], expec_f_gt, out["match_mask"], cfg
        )
        loss = loss + loss_f * effective_fine_weight(cfg, window_size)
        scalars["loss_f"] = loss_f
    scalars["loss"] = loss
    # reference logs `train/max conf_matrix` every log interval
    # (OnePosePlus_lightning_model.py:70-72)
    scalars["max_conf"] = max_conf
    return loss, scalars
