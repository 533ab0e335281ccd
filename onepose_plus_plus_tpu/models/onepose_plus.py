"""OnePose++ 2D-3D matcher: query image grid features vs 3D point-cloud descriptors.

Functional TPU re-design of reference ``OnePosePlusModel.py:96-201``:

    backbone -> sine PE -> [3D kpt MLP encoding] -> coarse linear-attention
    transformer -> dual-softmax coarse matching (K static slots) -> fine window
    gather -> fine transformer -> correlation heatmap soft-argmax.

Everything is static-shape: matches occupy K slots with a validity mask, so the
whole forward jits once and vmaps/pjits over query-frame batches (this batching
replaces the reference's Ray fractional-GPU workers).

Inputs (dict):
    query_image     [N, H, W, 1]  grayscale in [0, 1]
    keypoints3d     [N, L, 3]
    descriptors3d   [N, L, C]     (fine, 256-d averaged SfM descriptors)
    descriptors3d_coarse [N, L, C] optional — used for coarse attention when
                                   present (reference 'descriptors3d_coarse_db')
    query_image_scale [N, 2] optional (h_scale, w_scale) from resize
    query_image_mask  [N, H/8 * W/8] optional padding mask
Training extras:
    conf_matrix_gt  [N, L, S] {0,1}

Outputs (dict): conf_matrix, matches (i/j ids, mconf, mask), coarse and fine
pixel coordinates mkpts_query_c/f [N, K, 2], matched 3D points mkpts_3d [N, K, 3],
fine heatmap expectation expec_f [N, K, 3].
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import OnePosePlusConfig
from ..ops.matching import (
    dual_softmax_confidence,
    dual_softmax_log_confidence,
    select_topk_matches,
    pad_matches_with_gt,
)
from ..ops.take import take_rows
from ..ops.window_gather import gather_windows_aligned
from ..ops.soft_argmax import spatial_expectation_2d, heatmap_std
from .backbone import ResNetFPN_8_2
from .position_encoding import (
    sine_position_encoding,
    normalize_3d_keypoints,
    KeypointEncoder,
)
from .transformer import LocalFeatureTransformer


class OnePosePlusModel(nn.Module):
    cfg: OnePosePlusConfig = OnePosePlusConfig()

    def setup(self):
        import dataclasses as _dc

        dt = getattr(jnp, self.cfg.compute_dtype, jnp.float32)
        self.backbone = ResNetFPN_8_2(self.cfg.backbone, dtype=dt)
        if self.cfg.keypoints_encoding.enable:
            self.kpt_encoder = KeypointEncoder(
                layers=self.cfg.keypoints_encoding.layers,
                feature_dim=self.cfg.keypoints_encoding.descriptor_dim,
                norm_method=self.cfg.keypoints_encoding.norm_method,
            )
        coarse_cfg = _dc.replace(
            self.cfg.coarse, compute_dtype=self.cfg.compute_dtype
        )
        self.loftr_coarse = LocalFeatureTransformer(coarse_cfg)
        if self.cfg.fine.enable:
            fine_cfg = _dc.replace(
                self.cfg.fine.transformer, compute_dtype=self.cfg.compute_dtype
            )
            self.loftr_fine = LocalFeatureTransformer(fine_cfg)

    def __call__(
        self, batch: Dict[str, jnp.ndarray], train: bool = False
    ) -> Dict[str, Any]:
        cfg = self.cfg
        img = batch["query_image"]
        n, h_i, w_i, _ = img.shape

        # 1. backbone -------------------------------------------------------
        # sparse fine path: defer the 1/2-level FPN convs until the matched
        # cells are known (backbone.fine_windows); inference-only
        sparse_fine = cfg.fine.enable and not train and (
            cfg.fine.sparse_fpn is True
        )
        if sparse_fine:
            feat_c_map, fine_ctx = self.backbone.coarse_and_ctx(img, train=train)
            h_f, w_f = fine_ctx[0].shape[1:3]
        else:
            feat_c_map, feat_f_map = self.backbone(img, train=train)
            h_f, w_f = feat_f_map.shape[1:3]
        h_c, w_c = feat_c_map.shape[1:3]

        # 2. positional encodings ------------------------------------------
        if cfg.positional_encoding:
            feat_c_map = sine_position_encoding(feat_c_map, cfg.pe_temp_bug_fix)
        feat_query_c = feat_c_map.reshape(n, h_c * w_c, -1)

        kpts3d = batch["keypoints3d"]
        desc3d_coarse = batch.get("descriptors3d_coarse", batch["descriptors3d"])
        if cfg.keypoints_encoding.enable:
            desc3d_coarse = self.kpt_encoder(
                normalize_3d_keypoints(kpts3d), desc3d_coarse
            )

        query_mask = batch.get("query_image_mask")

        # 3. coarse transformer + dual-softmax matching ---------------------
        desc3d_c, feat_query_c = self.loftr_coarse(
            desc3d_coarse, feat_query_c, mask1=query_mask, train=train
        )

        k_slots = (
            cfg.coarse_matching.train_max_matches
            if train
            else cfg.coarse_matching.max_matches
        )
        # fused streaming kernels (never materialize [L, S]) on TPU: selection
        # for both modes, and at training the losses consume the coarse
        # features directly through the fused focal-loss VJP kernels
        # (ops.pallas_coarse_loss) instead of a materialized conf matrix
        use_fused = cfg.coarse_matching.use_fused_kernel
        if use_fused is None:
            # both modes: inference selection AND the fused TRAIN path
            # (streaming selection + focal-loss VJP kernels) — gradient parity
            # is pinned compiled-on-chip by
            # test_tpu_compiled.py::test_fused_coarse_loss_parity_compiled
            use_fused = jax.default_backend() == "tpu"
        if train and query_mask is not None:
            # the fused focal-loss VJP kernels have no masked-column variant;
            # masked training batches route through the dense log-space path
            # (the production train config is mask-free, so the fused path
            # stays the TPU default)
            use_fused = False
        conf = None
        if use_fused:
            from ..ops.pallas_matching import fused_select_topk_matches

            # selection is index-only (no gradient path in training — the
            # coarse loss differentiates through ops.pallas_coarse_loss, and
            # mconf feeds nothing differentiable); detaching the inputs keeps
            # autodiff's linearization out of the VJP-less selection kernels
            matches = fused_select_topk_matches(
                jax.lax.stop_gradient(desc3d_c),
                jax.lax.stop_gradient(feat_query_c),
                cfg.coarse_matching.temperature,
                (h_c, w_c),
                cfg.coarse_matching.thr,
                cfg.coarse_matching.border_rm,
                k_slots
                - (cfg.coarse_matching.train_pad_num_gt_min if train else 0),
                border_two_sided=cfg.coarse_matching.border_two_sided,
                feat_norm=cfg.coarse_matching.feat_norm_method,
                col_mask=query_mask,
            )
        else:
            log_conf = None
            if train:
                # the loss consumes the stable log-confidence (see
                # LossConfig.log_space — the clamped form has no gradient at
                # diffuse confidences)
                conf, log_conf = dual_softmax_log_confidence(
                    desc3d_c,
                    feat_query_c,
                    cfg.coarse_matching.temperature,
                    mask1=query_mask,
                    feat_norm=cfg.coarse_matching.feat_norm_method,
                )
            else:
                conf = dual_softmax_confidence(
                    desc3d_c,
                    feat_query_c,
                    cfg.coarse_matching.temperature,
                    mask1=query_mask,
                    feat_norm=cfg.coarse_matching.feat_norm_method,
                )
            matches = select_topk_matches(
                conf,
                (h_c, w_c),
                cfg.coarse_matching.thr,
                cfg.coarse_matching.border_rm,
                k_slots
                - (cfg.coarse_matching.train_pad_num_gt_min if train else 0),
                border_two_sided=cfg.coarse_matching.border_two_sided,
            )
        if train:
            matches = pad_matches_with_gt(
                matches,
                batch["gt_cell"],
                self.make_rng("matching"),
                cfg.coarse_matching.train_pad_num_gt_min,
            )

        # coarse pixel coordinates (original-resolution via query_image_scale)
        scale_c = h_i / h_c
        jx = (matches.j_ids % w_c).astype(jnp.float32)
        jy = (matches.j_ids // w_c).astype(jnp.float32)
        mkpts_query_c = jnp.stack([jx, jy], axis=-1) * scale_c  # [N, K, 2]
        if "query_image_scale" in batch:
            # scale (h, w) -> multiply (x, y) by (w_scale, h_scale)
            s = batch["query_image_scale"][:, None, ::-1]
            mkpts_query_c = mkpts_query_c * s
        mkpts_3d = take_rows(kpts3d, matches.i_ids)

        out: Dict[str, Any] = {
            "i_ids": matches.i_ids,
            "j_ids": matches.j_ids,
            "mconf": matches.mconf,
            "match_mask": matches.mask,
            "mkpts_query_c": mkpts_query_c,
            "mkpts_3d": mkpts_3d,
            "hw_c": (h_c, w_c),
            "hw_f": (h_f, w_f),
            "hw_i": (h_i, w_i),
        }
        if conf is not None:
            out["conf_matrix"] = conf
            if train and log_conf is not None:
                out["log_conf_matrix"] = log_conf
        elif train:
            # fused-loss context: losses.compute_losses routes the coarse
            # focal loss through the streaming VJP kernels on these features
            # (query_mask batches were routed to the dense path above)
            out["coarse_loss_ctx"] = {
                "feats": (desc3d_c, feat_query_c),
                "temperature": cfg.coarse_matching.temperature,
                "feat_norm": cfg.coarse_matching.feat_norm_method,
            }

        if not cfg.fine.enable:
            out["mkpts_query_f"] = mkpts_query_c
            return out

        # 4. fine-level refinement ------------------------------------------
        w_win = cfg.fine.window_size
        stride = h_f // h_c
        if sparse_fine:
            # FPN 1/2-level convs run only on per-match halo patches — the
            # windows come out directly, no separate gather
            windows = self.backbone.fine_windows(
                fine_ctx, matches.j_ids, (h_c, w_c), stride, w_win, train
            )  # [N, K, WW, Cf]
        else:
            # windows are centered on coarse cells -> MXU-aligned gather
            windows = gather_windows_aligned(
                feat_f_map, matches.j_ids, (h_c, w_c), stride, w_win, train=train
            )  # [N, K, WW, Cf]

        desc3d_fine = batch["descriptors3d"]
        if desc3d_fine.shape[-1] != windows.shape[-1]:
            raise ValueError(
                "fine descriptors3d must match fine feature dim "
                f"({desc3d_fine.shape[-1]} vs {windows.shape[-1]})"
            )
        desc_sel = take_rows(desc3d_fine, matches.i_ids)
        # fine transformer over flattened (N*K) match batch; the descriptor
        # stream follows the window (compute) dtype so bf16 configs keep a
        # bf16 stream end-to-end
        k = matches.i_ids.shape[1]
        c_f = windows.shape[-1]
        d0 = desc_sel.astype(windows.dtype).reshape(n * k, 1, c_f)
        d1 = windows.reshape(n * k, w_win * w_win, c_f)
        d0, d1 = self.loftr_fine(d0, d1, train=train)

        # 5. correlation heatmap soft-argmax ---------------------------------
        center_desc = d0[:, 0, :]  # [N*K, C]
        sim = jnp.einsum("mc,mrc->mr", center_desc, d1) / (c_f**0.5)
        heat = jax.nn.softmax(sim, axis=-1)
        coords = spatial_expectation_2d(heat, w_win)  # [N*K, 2] in [-1, 1]
        std = heatmap_std(heat, coords, w_win)  # [N*K]
        coords = coords.reshape(n, k, 2)
        std = std.reshape(n, k)

        scale_f = h_i / h_f
        offset = coords * (w_win // 2) * scale_f
        if "query_image_scale" in batch:
            offset = offset * batch["query_image_scale"][:, None, ::-1]
        out["expec_f"] = jnp.concatenate([coords, std[..., None]], axis=-1)
        out["mkpts_query_f"] = mkpts_query_c + offset
        return out
