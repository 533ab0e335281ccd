"""Detector-free image-pair matcher (full LoFTR, TPU-native).

The reference depends on the non-vendored zju3dv/LoFTR submodule wrapped by
``src/KeypointFreeSfM/loftr_for_sfm/loftr.py:16-167``; this module implements
the complete matcher from scratch against the architecture spec in
``loftr_for_onepose_plus_cfg.py`` (d_model 256/128, nhead 8, 4x self/cross
coarse + 1x fine, linear attention, dual-softmax T=0.1, thr 0.2, fine window 9).

Capabilities mirror the wrapper's three modes:
  * ``match``          — full coarse + fine matching of an image pair.
  * ``match_coarse``   — coarse-only (SfM coarse matching pass).
  * ``refine``         — fine refinement of PROVIDED coarse matches
                          (post-optimization pass), optionally returning
                          backbone features sampled at the matches
                          (reference ``extract_coarse_feature`` /
                          ``extract_fine_feature``).

All outputs use K static match slots with validity masks.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import LoFTRConfig
from ..ops.matching import dual_softmax_confidence, select_topk_matches
from ..ops.window_gather import gather_windows, gather_windows_aligned
from ..ops.soft_argmax import spatial_expectation_2d, heatmap_std
from .backbone import ResNetFPN_8_2
from .position_encoding import sine_position_encoding
from .transformer import LocalFeatureTransformer


def _bilinear_sample(feat: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Sample [H, W, C] feature map at [K, 2] (x, y) positions (bilinear, clamped).

    Grid-sample replacement for the reference's kornia-based feature sampler
    (``loftr_for_sfm/utils/sample_feature_from_featuremap.py``).
    """
    h, w, _ = feat.shape
    x = jnp.clip(xy[:, 0], 0.0, w - 1.0)
    y = jnp.clip(xy[:, 1], 0.0, h - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    wx = (x - x0)[:, None]
    wy = (y - y0)[:, None]
    f00 = feat[y0, x0]
    f01 = feat[y0, x1]
    f10 = feat[y1, x0]
    f11 = feat[y1, x1]
    return (
        f00 * (1 - wx) * (1 - wy)
        + f01 * wx * (1 - wy)
        + f10 * (1 - wx) * wy
        + f11 * wx * wy
    )


class LoFTRMatcher(nn.Module):
    cfg: LoFTRConfig = LoFTRConfig()

    def setup(self):
        import dataclasses as _dc

        import jax.numpy as jnp

        dt = getattr(jnp, self.cfg.compute_dtype, jnp.float32)
        self.backbone = ResNetFPN_8_2(self.cfg.backbone, dtype=dt)
        self.loftr_coarse = LocalFeatureTransformer(
            _dc.replace(self.cfg.coarse, compute_dtype=self.cfg.compute_dtype)
        )
        self.loftr_fine = LocalFeatureTransformer(
            _dc.replace(self.cfg.fine, compute_dtype=self.cfg.compute_dtype)
        )

    # ------------------------------------------------------------------ #
    # building blocks
    # ------------------------------------------------------------------ #
    def _backbone_pair(self, img0, img1, train=False):
        """Shared backbone over both images (batched together for the MXU)."""
        n = img0.shape[0]
        stacked = jnp.concatenate([img0, img1], axis=0)
        feat_c, feat_f = self.backbone(stacked, train=train)
        return feat_c[:n], feat_c[n:], feat_f[:n], feat_f[n:]

    def _coarse_features(self, img0, img1, train=False):
        c0_map, c1_map, f0_map, f1_map = self._backbone_pair(img0, img1, train)
        pe = lambda m: sine_position_encoding(m, self.cfg.pe_temp_bug_fix)
        n, h0c, w0c, c = c0_map.shape
        h1c, w1c = c1_map.shape[1:3]
        feat0 = pe(c0_map).reshape(n, h0c * w0c, c)
        feat1 = pe(c1_map).reshape(n, h1c * w1c, c)
        feat0, feat1 = self.loftr_coarse(feat0, feat1)
        return feat0, feat1, (h0c, w0c), (h1c, w1c), f0_map, f1_map

    def _coarse_match(self, feat0, feat1, hw0_c, hw1_c):
        cm = self.cfg.coarse_matching
        # fused streaming Pallas matching on TPU (never materializes the
        # [L, S] confidence matrix — at 512^2 pairs that is 4096x4096 per
        # image pair); XLA path elsewhere / when explicitly disabled
        use_fused = cm.use_fused_kernel
        if use_fused is None:
            use_fused = jax.default_backend() == "tpu"
        if use_fused:
            from ..ops.pallas_matching import fused_select_topk_matches

            matches = fused_select_topk_matches(
                feat0,
                feat1,
                cm.temperature,
                hw1_c,
                cm.thr,
                cm.border_rm,
                cm.max_matches,
                border_two_sided=cm.border_two_sided,
                row_grid_hw=hw0_c,
                feat_norm=cm.feat_norm_method,
            )
            return None, matches
        conf = dual_softmax_confidence(
            feat0, feat1, cm.temperature, feat_norm=cm.feat_norm_method
        )
        matches = select_topk_matches(
            conf,
            hw1_c,
            cm.thr,
            cm.border_rm,
            cm.max_matches,
            border_two_sided=cm.border_two_sided,
            row_grid_hw=hw0_c,
        )
        return conf, matches

    def _fine_refine(self, f0_map, f1_map, centers0, centers1):
        """Fine windows around coarse centers on both fine maps -> sub-pixel offset.

        centers{0,1}: [N, K, 2] integer (row, col) on the fine grids.
        Returns normalized coords [-1,1] [N,K,2], std [N,K] refining image-1
        positions (image-0 keypoints stay at window centers, like LoFTR).
        """
        w_win = self.cfg.fine_window_size
        win0 = gather_windows(f0_map, centers0, w_win)  # [N, K, WW, C]
        win1 = gather_windows(f1_map, centers1, w_win)
        return self._fine_refine_windows(win0, win1)

    def _fine_refine_windows(self, win0, win1):
        """Fine transformer + correlation soft-argmax over gathered windows."""
        w_win = self.cfg.fine_window_size
        n, k, _, c_f = win0.shape
        d0 = win0.reshape(n * k, w_win * w_win, c_f)
        d1 = win1.reshape(n * k, w_win * w_win, c_f)
        d0, d1 = self.loftr_fine(d0, d1)
        center = d0[:, (w_win * w_win) // 2, :]  # [N*K, C]
        sim = jnp.einsum("mc,mrc->mr", center, d1) / (c_f**0.5)
        heat = jax.nn.softmax(sim, axis=-1)
        coords = spatial_expectation_2d(heat, w_win)
        std = heatmap_std(heat, coords, w_win)
        return coords.reshape(n, k, 2), std.reshape(n, k)

    # ------------------------------------------------------------------ #
    # public modes
    # ------------------------------------------------------------------ #
    def match_coarse(self, img0, img1, train: bool = False) -> Dict[str, Any]:
        """Coarse-only matching (reference coarse SfM pass: fine disabled)."""
        feat0, feat1, hw0_c, hw1_c, _, _ = self._coarse_features(img0, img1, train)
        conf, m = self._coarse_match(feat0, feat1, hw0_c, hw1_c)
        scale0 = 8.0
        mkpts0 = (
            jnp.stack([m.i_ids % hw0_c[1], m.i_ids // hw0_c[1]], -1).astype(jnp.float32)
            * scale0
        )
        mkpts1 = (
            jnp.stack([m.j_ids % hw1_c[1], m.j_ids // hw1_c[1]], -1).astype(jnp.float32)
            * scale0
        )
        return {
            "mkpts0_c": mkpts0,
            "mkpts1_c": mkpts1,
            "mconf": m.mconf,
            "match_mask": m.mask,
            "i_ids": m.i_ids,
            "j_ids": m.j_ids,
            "hw0_c": hw0_c,
            "hw1_c": hw1_c,
        }

    def match(self, img0, img1, train: bool = False) -> Dict[str, Any]:
        """Full coarse + fine matching."""
        feat0, feat1, hw0_c, hw1_c, f0_map, f1_map = self._coarse_features(
            img0, img1, train
        )
        conf, m = self._coarse_match(feat0, feat1, hw0_c, hw1_c)
        h_i = img0.shape[1]
        h_f = f0_map.shape[1]
        stride = h_f // hw0_c[0]
        scale_c = h_i / hw0_c[0]
        scale_f = h_i / h_f

        w = self.cfg.fine_window_size
        win0 = gather_windows_aligned(f0_map, m.i_ids, hw0_c, stride, w, train=train)
        win1 = gather_windows_aligned(f1_map, m.j_ids, hw1_c, stride, w, train=train)
        coords, std = self._fine_refine_windows(win0, win1)

        mkpts0 = (
            jnp.stack([m.i_ids % hw0_c[1], m.i_ids // hw0_c[1]], -1).astype(jnp.float32)
            * scale_c
        )
        mkpts1_c = (
            jnp.stack([m.j_ids % hw1_c[1], m.j_ids // hw1_c[1]], -1).astype(jnp.float32)
            * scale_c
        )
        w_win = self.cfg.fine_window_size
        mkpts1_f = mkpts1_c + coords * (w_win // 2) * scale_f
        return {
            "mkpts0_f": mkpts0,
            "mkpts1_f": mkpts1_f,
            "mkpts0_c": mkpts0,
            "mkpts1_c": mkpts1_c,
            "expec_f": jnp.concatenate([coords, std[..., None]], -1),
            "mconf": m.mconf,
            "match_mask": m.mask,
        }

    def refine(
        self,
        img0,
        img1,
        mkpts0_c: jnp.ndarray,
        mkpts1_c: jnp.ndarray,
        match_mask: jnp.ndarray,
        extract_features: bool = False,
        train: bool = False,
    ) -> Dict[str, Any]:
        """Fine-only refinement of provided coarse matches (pixel coords).

        Mirrors the reference 'coarse matches provided' branch
        (``loftr_for_sfm/loftr.py:80-124``): coarse transformer still runs (its
        outputs are needed for feature extraction), then fine windows centered
        at the provided matches are refined. mkpts1_f moves; mkpts0 stays.
        """
        feat0, feat1, hw0_c, hw1_c, f0_map, f1_map = self._coarse_features(
            img0, img1, train
        )
        h_i = img0.shape[1]
        h_f = f0_map.shape[1]
        scale_f = h_i / h_f
        scale_c = h_i / hw0_c[0]

        centers0 = jnp.stack(
            [
                jnp.round(mkpts0_c[..., 1] / scale_f).astype(jnp.int32),
                jnp.round(mkpts0_c[..., 0] / scale_f).astype(jnp.int32),
            ],
            -1,
        )
        centers1 = jnp.stack(
            [
                jnp.round(mkpts1_c[..., 1] / scale_f).astype(jnp.int32),
                jnp.round(mkpts1_c[..., 0] / scale_f).astype(jnp.int32),
            ],
            -1,
        )
        coords, std = self._fine_refine(f0_map, f1_map, centers0, centers1)
        w_win = self.cfg.fine_window_size
        mkpts1_f = mkpts1_c + coords * (w_win // 2) * scale_f
        out = {
            "mkpts0_f": mkpts0_c,
            "mkpts1_f": mkpts1_f,
            "expec_f": jnp.concatenate([coords, std[..., None]], -1),
            "match_mask": match_mask,
        }
        if extract_features:
            # bilinear-sample coarse transformer features + fine map features
            n, _, c = feat0.shape
            feat0_map = feat0.reshape(n, hw0_c[0], hw0_c[1], c)
            feat1_map = feat1.reshape(n, hw1_c[0], hw1_c[1], c)
            sample = jax.vmap(_bilinear_sample)
            out["feat_coarse_0"] = sample(feat0_map, mkpts0_c / scale_c)
            out["feat_coarse_1"] = sample(feat1_map, mkpts1_c / scale_c)
            out["feat_fine_0"] = sample(f0_map, mkpts0_c / scale_f)
            out["feat_fine_1"] = sample(f1_map, mkpts1_f / scale_f)
        return out

    def __call__(self, img0, img1, train: bool = False):
        return self.match(img0, img1, train=train)
