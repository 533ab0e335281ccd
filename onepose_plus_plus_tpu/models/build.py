"""Model construction from YAML config dicts + jitted function surfaces.

Bridges the config system (reference ``configs/experiment/*.yaml`` model
blocks, e.g. ``train.yaml:44-127``) to the typed dataclass configs, and wraps
the Flax models into the jitted batched callables the SfM/inference drivers
consume (``coarse_match_fn`` / ``refine_fn`` / ``extract_fn``).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import (
    CoarseMatchingConfig,
    FineConfig,
    KeypointEncodingConfig,
    LoFTRConfig,
    OnePosePlusConfig,
    ResNetFPNConfig,
    TransformerConfig,
)
from .loftr import LoFTRMatcher
from .onepose_plus import OnePosePlusModel


def onepose_config_from_dict(d: Optional[Dict[str, Any]] = None) -> OnePosePlusConfig:
    """Build the 2D-3D matcher config from a (partial) YAML dict using the
    reference's key names (loftr_backbone / loftr_coarse / loftr_match_coarse
    / loftr_fine, ``train.yaml:44-127``)."""
    d = d or {}
    bb = d.get("loftr_backbone", {})
    co = d.get("loftr_coarse", {})
    cm = d.get("match_coarse", d.get("loftr_match_coarse", {}))
    fi = d.get("loftr_fine", {})
    kp = d.get("keypoints_encoding", {})
    resolution = tuple(bb.get("resolution", (8, 2)))
    return OnePosePlusConfig(
        compute_dtype=d.get("compute_dtype", "float32"),
        backbone=ResNetFPNConfig(
            initial_dim=bb.get("initial_dim", 128),
            block_dims=tuple(bb.get("block_dims", (128, 196, 256))),
            quant_int8=bb.get("quant_int8", False),
            stem_s2d=bb.get("stem_s2d", True),
        ),
        resolution=resolution,
        pe_temp_bug_fix=co.get("temp_bug_fix", False),
        keypoints_encoding=KeypointEncodingConfig(
            enable=kp.get("enable", True),
            descriptor_dim=kp.get("descriptor_dim", 256),
            layers=tuple(kp.get("keypoints_encoder", (32, 64, 128))),
            norm_method=kp.get("norm_method", "instancenorm"),
        ),
        coarse=TransformerConfig(
            d_model=co.get("d_model", 256),
            nhead=co.get("nhead", 8),
            layer_names=tuple(co.get("layer_names", ("self", "cross"))),
            layer_iter_n=co.get("layer_iter_n", 3),
            attention=co.get("attention", "linear"),
        ),
        coarse_matching=CoarseMatchingConfig(
            thr=cm.get("thr", 0.1),
            border_rm=cm.get("border_rm", 2),
            temperature=cm.get("dsmax_temperature", 0.08),
            max_matches=cm.get("max_matches", 512),
            train_max_matches=cm.get("train_max_matches", 1228),
            train_pad_num_gt_min=cm.get("train_pad_num_gt_min", 200),
        ),
        fine=FineConfig(
            enable=fi.get("enable", True),
            window_size=fi.get("window_size", 5),
            d_model=fi.get("d_model", 128),
            sparse_fpn=fi.get("sparse_fpn", None),
            transformer=TransformerConfig(
                d_model=fi.get("d_model", 128),
                nhead=fi.get("nhead", 8),
                layer_names=tuple(fi.get("layer_names", ("self", "cross"))),
                layer_iter_n=fi.get("layer_iter_n", 1),
                attention=fi.get("attention", "linear"),
            ),
        ),
    )


def loftr_config_from_dict(d: Optional[Dict[str, Any]] = None) -> LoFTRConfig:
    """Image-pair LoFTR config (reference loftr_for_onepose_plus_cfg.py)."""
    d = d or {}
    cm = d.get("match_coarse", {})
    return LoFTRConfig(
        compute_dtype=d.get("compute_dtype", "float32"),
        backbone=ResNetFPNConfig(
            quant_int8=d.get("backbone", {}).get("quant_int8", False),
            stem_s2d=d.get("backbone", {}).get("stem_s2d", True),
        ),
        coarse=TransformerConfig(
            d_model=d.get("d_model", 256),
            nhead=d.get("nhead", 8),
            layer_iter_n=d.get("layer_iter_n", 4),
        ),
        coarse_matching=CoarseMatchingConfig(
            thr=cm.get("thr", 0.2),
            temperature=cm.get("dsmax_temperature", 0.1),
            border_rm=cm.get("border_rm", 2),
            border_two_sided=True,
            max_matches=cm.get("max_matches", 1024),
        ),
        fine_window_size=d.get("fine_window_size", 9),
    )


def build_onepose_model(
    cfg_dict: Optional[Dict[str, Any]] = None,
) -> OnePosePlusModel:
    return OnePosePlusModel(onepose_config_from_dict(cfg_dict))


def build_loftr_matcher(
    cfg_dict: Optional[Dict[str, Any]] = None,
) -> LoFTRMatcher:
    return LoFTRMatcher(loftr_config_from_dict(cfg_dict))


# ----------------------- jitted SfM function surfaces -----------------------


def make_loftr_fns(
    model: LoFTRMatcher, variables
) -> Tuple[Callable, Callable, Callable]:
    """(coarse_match_fn, refine_fn, extract_fn) for the SfM runner.

    All three are jitted batched surfaces:
      coarse_match_fn(img0, img1) -> match_coarse dict
      refine_fn(img0, img1, mkpts0, mkpts1, mask) -> refine dict (+features)
      extract_fn(img, kpts, mask) -> {"feat_fine", "feat_coarse"} at kpts
    """

    @jax.jit
    def coarse_match_fn(img0, img1):
        return model.apply(variables, img0, img1, method="match_coarse")

    @jax.jit
    def refine_fn(img0, img1, mkpts0, mkpts1, mask):
        return model.apply(
            variables,
            img0,
            img1,
            mkpts0,
            mkpts1,
            mask,
            extract_features=True,
            method="refine",
        )

    @jax.jit
    def extract_fn(img, kpts, mask):
        # self-pair refine call reuses the feature-sampling path
        out = model.apply(
            variables,
            img,
            img,
            kpts,
            kpts,
            mask,
            extract_features=True,
            method="refine",
        )
        return {
            "feat_fine": out["feat_fine_0"],
            "feat_coarse": out["feat_coarse_0"],
        }

    return coarse_match_fn, refine_fn, extract_fn
