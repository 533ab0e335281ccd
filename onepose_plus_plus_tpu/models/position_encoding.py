"""Positional encodings: 2D sinusoidal PE (image grid) + 3D keypoint MLP encoder.

Port of reference ``src/models/OnePosePlus/utils/position_encoding.py``:

- ``sine_position_encoding`` reproduces ``PositionEncodingSine`` including the
  LoFTR "temp bug" frequency term (``-log(1e4) / d_model // 2`` — a floor
  division that collapses to -1.0). The released checkpoints were trained with
  the buggy variant, so both are supported via ``temp_bug_fix``.
- ``KeypointEncoder`` reproduces ``KeypointEncoding_linear``: MLP over xyz with
  the torch ``InstanceNorm1d``-on-[B,L,C] quirk, which in effect normalizes
  each keypoint's feature vector over the channel axis (no affine, eps 1e-5).
- ``normalize_3d_keypoints`` maps the point cloud to tight-box coordinates
  (reference ``utils/normalize.py:16-27``).
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import numpy as np
import jax.numpy as jnp
import flax.linen as nn


@functools.lru_cache(maxsize=8)
def _sine_pe_table(d_model: int, h: int, w: int, temp_bug_fix: bool) -> np.ndarray:
    """[h, w, d_model] table; positions are 1-indexed (cumsum-of-ones)."""
    pe = np.zeros((d_model, h, w), dtype=np.float32)
    y_pos = np.arange(1, h + 1, dtype=np.float32)[None, :, None] * np.ones((1, 1, w), np.float32)
    x_pos = np.arange(1, w + 1, dtype=np.float32)[None, None, :] * np.ones((1, h, 1), np.float32)
    if temp_bug_fix:
        exponent = -math.log(10000.0) / (d_model // 2)
    else:
        # faithful reproduction of the reference operator precedence:
        # (-log(1e4) / d_model) // 2  (floor division on a small negative float)
        exponent = (-math.log(10000.0) / d_model) // 2
    div_term = np.exp(np.arange(0, d_model // 2, 2, dtype=np.float32) * exponent)
    div_term = div_term[:, None, None]
    pe[0::4] = np.sin(x_pos * div_term)
    pe[1::4] = np.cos(x_pos * div_term)
    pe[2::4] = np.sin(y_pos * div_term)
    pe[3::4] = np.cos(y_pos * div_term)
    return np.transpose(pe, (1, 2, 0))  # [h, w, C]


def sine_position_encoding(
    x: jnp.ndarray, temp_bug_fix: bool = False
) -> jnp.ndarray:
    """Add 2D sine PE to an NHWC feature map."""
    n, h, w, c = x.shape
    pe = jnp.asarray(_sine_pe_table(c, h, w, temp_bug_fix), dtype=x.dtype)
    return x + pe[None]


def normalize_3d_keypoints(kpts: jnp.ndarray) -> jnp.ndarray:
    """Tight-box normalization of [N, L, 3] point clouds.

    Extents come from batch element 0 (reference quirk, ``normalize.py:20``);
    centers are per-sample means; scale = 0.6 * max extent.
    """
    extent = jnp.max(kpts[0], axis=0) - jnp.min(kpts[0], axis=0)  # [3]
    center = jnp.mean(kpts, axis=-2, keepdims=True)  # [N, 1, 3]
    scale = jnp.max(extent) * 0.6
    return (kpts - center) / scale


def _quirk_instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch InstanceNorm1d applied to [B, L, C]: normalizes over the last axis."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


class KeypointEncoder(nn.Module):
    """MLP positional encoding of normalized 3D keypoints, added to descriptors."""

    layers: Tuple[int, ...] = (32, 64, 128)
    feature_dim: int = 256
    norm_method: str = "instancenorm"

    @nn.compact
    def __call__(self, kpts: jnp.ndarray, descriptors: jnp.ndarray) -> jnp.ndarray:
        """kpts [N, L, 3] (normalized), descriptors [N, L, C] -> [N, L, C]."""
        x = kpts
        widths = list(self.layers) + [self.feature_dim]
        for i, width in enumerate(widths):
            x = nn.Dense(width, name=f"dense_{i}")(x)
            if i < len(widths) - 1:
                if self.norm_method == "instancenorm":
                    x = _quirk_instance_norm(x)
                elif self.norm_method == "layernorm":
                    x = nn.LayerNorm(epsilon=1e-5)(x)
                elif self.norm_method != "none":
                    raise ValueError(self.norm_method)
                x = nn.relu(x)
        return descriptors + x
