"""Fixed-capacity window gathering from feature maps.

TPU-native replacement for the reference's ``F.unfold`` fine-preprocess
(``src/models/OnePosePlus/loftr_module/fine_preprocess.py:41-54``): instead of
materializing every WxW window of the fine feature map (h_f*w_f*W*W*C floats)
and indexing the matched ones, we gather only the K selected windows with a
static-shape XLA gather. Out-of-bounds taps are zeroed, matching torch's
zero-padding (padding=W//2).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_windows(feat: jnp.ndarray, centers_rc: jnp.ndarray, window: int) -> jnp.ndarray:
    """Gather WxW windows around integer centers.

    Args:
        feat: [N, H, W, C] feature map.
        centers_rc: [N, K, 2] integer (row, col) window centers.
        window: odd window size W.
    Returns:
        [N, K, W*W, C] windows; taps outside the map are zero.
    """
    n, h, w, c = feat.shape
    offs = jnp.arange(window) - window // 2  # [W]
    rows = centers_rc[..., 0:1] + offs[None, None, :]  # [N, K, W]
    cols = centers_rc[..., 1:2] + offs[None, None, :]  # [N, K, W]
    valid = (
        ((rows >= 0) & (rows < h))[:, :, :, None]
        & ((cols >= 0) & (cols < w))[:, :, None, :]
    )  # [N, K, W, W]
    r = jnp.clip(rows, 0, h - 1)
    col = jnp.clip(cols, 0, w - 1)

    def per_sample(f, rr, cc):
        # f: [H, W, C]; rr, cc: [K, W]
        return f[rr[:, :, None], cc[:, None, :]]  # [K, W, W, C]

    out = jax.vmap(per_sample)(feat, r, col)  # [N, K, W, W, C]
    out = out * valid[..., None].astype(out.dtype)
    return out.reshape(n, centers_rc.shape[1], window * window, c)
