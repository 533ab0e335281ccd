"""Bilinear 2x upsampling with align_corners=True semantics.

The reference FPN uses ``F.interpolate(..., mode='bilinear', align_corners=True)``
(``src/models/OnePosePlus/backbone/resnet.py:151,155``). ``jax.image.resize``
implements half-pixel (align_corners=False) sampling only, so for weight-parity
we express align-corners interpolation as two small dense matmuls (one per
spatial axis) — static interpolation matrices contract on the MXU and fuse
with the surrounding convs.
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=64)
def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Dense [n_out, n_in] linear interpolation matrix, align_corners=True."""
    if n_in == 1:
        return np.ones((n_out, 1), dtype=np.float32)
    src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    w = (src - lo).astype(np.float32)
    A = np.zeros((n_out, n_in), dtype=np.float32)
    A[np.arange(n_out), lo] += 1.0 - w
    A[np.arange(n_out), hi] += w
    return A


def upsample2x_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """Upsample [N, H, W, C] -> [N, 2H, 2W, C] (bilinear, align_corners=True).

    Axis order matters on TPU: the width contraction needs a relayout (w is
    not the minor dim), so it runs FIRST at the low resolution where the
    relayout touches 4x less data; the height contraction then maps to a
    clean batched matmul over [h, (2w*c)] with no layout change. Doing rows
    first cost ~10 ms of pure layout copies per FPN level at
    [48, 256, 256, 196] on v5e.
    """
    n, h, w, c = x.shape
    Ah = jnp.asarray(_interp_matrix(h, 2 * h), dtype=x.dtype)
    Aw = jnp.asarray(_interp_matrix(w, 2 * w), dtype=x.dtype)
    x = jnp.einsum("Ww,nhwc->nhWc", Aw, x)
    x = jnp.einsum("Hh,nhq->nHq", Ah, x.reshape(n, h, 2 * w * c))
    return x.reshape(n, 2 * h, 2 * w, c)
