"""Fixed-capacity window gathering from feature maps.

TPU-native replacement for the reference's ``F.unfold`` fine-preprocess
(``src/models/OnePosePlus/loftr_module/fine_preprocess.py:41-54``): instead of
materializing every WxW window of the fine feature map (h_f*w_f*W*W*C floats)
and indexing the matched ones, we gather only the K selected windows.

Two paths:

- :func:`gather_windows_aligned` — the hot path. Both matchers center every
  window on a coarse grid cell (``center = stride * cell``), so after a
  stride x stride space-to-depth (a free reshape plus one transpose) each
  window is a STATIC slice of an nb x nb block neighbourhood, and the
  neighbourhood rows are fetched with nb^2 one-hot matmuls on the MXU
  (selection by 0/1 matmul is exact: one non-zero term per output, f32
  accumulation). No per-window dynamic indexing remains, so XLA emits
  matmuls + fused static slices — ~12 ms for [48, 256, 256, 128] ->
  [48, 512, 25, 128] on v5e vs ~40 ms for the XLA gather.

- :func:`gather_windows` — generic integer centers (the SfM refine path,
  which rounds arbitrary pixel coordinates to the fine grid). Plain XLA
  gather with zero-padding semantics.

Out-of-map taps are zero in both, matching torch's zero-padding
(padding=W//2).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def gather_windows_aligned(
    feat: jnp.ndarray,
    cell_ids: jnp.ndarray,
    grid_hw: Tuple[int, int],
    stride: int,
    window: int,
    train: bool = False,
) -> jnp.ndarray:
    """Gather WxW windows centered at ``stride * cell`` (MXU formulation).

    Args:
        feat: [N, H, W, C] fine feature map with H = stride * h_c,
            W = stride * w_c.
        cell_ids: [N, K] flat coarse-cell ids (row-major over grid_hw).
            Out-of-range ids (e.g. padded match slots) yield all-zero windows.
        grid_hw: (h_c, w_c) coarse grid shape.
        stride: fine pixels per coarse cell (h_f // h_c).
        window: odd window size W.
        train: True routes the selection through the custom-VJP gather
            kernel (register one-hot both directions); non-TPU/f32 falls
            back to the differentiable XLA one-hot matmul.
    Returns:
        [N, K, W*W, C] windows; taps outside the map are zero.
    """
    n, h, w, c = feat.shape
    h_c, w_c = grid_hw
    if h != stride * h_c or w != stride * w_c:
        raise ValueError(f"feat {feat.shape} != stride {stride} * grid {grid_hw}")
    half = window // 2
    pad_lo = -(-half // stride)  # blocks before row/col 0
    off = pad_lo * stride - half  # static window start inside the neighbourhood
    nb = -(-(off + window) // stride)  # blocks spanned per axis
    pad_hi = nb - pad_lo  # blocks after the last cell's own block

    hp, wp = h_c + pad_lo + pad_hi, w_c + pad_lo + pad_hi
    # extra bottom block rows so hp*wp is a multiple of the gather kernel's
    # m-tile (tile_m = rows_per_tile * wp): padding the already-necessary fp
    # pad is free, while padding the 850 MB space-to-depth tensor inside the
    # kernel would be another full copy (~3 ms/step at the flagship shapes)
    rows_per_tile = 16 if 16 * wp <= 1536 else 8
    hp = -(-hp // rows_per_tile) * rows_per_tile
    fp = jnp.pad(
        feat,
        (
            (0, 0),
            (pad_lo * stride, hp * stride - pad_lo * stride - h),
            (pad_lo * stride, pad_hi * stride),
            (0, 0),
        ),
    )
    # space-to-depth: the (hp, stride) row split is a free row-major reshape,
    # only the transpose moves data
    s2d = (
        fp.reshape(n, hp, stride, wp, stride, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, hp * wp, stride * stride * c)
    )

    ci = cell_ids // w_c  # cell (row, col); garbage for out-of-range ids
    cj = cell_ids - ci * w_c
    in_range = (cell_ids >= 0) & (cell_ids < h_c * w_c)
    k = cell_ids.shape[1]
    dt = jnp.bfloat16 if s2d.dtype == jnp.bfloat16 else jnp.float32

    # cell (i, j)'s neighbourhood spans padded blocks (i + br, j + bc),
    # br/bc in [0, nb) — its own block sits at (i + pad_lo, j + pad_lo).
    # All nb^2 selections ride ONE matmul (stacked along the row dim) so the
    # space-to-depth tensor streams from HBM once, not nb^2 times.
    flats = []
    for br in range(nb):
        for bc in range(nb):
            flat = (ci + br) * wp + (cj + bc)
            flats.append(jnp.where(in_range, flat, -1))  # one_hot(-1) -> zero
    flat_all = jnp.stack(flats, axis=1).reshape(n, nb * nb * k)
    if jax.default_backend() == "tpu" and s2d.dtype == jnp.bfloat16:
        # fused kernel: the one-hot tiles are generated in registers instead
        # of materializing an [N, nb^2*K, hp*wp] factor in HBM; the train
        # path uses the custom-VJP wrapper whose backward is the register
        # one-hot scatter kernel (same HBM-traffic collapse both directions)
        from .pallas_gather import take_rows_mxu, take_rows_mxu_grad

        if train:
            blk_all = take_rows_mxu_grad(s2d, flat_all, rows_per_tile * wp)
        else:
            blk_all = take_rows_mxu(s2d, flat_all, tile_m=rows_per_tile * wp)
    else:
        onehot = jax.nn.one_hot(flat_all, hp * wp, dtype=dt)
        # HIGHEST so the f32 path stays a bit-exact copy on TPU (default
        # matmul precision would truncate f32 features to bf16); no-op for
        # the bf16 path.
        blk_all = jax.lax.dot_general(
            onehot,
            s2d.astype(dt),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    blk_all = blk_all.reshape(n, nb * nb, k, stride, stride, c)

    rows = []
    for br in range(nb):
        cols = []
        for bc in range(nb):
            blk = blk_all[:, br * nb + bc]
            # static column slice of this block
            lo = max(off - bc * stride, 0)
            hi = min(off + window - bc * stride, stride)
            if hi <= lo:
                continue
            cols.append(blk[:, :, :, lo:hi, :])
        row_strip = cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=3)
        lo = max(off - br * stride, 0)
        hi = min(off + window - br * stride, stride)
        if hi <= lo:
            continue
        rows.append(row_strip[:, :, lo:hi, :, :])
    win = rows[0] if len(rows) == 1 else jnp.concatenate(rows, axis=2)
    return win.reshape(n, k, window * window, c).astype(feat.dtype)


def gather_windows(
    feat: jnp.ndarray,
    centers_rc: jnp.ndarray,
    window: int,
    prefer_dma: bool | None = None,
) -> jnp.ndarray:
    """Gather WxW windows around arbitrary integer centers.

    On TPU this routes to the DMA patch-gather kernel (one async copy per
    window — ``ops/pallas_patch_gather.py``); elsewhere, and when
    ``prefer_dma=False`` (e.g. a caller that needs gradients — the DMA
    kernel has no VJP), a plain XLA gather.

    Args:
        feat: [N, H, W, C] feature map.
        centers_rc: [N, K, 2] integer (row, col) window centers.
        window: odd window size W.
    Returns:
        [N, K, W*W, C] windows; taps outside the map are zero.
    """
    if prefer_dma is None:
        prefer_dma = jax.default_backend() == "tpu"
    if prefer_dma:
        from .pallas_patch_gather import gather_patches_dma

        half = window // 2
        return gather_patches_dma(
            feat, centers_rc[..., 0] - half, centers_rc[..., 1] - half, window
        )
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
