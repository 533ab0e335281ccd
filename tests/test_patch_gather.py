"""DMA patch gather vs the XLA gather references (interpret mode on CPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from onepose_plus_plus_tpu.ops.pallas_patch_gather import gather_patches_dma
from onepose_plus_plus_tpu.ops.window_gather import (
    gather_windows,
    gather_windows_aligned,
)


@pytest.mark.parametrize("window", [5, 9])
def test_matches_generic_gather(window):
    rng = np.random.default_rng(0)
    n, h, w, c = 2, 32, 32, 128
    k = 16
    feat = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    centers = jnp.asarray(rng.integers(0, h, (n, k, 2)), jnp.int32)
    want = gather_windows(feat, centers, window)
    got = gather_patches_dma(
        feat,
        centers[..., 0] - window // 2,
        centers[..., 1] - window // 2,
        window,
        block_k=8,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=0)


def test_matches_aligned_gather_with_invalid_slots():
    rng = np.random.default_rng(1)
    n, hc, wc, stride, c, window = 2, 8, 8, 4, 128, 5
    feat = jnp.asarray(
        rng.standard_normal((n, hc * stride, wc * stride, c)), jnp.float32
    )
    ids = rng.integers(0, hc * wc, (n, 24)).astype(np.int32)
    ids[0, :4] = -1  # padded slots -> zero windows
    ids[1, -3:] = hc * wc + 7
    ids = jnp.asarray(ids)
    want = gather_windows_aligned(feat, ids, (hc, wc), stride, window)
    half = window // 2
    ci, cj = ids // wc, ids % wc
    in_range = (ids >= 0) & (ids < hc * wc)
    big = jnp.int32(-(10 * window))
    r0 = jnp.where(in_range, ci * stride - half, big)
    c0 = jnp.where(in_range, cj * stride - half, big)
    got = gather_patches_dma(feat, r0, c0, window, block_k=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=0)


def test_borders_zero():
    """Patches hanging off every border read zeros outside the map."""
    n, h, w, c = 1, 16, 16, 128
    feat = jnp.ones((n, h, w, c), jnp.float32)
    r0 = jnp.asarray([[-2, h - 3, -2, 13]], jnp.int32)
    c0 = jnp.asarray([[-2, w - 3, 5, -1]], jnp.int32)
    got = np.asarray(gather_patches_dma(feat, r0, c0, 5, block_k=4))
    got = got.reshape(n, 4, 5, 5, c)
    # patch 0: rows/cols -2..2 -> only [2:,2:] inside
    assert (got[0, 0, :2] == 0).all() and (got[0, 0, :, :2] == 0).all()
    assert (got[0, 0, 2:, 2:] == 1).all()
    # patch 1: rows 13..17 -> last 2 rows out
    assert (got[0, 1, 3:] == 0).all() and (got[0, 1, :3, :3] == 1).all()
    # patch 3: row 13..17, col -1..3
    assert (got[0, 3, :, 0] == 0).all() and (got[0, 3, 3:, :] == 0).all()
    assert (got[0, 3, :3, 1:] == 1).all()


def test_bf16_and_nondivisible_k():
    rng = np.random.default_rng(2)
    n, h, w, c, k = 1, 24, 24, 256, 13
    feat = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.bfloat16)
    centers = jnp.asarray(rng.integers(2, h - 2, (n, k, 2)), jnp.int32)
    want = gather_windows(feat.astype(jnp.float32), centers, 3)
    got = gather_patches_dma(
        feat, centers[..., 0] - 1, centers[..., 1] - 1, 3, block_k=8
    )
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got.astype(jnp.float32)), np.asarray(want), rtol=0, atol=0
    )
