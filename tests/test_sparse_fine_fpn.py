"""Sparse fine FPN (per-match halo patches) vs the dense fine branch.

The sparse path must reproduce ``gather_windows_aligned(dense_fine_map, ...)``
exactly: same convs on gathered patches, with the dense path's map-border
zeros re-imposed between the valid convs.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from onepose_plus_plus_tpu.config import ResNetFPNConfig
from onepose_plus_plus_tpu.models.backbone import ResNetFPN_8_2
from onepose_plus_plus_tpu.ops.window_gather import gather_windows_aligned


def _run(window: int, img_hw: int = 64, seed: int = 0):
    rng = np.random.default_rng(seed)
    cfg = ResNetFPNConfig(initial_dim=16, block_dims=(16, 24, 32))
    bb = ResNetFPN_8_2(cfg)
    img = jnp.asarray(rng.random((2, img_hw, img_hw, 1), np.float32))
    v = bb.init(jax.random.PRNGKey(0), img)

    feat_c, feat_f = bb.apply(v, img)
    h_c, w_c = feat_c.shape[1:3]
    stride = feat_f.shape[1] // h_c

    ids = rng.integers(0, h_c * w_c, (2, 12)).astype(np.int32)
    # border cells (every corner) + invalid slots
    ids[0, :4] = [0, w_c - 1, (h_c - 1) * w_c, h_c * w_c - 1]
    ids[1, -2:] = [-1, h_c * w_c + 3]
    ids = jnp.asarray(ids)

    want = gather_windows_aligned(feat_f, ids, (h_c, w_c), stride, window)

    feat_c2, ctx = bb.apply(v, img, method="coarse_and_ctx")
    got = bb.apply(
        v, ctx, ids, (h_c, w_c), stride, window, method="fine_windows"
    )
    np.testing.assert_allclose(np.asarray(feat_c2), np.asarray(feat_c))
    return np.asarray(got), np.asarray(want)


@pytest.mark.slow
@pytest.mark.parametrize("window", [5, 7])
def test_sparse_equals_dense(window):
    got, want = _run(window)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


@pytest.mark.slow
def test_model_forward_sparse_equals_dense():
    """Full OnePosePlus forward: sparse_fpn=True reproduces the dense path."""
    import dataclasses as dc

    from onepose_plus_plus_tpu.config import (
        CoarseMatchingConfig,
        OnePosePlusConfig,
    )
    from onepose_plus_plus_tpu.models.onepose_plus import OnePosePlusModel

    rng = np.random.default_rng(7)
    cfg = OnePosePlusConfig(
        coarse_matching=CoarseMatchingConfig(thr=0.0, max_matches=32)
    )
    batch = {
        "query_image": jnp.asarray(rng.random((1, 64, 64, 1), np.float32)),
        "keypoints3d": jnp.asarray(
            rng.standard_normal((1, 96, 3)).astype(np.float32) * 0.1
        ),
        "descriptors3d": jnp.asarray(
            rng.standard_normal((1, 96, 128)).astype(np.float32)
        ),
        "descriptors3d_coarse": jnp.asarray(
            rng.standard_normal((1, 96, 256)).astype(np.float32)
        ),
    }
    dense = OnePosePlusModel(dc.replace(cfg, fine=dc.replace(cfg.fine, sparse_fpn=False)))
    v = dense.init(jax.random.PRNGKey(0), batch, train=False)
    out_d = dense.apply(v, batch, train=False)
    sparse = OnePosePlusModel(dc.replace(cfg, fine=dc.replace(cfg.fine, sparse_fpn=True)))
    out_s = sparse.apply(v, batch, train=False)
    np.testing.assert_array_equal(
        np.asarray(out_s["i_ids"]), np.asarray(out_d["i_ids"])
    )
    np.testing.assert_allclose(
        np.asarray(out_s["mkpts_query_f"]),
        np.asarray(out_d["mkpts_query_f"]),
        atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out_s["expec_f"]), np.asarray(out_d["expec_f"]), atol=1e-3
    )


@pytest.mark.slow
def test_sparse_equals_dense_bf16():
    rng = np.random.default_rng(3)
    cfg = ResNetFPNConfig(initial_dim=16, block_dims=(16, 24, 32))
    bb = ResNetFPN_8_2(cfg, dtype=jnp.bfloat16)
    img = jnp.asarray(rng.random((1, 64, 64, 1), np.float32))
    v = bb.init(jax.random.PRNGKey(1), img)
    feat_c, feat_f = bb.apply(v, img)
    h_c, w_c = feat_c.shape[1:3]
    stride = feat_f.shape[1] // h_c
    ids = jnp.asarray(rng.integers(0, h_c * w_c, (1, 8)).astype(np.int32))
    want = np.asarray(
        gather_windows_aligned(feat_f, ids, (h_c, w_c), stride, 5)
    ).astype(np.float32)
    _, ctx = bb.apply(v, img, method="coarse_and_ctx")
    got = np.asarray(
        bb.apply(v, ctx, ids, (h_c, w_c), stride, 5, method="fine_windows")
    ).astype(np.float32)
    scale = max(np.abs(want).max(), 1e-6)
    assert np.abs(got - want).max() < 0.05 * scale
