"""Cross-checks of TPU ops against torch reference semantics (torch is CPU-only here)."""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from onepose_plus_plus_tpu.ops.upsample import upsample2x_align_corners
from onepose_plus_plus_tpu.ops.window_gather import gather_windows
from onepose_plus_plus_tpu.ops.soft_argmax import spatial_expectation_2d, heatmap_std


def test_upsample_matches_torch_align_corners():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 6, 3).astype(np.float32)
    ours = np.asarray(upsample2x_align_corners(jnp.asarray(x)))
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ref = F.interpolate(tx, scale_factor=2.0, mode="bilinear", align_corners=True)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_gather_windows_matches_unfold():
    """gather_windows at coarse-cell centers == F.unfold(kernel=W, stride=s, pad=W//2)."""
    rng = np.random.RandomState(1)
    W, stride = 5, 4
    h_f, w_f, C = 16, 12, 7
    feat = rng.randn(1, h_f, w_f, C).astype(np.float32)
    h_c, w_c = h_f // stride, w_f // stride

    tfeat = torch.from_numpy(feat.transpose(0, 3, 1, 2))
    unfolded = F.unfold(tfeat, kernel_size=(W, W), stride=stride, padding=W // 2)
    # [1, C*W*W, h_c*w_c] -> [h_c*w_c, W*W, C]
    unfolded = unfolded.reshape(1, C, W * W, -1).permute(0, 3, 2, 1).numpy()[0]

    cells = np.arange(h_c * w_c)
    centers = np.stack([cells // w_c * stride, cells % w_c * stride], -1)[None]
    ours = np.asarray(
        gather_windows(jnp.asarray(feat), jnp.asarray(centers.astype(np.int32)), W)
    )[0]
    np.testing.assert_allclose(ours, unfolded, atol=1e-6)


def test_spatial_expectation_matches_kornia_convention():
    # peaked heatmap at a known cell -> expectation at that cell's normalized coord
    W = 5
    heat = np.zeros((1, W * W), np.float32)
    # cell (row=1, col=3): kornia grid x = linspace(-1,1,W)
    heat[0, 1 * W + 3] = 1.0
    coords = np.asarray(spatial_expectation_2d(jnp.asarray(heat), W))
    lin = np.linspace(-1, 1, W)
    np.testing.assert_allclose(coords[0], [lin[3], lin[1]], atol=1e-6)
    std = np.asarray(heatmap_std(jnp.asarray(heat), jnp.asarray(coords), W))
    np.testing.assert_allclose(std[0], 2e-5, atol=1e-5)  # ~sqrt(1e-10)*2
