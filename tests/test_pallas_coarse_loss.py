"""Fused dual-softmax focal loss vs the XLA reference — value + gradients.

The kernel computes similarity on bf16 features (MXU); the XLA reference here
pre-rounds the features through bf16 the same way, so the comparison isolates
kernel math from dtype rounding. Interpret mode (CPU); the compiled-on-TPU
counterpart lives in test_tpu_compiled.py.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from onepose_plus_plus_tpu.ops.matching import dual_softmax_confidence
from onepose_plus_plus_tpu.ops.pallas_coarse_loss import fused_coarse_focal_loss
from onepose_plus_plus_tpu.train.losses import LossConfig, coarse_focal_loss


def _inputs(b, p, l, c, seed=0, frac_pos=0.3):
    rng = np.random.default_rng(seed)
    feat0 = rng.standard_normal((b, p, c)).astype(np.float32)
    feat1 = rng.standard_normal((b, l, c)).astype(np.float32)
    gt = np.where(
        rng.random((b, p)) < frac_pos, rng.integers(0, l, (b, p)), -1
    ).astype(np.int32)
    return jnp.asarray(feat0), jnp.asarray(feat1), jnp.asarray(gt)


def _bf16_round(f, c):
    scale = 1.0 / (c**0.5)
    return (f * scale).astype(jnp.bfloat16).astype(jnp.float32)


def _xla_loss(feat0, feat1, gt, temperature, cfg):
    """Reference path on the SAME bf16-rounded features the kernel sees."""
    c = feat0.shape[-1]
    conf = dual_softmax_confidence(
        _bf16_round(feat0, c), _bf16_round(feat1, c), temperature,
        feat_norm="none",
    )
    return coarse_focal_loss(conf, gt, cfg), jnp.max(conf)


@pytest.mark.parametrize(
    "b,p,l,tiles",
    [
        (2, 96, 64, (128, 128)),  # single tile, unaligned shapes
        (1, 300, 160, (128, 128)),  # multi-tile rows AND cols + padding
    ],
)
def test_fused_loss_matches_xla(b, p, l, tiles):
    cfg = LossConfig()
    t = 0.08
    feat0, feat1, gt = _inputs(b, p, l, 32)
    ref, ref_mx = _xla_loss(feat0, feat1, gt, t, cfg)
    got, got_mx = fused_coarse_focal_loss(
        feat0, feat1, gt, t, cfg.focal_alpha, cfg.focal_gamma,
        cfg.pos_weight, cfg.neg_weight, tiles=tiles, interpret=True,
    )
    np.testing.assert_allclose(float(got), float(ref), rtol=2e-4)
    np.testing.assert_allclose(float(got_mx), float(ref_mx), rtol=2e-4)


def test_fused_loss_grads_match_xla():
    cfg = LossConfig()
    t = 0.08
    feat0, feat1, gt = _inputs(1, 300, 160, 32, seed=3)

    def ref_fn(f0, f1):
        return _xla_loss(f0, f1, gt, t, cfg)[0]

    def fused_fn(f0, f1):
        return fused_coarse_focal_loss(
            f0, f1, gt, t, cfg.focal_alpha, cfg.focal_gamma,
            cfg.pos_weight, cfg.neg_weight, tiles=(128, 128), interpret=True,
        )[0]

    g_ref = jax.grad(ref_fn, argnums=(0, 1))(feat0, feat1)
    g_fused = jax.grad(fused_fn, argnums=(0, 1))(feat0, feat1)
    for gr, gf in zip(g_ref, g_fused):
        gr, gf = np.asarray(gr), np.asarray(gf)
        scale = np.abs(gr).max()
        assert scale > 0
        # fused backward contracts dsim in bf16 (the XLA backward on the
        # rounded features stays f32) — compare direction + bounded error
        assert np.abs(gf - gr).max() < 2e-2 * scale
        cos = (gr * gf).sum() / (
            np.linalg.norm(gr) * np.linalg.norm(gf) + 1e-12
        )
        assert cos > 0.999


def test_fused_loss_gamma_non_integer():
    cfg = LossConfig(focal_gamma=2.5)
    t = 0.1
    feat0, feat1, gt = _inputs(1, 96, 64, 32, seed=5)
    ref, _ = _xla_loss(feat0, feat1, gt, t, cfg)
    got, _ = fused_coarse_focal_loss(
        feat0, feat1, gt, t, cfg.focal_alpha, cfg.focal_gamma,
        cfg.pos_weight, cfg.neg_weight, tiles=(128, 128), interpret=True,
    )
    np.testing.assert_allclose(float(got), float(ref), rtol=2e-4)


def test_fused_loss_no_positives():
    """gt all -1 (every row negative) must not divide by zero."""
    cfg = LossConfig()
    feat0, feat1, gt = _inputs(1, 96, 64, 32, seed=7, frac_pos=0.0)
    assert int((gt >= 0).sum()) == 0
    ref, _ = _xla_loss(feat0, feat1, gt, 0.08, cfg)
    got, _ = fused_coarse_focal_loss(
        feat0, feat1, gt, 0.08, tiles=(128, 128), interpret=True
    )
    np.testing.assert_allclose(float(got), float(ref), rtol=2e-4)
    assert np.isfinite(float(got))
