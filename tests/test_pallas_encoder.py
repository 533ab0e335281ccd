"""Fused Pallas encoder layer vs the XLA reference path (interpret mode).

The fused kernels (ops/pallas_encoder.py) must match LoFTREncoderLayer —
which is itself bit-level-tested against the reference torch module in
test_ops_vs_torch.py — within bf16-matmul tolerance, including masks,
ragged (non-tile-multiple) sequence lengths, and the d_model=128 fine
configuration.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from onepose_plus_plus_tpu.models.transformer import (
    LoFTREncoderLayer,
    LocalFeatureTransformer,
)
from onepose_plus_plus_tpu.ops.pallas_encoder import fused_encoder_layer
from onepose_plus_plus_tpu.config import TransformerConfig


def _params(layer, x, src, key=0):
    return layer.init(jax.random.PRNGKey(key), x, src)["params"]


def _run_fused(p, x, src, nhead, xm=None, sm=None, tile=128):
    return fused_encoder_layer(
        x, src,
        p["q_proj"]["kernel"], p["k_proj"]["kernel"], p["v_proj"]["kernel"],
        p["merge"]["kernel"], p["norm1"]["scale"], p["norm1"]["bias"],
        p["mlp_0"]["kernel"], p["mlp_1"]["kernel"],
        p["norm2"]["scale"], p["norm2"]["bias"],
        x_mask=xm, source_mask=sm, nhead=nhead,
        interpret=True, tile_l=tile, tile_s=tile,
    )


@pytest.mark.parametrize(
    "n,l,s,c,nhead",
    [
        (2, 300, 200, 256, 8),  # ragged, coarse dims
        (1, 128, 128, 128, 8),  # fine dims, exact tiles
        (2, 70, 300, 256, 4),   # L smaller than a tile, 4 heads
    ],
)
@pytest.mark.slow
def test_fused_matches_xla(n, l, s, c, nhead):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, l, c)).astype(np.float32))
    src = jnp.asarray(rng.standard_normal((n, s, c)).astype(np.float32))
    layer = LoFTREncoderLayer(c, nhead, "linear", dtype=jnp.bfloat16)
    variables = {"params": _params(layer, x, src)}
    ref = layer.apply(variables, x, src)
    out = _run_fused(variables["params"], x, src, nhead)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-2)
    # tolerance sanity: outputs are O(1) post-LayerNorm
    assert float(jnp.abs(out - ref).mean()) < 5e-3


def test_fused_masks_match_xla():
    rng = np.random.default_rng(1)
    n, l, s, c, h = 2, 260, 140, 256, 8
    x = jnp.asarray(rng.standard_normal((n, l, c)).astype(np.float32))
    src = jnp.asarray(rng.standard_normal((n, s, c)).astype(np.float32))
    xm = jnp.asarray((rng.random((n, l)) > 0.3).astype(np.float32))
    sm = jnp.asarray((rng.random((n, s)) > 0.3).astype(np.float32))
    layer = LoFTREncoderLayer(c, h, "linear", dtype=jnp.bfloat16)
    variables = {"params": layer.init(jax.random.PRNGKey(0), x, src, xm, sm)["params"]}
    ref = layer.apply(variables, x, src, xm, sm)
    out = _run_fused(variables["params"], x, src, h, xm=xm, sm=sm)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-2)


def test_fused_flag_reuses_same_param_tree():
    """fused=True must create the identical parameter structure (checkpoints
    trained on the XLA path load into the fused path unchanged)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 64, 256)).astype(np.float32))
    layer = LoFTREncoderLayer(256, 8, "linear", dtype=jnp.bfloat16)
    p_xla = layer.init(jax.random.PRNGKey(0), x, x, fused=False)["params"]
    p_fused = layer.init(jax.random.PRNGKey(0), x, x, fused=True)["params"]
    tree_x = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), p_xla)
    tree_f = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), p_fused)
    assert tree_x == tree_f


def test_transformer_auto_stays_xla_on_cpu():
    """On the CPU backend the auto rule keeps the XLA path (no TPU kernels)."""
    cfg = TransformerConfig(d_model=128, nhead=8, layer_iter_n=1)
    rng = np.random.default_rng(3)
    f0 = jnp.asarray(rng.standard_normal((2, 300, 128)).astype(np.float32))
    f1 = jnp.asarray(rng.standard_normal((2, 280, 128)).astype(np.float32))
    model = LocalFeatureTransformer(cfg)
    variables = model.init(jax.random.PRNGKey(0), f0, f1)
    out0, out1 = model.apply(variables, f0, f1)
    assert out0.shape == f0.shape and out1.shape == f1.shape
    assert jnp.all(jnp.isfinite(out0)) and jnp.all(jnp.isfinite(out1))


def test_len1_source_shortcut_exact():
    """The S=1 algebraic shortcut must match the general linear-attention
    path. Trick: duplicating the single source token leaves linear attention
    mathematically unchanged (KV and the normalizer both double), but routes
    through the general path."""
    rng = np.random.default_rng(4)
    n, l, c = 3, 25, 128
    x = jnp.asarray(rng.standard_normal((n, l, c)).astype(np.float32))
    src = jnp.asarray(rng.standard_normal((n, 1, c)).astype(np.float32))
    layer = LoFTREncoderLayer(c, 8, "linear", dtype=jnp.float32)
    variables = layer.init(jax.random.PRNGKey(0), x, src)
    out_short = layer.apply(variables, x, src)
    out_general = layer.apply(variables, x, jnp.concatenate([src, src], axis=1))
    np.testing.assert_allclose(
        np.asarray(out_short), np.asarray(out_general), atol=1e-4
    )
