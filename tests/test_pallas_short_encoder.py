"""Fused short-sequence encoder kernel vs the XLA path (interpret mode).

The batched-short-sequence kernel (ops/pallas_short_encoder.py) serves the
fine stage: ~24k independent 25-token windows per step. It must match
LoFTREncoderLayer — itself bit-level-tested against the reference torch
module in test_ops_vs_torch.py — within bf16-matmul tolerance at every
(L, S) combination the fine transformer produces: (25,25) self, (1,25) and
(25,1) cross, (1,1) self on the descriptor stream.

Compiled-on-TPU parity at production shapes lives in test_tpu_compiled.py
(interpret-mode parity is NOT TPU parity; see ops/pallas_matching.py).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from onepose_plus_plus_tpu.models.transformer import LoFTREncoderLayer
from onepose_plus_plus_tpu.ops.pallas_short_encoder import (
    fused_short_encoder_layer,
)


def _run_fused(p, x, src, nhead, block_rows=256):
    return fused_short_encoder_layer(
        x, src,
        p["q_proj"]["kernel"], p["k_proj"]["kernel"], p["v_proj"]["kernel"],
        p["merge"]["kernel"], p["norm1"]["scale"], p["norm1"]["bias"],
        p["mlp_0"]["kernel"], p["mlp_1"]["kernel"],
        p["norm2"]["scale"], p["norm2"]["bias"],
        nhead=nhead, interpret=True, block_rows=block_rows,
    )


@pytest.mark.parametrize(
    "m,l,s,c,nhead",
    [
        (24, 25, 25, 128, 8),  # fine self(d1, d1)
        (24, 1, 25, 128, 8),   # fine cross(d0 <- d1)
        (24, 25, 1, 128, 8),   # fine cross(d1 <- d0)
        (24, 1, 1, 128, 8),    # fine self(d0, d0)
        (10, 5, 7, 256, 4),    # odd lengths, M not a block multiple
    ],
)
def test_short_fused_matches_xla(m, l, s, c, nhead):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, l, c)).astype(np.float32))
    src = jnp.asarray(rng.standard_normal((m, s, c)).astype(np.float32))
    layer = LoFTREncoderLayer(c, nhead, "linear", dtype=jnp.bfloat16)
    variables = layer.init(jax.random.PRNGKey(0), x, src)
    ref = layer.apply(variables, x, src)
    out = _run_fused(variables["params"], x, src, nhead)
    assert out.shape == (m, l, c) and out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-2)
    assert float(jnp.abs(out - ref).mean()) < 5e-3


def test_short_fused_multiblock_grid():
    """M spanning many grid blocks, values differing per sequence, so any
    block-index-map error shows up as cross-sequence contamination."""
    rng = np.random.default_rng(1)
    m, l, s, c = 70, 25, 25, 128
    x = jnp.asarray(
        rng.standard_normal((m, l, c)).astype(np.float32)
        + np.arange(m, dtype=np.float32)[:, None, None] * 0.1
    )
    src = jnp.asarray(rng.standard_normal((m, s, c)).astype(np.float32))
    layer = LoFTREncoderLayer(c, 8, "linear", dtype=jnp.bfloat16)
    variables = layer.init(jax.random.PRNGKey(0), x, src)
    ref = layer.apply(variables, x, src)
    out = _run_fused(variables["params"], x, src, 8, block_rows=256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-2)
    # per-sequence: results must depend only on that sequence's tokens
    out_single = _run_fused(
        variables["params"], x[3:4], src[3:4], 8, block_rows=256
    )
    np.testing.assert_allclose(
        np.asarray(out[3:4]), np.asarray(out_single), atol=1e-3
    )


def test_short_fused_rejects_vmem_blowout():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((8, 128, 128)).astype(np.float32))
    with pytest.raises(ValueError, match="VMEM"):
        _run_fused(
            {
                k: {"kernel": jnp.zeros((128, 128))}
                for k in ("q_proj", "k_proj", "v_proj", "merge")
            }
            | {
                "norm1": {"scale": jnp.ones(128), "bias": jnp.zeros(128)},
                "norm2": {"scale": jnp.ones(128), "bias": jnp.zeros(128)},
                "mlp_0": {"kernel": jnp.zeros((256, 256))},
                "mlp_1": {"kernel": jnp.zeros((256, 128))},
            },
            x, x, 8, block_rows=1024,
        )
