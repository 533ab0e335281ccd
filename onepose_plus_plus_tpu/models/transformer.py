"""LoFTR-style local feature transformer (Flax).

Re-design of reference ``src/models/OnePosePlus/loftr_module/transformer.py``:
pre-projection QKV, linear (elu+1) attention, merge, concat-MLP FFN with two
LayerNorms, residual add. Layer sequence alternates 'self'/'cross' blocks; in
each step BOTH streams are updated (query<->source roles swap), matching
``LocalFeatureTransformer.forward`` (:133-171).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..config import TransformerConfig
from ..ops.attention import linear_attention, full_attention


class LoFTREncoderLayer(nn.Module):
    d_model: int
    nhead: int
    attention: str = "linear"
    dtype: object = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        source: jnp.ndarray,
        x_mask: Optional[jnp.ndarray] = None,
        source_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """x [N, L, C] attends to source [N, S, C]."""
        n, l, c = x.shape
        dim = self.d_model // self.nhead
        dt = self.dtype

        q = nn.Dense(self.d_model, use_bias=False, name="q_proj", dtype=dt)(x)
        k = nn.Dense(self.d_model, use_bias=False, name="k_proj", dtype=dt)(source)
        v = nn.Dense(self.d_model, use_bias=False, name="v_proj", dtype=dt)(source)
        q = q.reshape(n, l, self.nhead, dim)
        k = k.reshape(n, source.shape[1], self.nhead, dim)
        v = v.reshape(n, source.shape[1], self.nhead, dim)

        attn = linear_attention if self.attention == "linear" else full_attention
        message = attn(q, k, v, q_mask=x_mask, kv_mask=source_mask)
        message = nn.Dense(self.d_model, use_bias=False, name="merge", dtype=dt)(
            message.reshape(n, l, self.d_model).astype(dt)
        )
        # LayerNorms stay f32 for numerical stability
        # torch LayerNorm default eps (1e-5) for checkpoint fidelity
        message = nn.LayerNorm(name="norm1", epsilon=1e-5, dtype=jnp.float32)(message)

        message = nn.Dense(2 * self.d_model, use_bias=False, name="mlp_0", dtype=dt)(
            jnp.concatenate([x.astype(jnp.float32), message], axis=-1)
        )
        message = nn.relu(message)
        message = nn.Dense(self.d_model, use_bias=False, name="mlp_1", dtype=dt)(message)
        message = nn.LayerNorm(name="norm2", epsilon=1e-5, dtype=jnp.float32)(message)

        return x + message


class LocalFeatureTransformer(nn.Module):
    """Alternating self/cross attention over two feature streams."""

    cfg: TransformerConfig

    @nn.compact
    def __call__(
        self,
        feat0: jnp.ndarray,
        feat1: jnp.ndarray,
        mask0: Optional[jnp.ndarray] = None,
        mask1: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """feat0 [N, L, C] (e.g. 3D descriptors), feat1 [N, S, C] (query grid).

        Mask convention follows the reference call sites: only the query
        stream (feat1) carries a padding mask in the 2D-3D matcher; the
        image-pair matcher may mask both.
        """
        dt = getattr(jnp, self.cfg.compute_dtype, jnp.float32)
        for idx, name in enumerate(self.cfg.layer_sequence):
            layer = LoFTREncoderLayer(
                self.cfg.d_model,
                self.cfg.nhead,
                self.cfg.attention,
                dtype=dt,
                name=f"layer_{idx}",
            )
            if name == "self":
                feat0, feat1 = (
                    layer(feat0, feat0, mask0, mask0),
                    layer(feat1, feat1, mask1, mask1),
                )
            elif name == "cross":
                feat0, feat1 = (
                    layer(feat0, feat1, mask0, mask1),
                    layer(feat1, feat0, mask1, mask0),
                )
            else:
                raise ValueError(name)
        return feat0, feat1
