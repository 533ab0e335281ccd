"""LoFTR-style local feature transformer (Flax).

Re-design of reference ``src/models/OnePosePlus/loftr_module/transformer.py``:
pre-projection QKV, linear (elu+1) attention, merge, concat-MLP FFN with two
LayerNorms, residual add. Layer sequence alternates 'self'/'cross' blocks; in
each step BOTH streams are updated (query<->source roles swap), matching
``LocalFeatureTransformer.forward`` (:133-171).

Two execution paths with an identical parameter tree (checkpoints are
interchangeable):

- XLA path (training + CPU): composable ops in ``ops/attention.py``.
- Fused Pallas path (TPU inference, long sequences): the whole encoder layer
  runs as two streaming kernels (``ops/pallas_encoder.py``), which removes
  the ~10 full-stream elementwise/LayerNorm HBM round-trips per layer-app.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import TransformerConfig
from ..ops.attention import linear_attention, full_attention
from ..ops.pallas_encoder import fused_encoder_layer


class _DenseKernel(nn.Module):
    """Parameter-only stand-in for nn.Dense(use_bias=False): same tree."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_features, self.features),
        )


class _LayerNormParams(nn.Module):
    """Parameter-only stand-in for nn.LayerNorm: same tree."""

    features: int

    @nn.compact
    def __call__(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return (
            self.param("scale", nn.initializers.ones, (self.features,)),
            self.param("bias", nn.initializers.zeros, (self.features,)),
        )


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
        fused: bool = False,
    ) -> jnp.ndarray:
        """x [N, L, C] attends to source [N, S, C]."""
        n, l, c = x.shape
        dim = self.d_model // self.nhead
        dt = self.dtype

        if fused and self.attention == "linear":
            d = self.d_model
            wq = _DenseKernel(d, d, name="q_proj")()
            wk = _DenseKernel(d, d, name="k_proj")()
            wv = _DenseKernel(d, d, name="v_proj")()
            wm = _DenseKernel(d, d, name="merge")()
            s1, b1 = _LayerNormParams(d, name="norm1")()
            w0 = _DenseKernel(2 * d, 2 * d, name="mlp_0")()
            w1 = _DenseKernel(2 * d, d, name="mlp_1")()
            s2, b2 = _LayerNormParams(d, name="norm2")()
            return fused_encoder_layer(
                x, source, wq, wk, wv, wm, s1, b1, w0, w1, s2, b2,
                x_mask=x_mask, source_mask=source_mask, nhead=self.nhead,
            ).astype(jnp.promote_types(x.dtype, jnp.float32))

        if (
            self.attention == "linear"
            and source.shape[1] == 1
            and x_mask is None
            and source_mask is None
        ):
            # Exact shortcut for a length-1 source: linear attention collapses
            # to out = Q'(K'^T V) / (Q'.K') = V for every query (up to the
            # 1e-6 normalizer eps). Used by the fine stage, where the selected
            # 3D descriptor is a 1-token stream (reference
            # ``fine_preprocess.py:41-54`` / ``OnePosePlusModel.py:179-201``)
            # — skips the per-head KV outer-product machinery entirely.
            # q/k projections still declared so the param tree (and therefore
            # checkpoint layout) is identical to the general path.
            _DenseKernel(self.d_model, self.d_model, name="q_proj")()
            _DenseKernel(self.d_model, self.d_model, name="k_proj")()
            v1 = nn.Dense(self.d_model, use_bias=False, name="v_proj", dtype=dt)(
                source
            )
            message = jnp.broadcast_to(v1, (n, l, self.d_model))
        else:
            q = nn.Dense(self.d_model, use_bias=False, name="q_proj", dtype=dt)(x)
            k = nn.Dense(self.d_model, use_bias=False, name="k_proj", dtype=dt)(source)
            v = nn.Dense(self.d_model, use_bias=False, name="v_proj", dtype=dt)(source)
            q = q.reshape(n, l, self.nhead, dim)
            k = k.reshape(n, source.shape[1], self.nhead, dim)
            v = v.reshape(n, source.shape[1], self.nhead, dim)

            attn = linear_attention if self.attention == "linear" else full_attention
            message = attn(q, k, v, q_mask=x_mask, kv_mask=source_mask)
            message = message.reshape(n, l, self.d_model)
        message = nn.Dense(self.d_model, use_bias=False, name="merge", dtype=dt)(
            message.astype(dt)
        )
        # LayerNorms stay f32 for numerical stability
        # torch LayerNorm default eps (1e-5) for checkpoint fidelity
        message = nn.LayerNorm(name="norm1", epsilon=1e-5, dtype=jnp.float32)(message)

        # concat in the compute dtype: Dense(dtype=dt) would cast right back
        # down, and the f32 [N, L, 2C] concat materialization costs ~4 ms/step
        # at the fine stage's [24576, 25, 256] on v5e
        message = nn.Dense(2 * self.d_model, use_bias=False, name="mlp_0", dtype=dt)(
            jnp.concatenate([x.astype(dt), message.astype(dt)], axis=-1)
        )
        message = nn.relu(message)
        message = nn.Dense(self.d_model, use_bias=False, name="mlp_1", dtype=dt)(message)
        message = nn.LayerNorm(name="norm2", epsilon=1e-5, dtype=jnp.float32)(message)

        # residual in the INPUT dtype: LN internals stay f32, but a bf16
        # stream (the fine stage feeds bf16 windows at inference) must not be
        # silently promoted — the f32 [24576, 25, C] stream cost ~4 ms/step
        return x + message.astype(x.dtype)


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
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """feat0 [N, L, C] (e.g. 3D descriptors), feat1 [N, S, C] (query grid).

        Mask convention follows the reference call sites: only the query
        stream (feat1) carries a padding mask in the 2D-3D matcher; the
        image-pair matcher may mask both.
        """
        dt = getattr(jnp, self.cfg.compute_dtype, jnp.float32)
        fused = self.cfg.fused_encoder
        if fused is None:
            # auto: TPU inference with long sequences only (KV-state
            # streaming kernels, 512-row tiles). Short batched sequences
            # (the fine stage's 25-token windows) STAY on XLA: a fused
            # short-seq kernel measured 23.4 ms vs XLA's 8.9 ms for the full
            # fine transformer at [24576, 25, 128] on v5e — grid launch
            # overhead swamps the fusion win (experiments/pallas_short_encoder.py).
            fused = (
                not train
                and self.cfg.attention == "linear"
                and jax.default_backend() == "tpu"
                and min(feat0.shape[1], feat1.shape[1]) >= 256
            )
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
                    layer(feat0, feat0, mask0, mask0, fused=fused),
                    layer(feat1, feat1, mask1, mask1, fused=fused),
                )
            elif name == "cross":
                feat0, feat1 = (
                    layer(feat0, feat1, mask0, mask1, fused=fused),
                    layer(feat1, feat0, mask1, mask0, fused=fused),
                )
            else:
                raise ValueError(name)
        return feat0, feat1
