"""Attention primitives for the LoFTR-style transformers.

Linear (O(L+S)) attention with the elu+1 feature map — the reference's core
sequence-scaling mechanism (reference
``src/models/OnePosePlus/loftr_module/linear_attention.py:21-61``) — expressed
as three einsum contractions that XLA maps directly onto the MXU.

Shapes follow [N, seq, heads, head_dim] throughout.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _elu_feature_map(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.elu(x) + 1.0


def linear_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_mask: Optional[jnp.ndarray] = None,
    kv_mask: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Linear attention ("Transformers are RNNs", Katharopoulos et al.).

    Args:
        q: [N, L, H, D] queries.
        k, v: [N, S, H, D] keys / values.
        q_mask: optional [N, L] validity mask.
        kv_mask: optional [N, S] validity mask.
    Returns:
        [N, L, H, D] attended values.

    Matches the reference math exactly, including the 1/S value pre-scaling
    (an fp16-overflow guard in the reference; harmless in fp32/bf16 and kept
    for bit-parity with released checkpoints).
    """
    if jax.default_backend() != "tpu" and q.dtype == jnp.bfloat16:
        # the CPU backend cannot execute mixed bf16->f32 dots
        # (DotThunk: "Unsupported element type ... BF16 x BF16 = F32")
        q, k, v = (t.astype(jnp.float32) for t in (q, k, v))
    Q = _elu_feature_map(q)
    K = _elu_feature_map(k)
    if q_mask is not None:
        Q = Q * q_mask[:, :, None, None].astype(Q.dtype)
    if kv_mask is not None:
        K = K * kv_mask[:, :, None, None].astype(K.dtype)
        v = v * kv_mask[:, :, None, None].astype(v.dtype)

    n, l, h, d = Q.shape
    s = K.shape[1]
    c = h * d
    v_length = s
    # Full-width block-masked contraction: per-head [D, D] KV outer products
    # are MXU-hostile (D=16/32 pads to 128 lanes, and the [N, S, H, D]
    # reshapes relayout every operand — ~12 ms/step of copies at the fine
    # stage's [24576, 25, 8, 16] on v5e). Instead contract over the FULL
    # feature width and zero the cross-head blocks: adding exact zeros in
    # f32 keeps per-head results identical while every matmul is C-wide.
    # (The H x MAC inflation is projection-sized and bf16-cheap.)
    Qf = Q.reshape(n, l, c)
    Kf = K.reshape(n, s, c)
    Vf = (v / v_length).reshape(n, s, c)
    lane = jnp.arange(c) // d
    block = (lane[:, None] == lane[None, :]).astype(jnp.float32)  # [C, C]
    KV = (
        jnp.einsum("nsc,nsv->ncv", Kf, Vf, preferred_element_type=jnp.float32)
        * block
    )
    K_sum = jnp.sum(Kf.astype(jnp.float32), axis=1)  # [N, C]
    # per-lane normalizer: z[n, l, c2] = sum_{c1 in head(c2)} Q[c1] K_sum[c1]
    kvx = jnp.concatenate([KV, block * K_sum[:, :, None]], axis=-1)  # [N,C,2C]
    ext = jnp.einsum(
        "nlc,ncx->nlx", Qf, kvx.astype(Qf.dtype),
        preferred_element_type=jnp.float32,
    )
    out = ext[:, :, :c] / (ext[:, :, c:] + eps) * v_length
    return out.reshape(n, l, h, d)


def full_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_mask: Optional[jnp.ndarray] = None,
    kv_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Standard softmax attention fallback ([N, L, H, D] x [N, S, H, D]).

    Mirrors reference ``FullAttention.forward`` (``linear_attention.py:64-95``).
    """
    scale = 1.0 / (q.shape[-1] ** 0.5)
    logits = jnp.einsum("nlhd,nshd->nlsh", q, k)
    if kv_mask is not None:
        mask = q_mask[:, :, None, None].astype(bool) & kv_mask[:, None, :, None].astype(bool)
        logits = jnp.where(mask, logits, -jnp.inf)
    attn = jax.nn.softmax(scale * logits, axis=2)
    return jnp.einsum("nlsh,nshd->nlhd", attn, v)
