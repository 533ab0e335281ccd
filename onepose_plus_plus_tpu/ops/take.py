"""TPU-fast batched row gathers.

``jnp.take_along_axis`` on a [B, L, C] array lowers to XLA ``gather``, which
the TPU backend executes as a slow scalar/row loop (~37 ms for a
[48, 7000, 128] -> [48, 512, 128] gather on v5e). Rewriting the gather as a
one-hot matmul puts it on the MXU where it is effectively free (<1 ms for the
same shapes): ``out[b, k] = sum_l onehot[b, k, l] * values[b, l]``.

The matmul runs in f32 so selected rows are bit-exact copies (each output
element is a sum with exactly one non-zero term).

Used on the inference hot path (fine-descriptor / keypoint selection,
reference ``OnePosePlusModel.py:179-201`` does the same selection with
advanced indexing on GPU).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def take_scalars(
    values: jnp.ndarray, ids: jnp.ndarray, _force_mxu: bool = False
) -> jnp.ndarray:
    """Batched scalar gather: values [B, M], ids [B, K] -> [B, K].

    XLA lowers per-element gathers to a ~17 ns/element row loop on TPU
    (~5.8 ms for the [48, 7000] <- [48, 4096] mutual-NN lookup in the fused
    matcher). Factorizing the one-hot through M = m1 x 128 makes it two
    small MXU/VPU passes: rows = onehot(ids // 128) @ values.reshape(m1, 128)
    then a fused one-hot-weighted row reduction. Exact for integer values
    with |v| < 2^24 (f32 products of 0/1 weights) and any float values
    (each output is a 1-sparse sum).

    Out-of-range ids return 0. Non-TPU backends use take_along_axis (ids
    clamped).

    The matmul MUST run at Precision.HIGHEST: TPU's default matmul precision
    truncates f32 operands to bf16, which is only exact for integers up to
    256 — the fused matcher packs ``col_best_p * 2 + keep`` (up to ~2L), and
    the truncation silently corrupted every mutual-NN lookup on TPU while
    passing bit-exact on CPU.
    """
    if jax.default_backend() != "tpu" and not _force_mxu:
        return jnp.take_along_axis(
            values, jnp.clip(ids, 0, values.shape[1] - 1), axis=1
        )
    b, m = values.shape
    m2 = 128
    m1 = -(-m // m2)
    vals = values.astype(jnp.float32)
    if m1 * m2 != m:
        vals = jnp.pad(vals, ((0, 0), (0, m1 * m2 - m)))
    hi = jax.nn.one_hot(ids // m2, m1, dtype=jnp.float32)  # [B, K, m1]
    rows = jnp.einsum(
        "bkh,bhl->bkl",
        hi,
        vals.reshape(b, m1, m2),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, K, 128]
    lo = jax.nn.one_hot(ids % m2, m2, dtype=jnp.float32)
    out = jnp.sum(rows * lo, axis=-1)
    # ids // m2 in [0, m1) but ids % m2 hitting the zero padding is fine;
    # negative ids: one_hot gives zeros -> 0
    return out.astype(values.dtype)


def take_rows(values: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Batched row gather: values [B, L, C], ids [B, K] -> [B, K, C].

    One-hot matmul on TPU (MXU), ``take_along_axis`` elsewhere. Out-of-range
    ids (e.g. -1 padding) return zero rows on the TPU path; callers that rely
    on that must mask on the fallback path themselves (jnp.take_along_axis
    clamps instead). All in-tree callers pass in-range ids.
    """
    if jax.default_backend() != "tpu":
        return jnp.take_along_axis(
            values, jnp.clip(ids, 0, values.shape[1] - 1)[..., None], axis=1
        )
    onehot = jax.nn.one_hot(ids, values.shape[1], dtype=jnp.float32)  # [B,K,L]
    # Precision.HIGHEST: default TPU matmul precision truncates the f32
    # values operand to bf16 — gathered 3D point coordinates would lose
    # 16 mantissa bits on their way into PnP.
    return jnp.einsum(
        "bkl,blc->bkc",
        onehot,
        values.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(values.dtype)
