import numpy as np
import jax.numpy as jnp

from onepose_plus_plus_tpu.ops.attention import linear_attention, full_attention


def _ref_linear_attention(q, k, v, q_mask=None, kv_mask=None, eps=1e-6):
    """Direct numpy transcription of the reference math (linear_attention.py:45-61)."""

    def elu1(x):
        return np.where(x > 0, x + 1.0, np.exp(x))

    Q, K = elu1(q), elu1(k)
    if q_mask is not None:
        Q = Q * q_mask[:, :, None, None]
    if kv_mask is not None:
        K = K * kv_mask[:, :, None, None]
        v = v * kv_mask[:, :, None, None]
    v_len = v.shape[1]
    v = v / v_len
    KV = np.einsum("nshd,nshv->nhdv", K, v)
    Z = 1.0 / (np.einsum("nlhd,nhd->nlh", Q, K.sum(1)) + eps)
    return np.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * v_len


def test_linear_attention_matches_reference_math():
    rng = np.random.RandomState(0)
    q = rng.randn(2, 7, 4, 8).astype(np.float32)
    k = rng.randn(2, 11, 4, 8).astype(np.float32)
    v = rng.randn(2, 11, 4, 8).astype(np.float32)
    out = np.asarray(linear_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    ref = _ref_linear_attention(q, k, v)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_linear_attention_masked():
    rng = np.random.RandomState(1)
    q = rng.randn(2, 5, 2, 4).astype(np.float32)
    k = rng.randn(2, 9, 2, 4).astype(np.float32)
    v = rng.randn(2, 9, 2, 4).astype(np.float32)
    qm = (rng.rand(2, 5) > 0.3).astype(np.float32)
    km = (rng.rand(2, 9) > 0.3).astype(np.float32)
    out = np.asarray(
        linear_attention(*map(jnp.asarray, (q, k, v)), q_mask=jnp.asarray(qm), kv_mask=jnp.asarray(km))
    )
    ref = _ref_linear_attention(q, k, v, qm, km)
    np.testing.assert_allclose(out, ref, atol=1e-5)
    # masked-out kv rows must not influence output
    k2 = k.copy()
    k2[km == 0] = 99.0
    out2 = np.asarray(
        linear_attention(*map(jnp.asarray, (q, k2, v)), q_mask=jnp.asarray(qm), kv_mask=jnp.asarray(km))
    )
    np.testing.assert_allclose(out, out2, atol=1e-5)


def test_full_attention_is_softmax_attention():
    rng = np.random.RandomState(2)
    q = rng.randn(1, 4, 2, 8).astype(np.float32)
    k = rng.randn(1, 6, 2, 8).astype(np.float32)
    v = rng.randn(1, 6, 2, 8).astype(np.float32)
    out = np.asarray(full_attention(*map(jnp.asarray, (q, k, v))))
    logits = np.einsum("nlhd,nshd->nlsh", q, k) / np.sqrt(8)
    a = np.exp(logits - logits.max(2, keepdims=True))
    a = a / a.sum(2, keepdims=True)
    ref = np.einsum("nlsh,nshd->nlhd", a, v)
    np.testing.assert_allclose(out, ref, atol=1e-5)
