"""Int8 dynamic-quantization backbone path (cfg.quant_int8).

The quantized path must (a) keep the exact same parameter tree as the
bf16/f32 path (checkpoint compatibility), (b) stay numerically close to the
reference path — per-tensor dynamic activation scales bound the error at
each conv, and BN renormalizes between convs — and (c) remain inactive
during training (rounding has no useful gradient).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from onepose_plus_plus_tpu.config import ResNetFPNConfig
from onepose_plus_plus_tpu.models.backbone import ResNetFPN_8_2


def _textured_batch(rng, n=2, img=64):
    tex = np.kron(rng.random((n, img // 8, img // 8)), np.ones((8, 8)))
    tex = tex + 0.05 * rng.standard_normal((n, img, img))
    return jnp.asarray(tex[..., None], jnp.float32)


@pytest.mark.slow
def test_param_tree_identical_and_outputs_close():
    rng = np.random.default_rng(0)
    x = _textured_batch(rng)
    ref = ResNetFPN_8_2(ResNetFPNConfig(), dtype=jnp.float32)
    qat = ResNetFPN_8_2(ResNetFPNConfig(quant_int8=True), dtype=jnp.float32)
    v_ref = ref.init(jax.random.PRNGKey(0), x)
    v_q = qat.init(jax.random.PRNGKey(0), x)
    ref_paths = jax.tree_util.tree_structure(v_ref)
    q_paths = jax.tree_util.tree_structure(v_q)
    assert ref_paths == q_paths
    for a, b in zip(jax.tree_util.tree_leaves(v_ref), jax.tree_util.tree_leaves(v_q)):
        assert a.shape == b.shape

    coarse_r, fine_r = jax.jit(lambda v, x: ref.apply(v, x))(v_ref, x)
    coarse_q, fine_q = jax.jit(lambda v, x: qat.apply(v, x))(v_ref, x)
    for got, want in ((coarse_q, coarse_r), (fine_q, fine_r)):
        got = np.asarray(got, np.float64).reshape(-1)
        want = np.asarray(want, np.float64).reshape(-1)
        cos = got @ want / (np.linalg.norm(got) * np.linalg.norm(want))
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert cos > 0.995, f"cos={cos}"
        assert rel < 0.12, f"rel={rel}"


@pytest.mark.slow
def test_train_path_ignores_quant():
    """train=True must produce the exact unquantized forward (and gradients
    flow through the float conv)."""
    rng = np.random.default_rng(1)
    x = _textured_batch(rng, n=1, img=32)
    ref = ResNetFPN_8_2(ResNetFPNConfig(), dtype=jnp.float32)
    qat = ResNetFPN_8_2(ResNetFPNConfig(quant_int8=True), dtype=jnp.float32)
    v = ref.init(jax.random.PRNGKey(0), x)

    def fwd(model):
        out, _ = model.apply(
            v, x, train=True, mutable=["batch_stats"]
        )
        return out

    (c_r, f_r) = fwd(ref)
    (c_q, f_q) = fwd(qat)
    np.testing.assert_array_equal(np.asarray(c_r), np.asarray(c_q))
    np.testing.assert_array_equal(np.asarray(f_r), np.asarray(f_q))

    def loss(params):
        out, _ = qat.apply(
            {**v, "params": params}, x, train=True, mutable=["batch_stats"]
        )
        return jnp.sum(out[0] ** 2)

    g = jax.grad(loss)(v["params"])
    gnorm = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0
