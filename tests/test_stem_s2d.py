"""Space-to-depth stem equivalence (ResNetFPNConfig.stem_s2d).

The 7x7/2 single-channel stem conv is rewritten as a 4x4/1 conv over the
2x2-space-to-depth input (models/backbone.py::_StemConv) for MXU contraction
density; reference semantics are the direct conv
(``src/models/OnePosePlus/backbone/resnet.py:146-149``). These tests pin
exact mathematical equivalence on CPU: same param tree, same outputs, same
gradients, and the odd-size / multi-channel fallback.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from onepose_plus_plus_tpu.config import ResNetFPNConfig
from onepose_plus_plus_tpu.models.backbone import ResNetFPN_8_2, _StemConv


def _stem_pair(c_in=1):
    direct = _StemConv(16, s2d=False)
    s2d = _StemConv(16, s2d=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, c_in)).astype(np.float32))
    vars_ = direct.init(jax.random.PRNGKey(0), x)
    return direct, s2d, vars_, x


def test_stem_s2d_matches_direct_conv():
    direct, s2d, vars_, x = _stem_pair()
    y0 = direct.apply(vars_, x)
    y1 = s2d.apply(vars_, x)
    assert y0.shape == y1.shape == (2, 16, 16, 16)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)


def test_stem_s2d_param_tree_identical():
    direct, s2d, vars_, x = _stem_pair()
    vars_s2d = s2d.init(jax.random.PRNGKey(1), x)
    t0 = jax.tree.structure(vars_)
    t1 = jax.tree.structure(vars_s2d)
    assert t0 == t1
    assert vars_["params"]["kernel"].shape == (7, 7, 1, 16)


def test_stem_s2d_gradients_match():
    direct, s2d, vars_, x = _stem_pair()

    def loss(v, mod):
        y = mod.apply(v, x)
        return jnp.sum(y * jnp.cos(y))

    g0 = jax.grad(loss)(vars_, direct)["params"]["kernel"]
    g1 = jax.grad(loss)(vars_, s2d)["params"]["kernel"]
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=1e-4)


@pytest.mark.parametrize("shape", [(1, 31, 32, 1), (1, 32, 32, 3)])
def test_stem_s2d_fallback_odd_or_multichannel(shape):
    # odd spatial size / multi-channel input must take the direct path and
    # still agree with the direct module
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    direct = _StemConv(8, s2d=False)
    s2d = _StemConv(8, s2d=True)
    vars_ = direct.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(direct.apply(vars_, x)),
        np.asarray(s2d.apply(vars_, x)),
        atol=1e-5,
    )


def test_full_backbone_s2d_toggle_equivalent():
    cfg_on = ResNetFPNConfig(initial_dim=8, block_dims=(8, 12, 16))
    cfg_off = ResNetFPNConfig(
        initial_dim=8, block_dims=(8, 12, 16), stem_s2d=False
    )
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 1)).astype(np.float32))
    bb_on, bb_off = ResNetFPN_8_2(cfg_on), ResNetFPN_8_2(cfg_off)
    vars_ = bb_off.init(jax.random.PRNGKey(0), x)
    c0, f0 = bb_off.apply(vars_, x)
    c1, f1 = bb_on.apply(vars_, x)
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), atol=2e-4)
