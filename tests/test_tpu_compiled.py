"""Mosaic-compiled kernel parity at production shapes (real TPU only).

Interpret-mode parity is NOT TPU parity: the round-2 matching kernels passed
every interpret test while their Mosaic compilations collapsed match counts
at multi-tile shapes (1D lane/sublane relayout miscompile). These tests run
the compiled kernels on the real chip against XLA references at the flagship
shapes (P=7000 points, L=4096 cells, C=256).

Run with: JAX_PLATFORMS=<tpu backend> python -m pytest tests/test_tpu_compiled.py -m tpu
(the default CPU-pinned conftest skips them).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() != "tpu", reason="needs a real TPU backend"
    ),
]


def _feats(p, l, c=256, seed=0):
    rng = np.random.default_rng(seed)
    f0 = rng.standard_normal((1, p, c)).astype(np.float32)
    perm = rng.permutation(min(p, l))
    f1 = 0.1 * rng.standard_normal((1, l, c)).astype(np.float32)
    f1[0, : len(perm)] += f0[0, perm]
    return jnp.asarray(f0), jnp.asarray(f1)


@pytest.mark.parametrize("p,l", [(2048, 2048), (7000, 4096)])
def test_stats_parity_compiled(p, l):
    from onepose_plus_plus_tpu.ops.pallas_matching import dual_softmax_rowcol_stats

    f0, f1 = _feats(p, l)
    got = jax.jit(lambda a, b: dual_softmax_rowcol_stats(a, b, 0.1))(f0, f1)

    c = f0.shape[-1]
    s = 1.0 / (c**0.5)
    sim = jax.lax.dot_general(
        (f0 * s).astype(jnp.bfloat16),
        (f1 * s).astype(jnp.bfloat16),
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) / (0.1 + 1e-4)
    row_lse = jax.scipy.special.logsumexp(sim, axis=2)
    col_lse = jax.scipy.special.logsumexp(sim, axis=1)
    np.testing.assert_allclose(
        np.asarray(got["row_lse"]), np.asarray(row_lse), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(got["col_lse"]), np.asarray(col_lse), atol=2e-3
    )
    rscore = 2 * sim - col_lse[:, None, :]
    # argmax ids must agree except where the two best scores tie within float
    # noise of each other
    want_j = np.asarray(jnp.argmax(rscore, axis=2))
    got_j = np.asarray(got["row_best_j"])
    dis = got_j != want_j
    assert dis.mean() < 0.01, f"{dis.sum()} of {dis.size} row argmax mismatches"


def test_select_parity_compiled_pair_mode():
    """The end-to-end regression that caught the round-2 bug: pair-mode
    matching on TPU returned ZERO matches while XLA returned a full K."""
    from onepose_plus_plus_tpu.ops.matching import (
        dual_softmax_confidence,
        select_topk_matches,
    )
    from onepose_plus_plus_tpu.ops.pallas_matching import fused_select_topk_matches

    f0, f1 = _feats(4096, 4096)
    kw = dict(
        temperature=0.1, grid_hw=(64, 64), thr=0.2, border_rm=2, k=1428,
        border_two_sided=True, row_grid_hw=(64, 64),
    )
    fused = jax.jit(lambda a, b: fused_select_topk_matches(a, b, **kw))(f0, f1)
    xla = jax.jit(
        lambda a, b: select_topk_matches(
            dual_softmax_confidence(a, b, 0.1), (64, 64), 0.2, 2, 1428,
            border_two_sided=True, row_grid_hw=(64, 64),
        )
    )(f0, f1)
    fm = np.asarray(fused.mask)[0]
    xm = np.asarray(xla.mask)[0]
    fset = set(
        zip(np.asarray(fused.i_ids)[0][fm].tolist(),
            np.asarray(fused.j_ids)[0][fm].tolist())
    )
    xset = set(
        zip(np.asarray(xla.i_ids)[0][xm].tolist(),
            np.asarray(xla.j_ids)[0][xm].tolist())
    )
    jacc = len(fset & xset) / max(len(fset | xset), 1)
    assert jacc > 0.95, f"fused={fm.sum()} xla={xm.sum()} jaccard={jacc:.3f}"


@pytest.mark.parametrize("with_masks", [False, True])
def test_encoder_parity_compiled(with_masks):
    """Fused encoder layer vs the XLA transformer layer at coarse shapes."""
    import flax.linen as fnn
    from onepose_plus_plus_tpu.models.transformer import LoFTREncoderLayer

    rng = np.random.default_rng(3)
    n, l, s, c = 2, 4096, 7000, 256
    x = jnp.asarray(rng.standard_normal((n, l, c)) * 0.5, jnp.float32)
    src = jnp.asarray(rng.standard_normal((n, s, c)) * 0.5, jnp.float32)
    xm = sm = None
    if with_masks:
        xm = jnp.asarray(rng.random((n, l)) > 0.1)
        sm = jnp.asarray(rng.random((n, s)) > 0.1)
    layer = LoFTREncoderLayer(d_model=c, nhead=8)
    v = jax.jit(lambda r: layer.init(r, x, src, xm, sm))(jax.random.PRNGKey(0))
    y_fused = jax.jit(
        lambda a, b: layer.apply(v, a, b, xm, sm, fused=True)
    )(x, src)
    y_xla = jax.jit(lambda a, b: layer.apply(v, a, b, xm, sm, fused=False))(x, src)
    err = float(jnp.max(jnp.abs(y_fused - y_xla)))
    scale = float(jnp.max(jnp.abs(y_xla)))
    assert err < 0.05 * scale, f"fused encoder diverges: maxerr={err} scale={scale}"


def test_take_scalars_exact_large_ints():
    """TPU default matmul precision truncates f32 operands to bf16 (exact
    only for ints <= 256). take_scalars carries packed ids up to ~2L — it
    must force f32 precision or every mutual-NN lookup corrupts silently."""
    from onepose_plus_plus_tpu.ops.take import take_scalars, take_rows

    rng = np.random.default_rng(7)
    vals = jnp.asarray(rng.integers(0, 2**20, (2, 7000)), jnp.int32)
    ids = jnp.asarray(rng.integers(0, 7000, (2, 4096)), jnp.int32)
    got = np.asarray(jax.jit(take_scalars)(vals, ids))
    want = np.asarray(vals)[np.arange(2)[:, None], np.asarray(ids)]
    np.testing.assert_array_equal(got, want)

    fvals = jnp.asarray(rng.standard_normal((2, 7000, 3)), jnp.float32)
    rids = jnp.asarray(rng.integers(0, 7000, (2, 1428)), jnp.int32)
    rgot = np.asarray(jax.jit(take_rows)(fvals, rids))
    rwant = np.asarray(fvals)[np.arange(2)[:, None], np.asarray(rids)]
    np.testing.assert_array_equal(rgot, rwant)


def test_gather_parity_compiled():
    from onepose_plus_plus_tpu.ops.pallas_gather import take_rows_mxu

    rng = np.random.default_rng(1)
    vals = jnp.asarray(rng.standard_normal((4, 5120, 2048)), jnp.bfloat16)
    ids = jnp.asarray(rng.integers(-1, 5120, (4, 2048)), jnp.int32)
    got = jax.jit(take_rows_mxu)(vals, ids)
    want = jnp.where(
        (ids >= 0)[:, :, None],
        jnp.take_along_axis(vals, jnp.clip(ids, 0)[:, :, None], axis=1),
        0,
    )
    np.testing.assert_array_equal(
        np.asarray(got.astype(jnp.float32)), np.asarray(want.astype(jnp.float32))
    )


def test_scatter_grad_parity_compiled():
    """custom_vjp backward (register one-hot scatter kernel) vs the XLA
    one-hot transpose at the train-path fine-gather shapes."""
    from onepose_plus_plus_tpu.ops.pallas_gather import take_rows_mxu_grad

    rng = np.random.default_rng(4)
    b, m, k, g = 4, 4356, 9 * 1428, 512
    vals = jnp.asarray(rng.standard_normal((b, m, g)), jnp.bfloat16)
    ids = jnp.asarray(rng.integers(-1, m, (b, k)), jnp.int32)
    cot = jnp.asarray(rng.standard_normal((b, k, g)), jnp.bfloat16)

    def xla_path(v):
        onehot = jax.nn.one_hot(ids, m, dtype=jnp.bfloat16)
        return jax.lax.dot_general(
            onehot, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(v.dtype)

    out_k, vjp_k = jax.vjp(lambda v: take_rows_mxu_grad(v, ids, 1024), vals)
    out_x, vjp_x = jax.vjp(xla_path, vals)
    np.testing.assert_array_equal(
        np.asarray(out_k.astype(jnp.float32)), np.asarray(out_x.astype(jnp.float32))
    )
    gk = np.asarray(vjp_k(cot)[0].astype(jnp.float32))
    gx = np.asarray(vjp_x(cot)[0].astype(jnp.float32))
    scale = max(np.abs(gx).max(), 1e-6)
    assert np.abs(gk - gx).max() < 0.02 * scale


@pytest.mark.parametrize("window,c", [(5, 128), (9, 196)])
def test_patch_gather_parity_compiled(window, c):
    """DMA patch gather vs the XLA generic gather at production scale."""
    from onepose_plus_plus_tpu.ops.pallas_patch_gather import gather_patches_dma
    from onepose_plus_plus_tpu.ops.window_gather import gather_windows

    rng = np.random.default_rng(11)
    n, h, w, k = 8, 256, 256, 512
    feat = jnp.asarray(
        rng.standard_normal((n, h, w, c)).astype(np.float32)
    ).astype(jnp.bfloat16)
    centers = jnp.asarray(rng.integers(0, h, (n, k, 2)).astype(np.int32))
    half = window // 2
    got = jax.jit(
        lambda f, ctr: gather_patches_dma(
            f, ctr[..., 0] - half, ctr[..., 1] - half, window
        )
    )(feat, centers)
    want = jax.jit(lambda f, ctr: gather_windows(f, ctr, window))(feat, centers)
    np.testing.assert_array_equal(
        np.asarray(got.astype(jnp.float32)), np.asarray(want.astype(jnp.float32))
    )


def test_sparse_fine_fpn_parity_compiled():
    """Sparse fine FPN vs dense windows, compiled on-chip at flagship scale
    (bf16 backbone, 512^2 image, K=512 windows)."""
    import dataclasses as dc

    from onepose_plus_plus_tpu.config import ResNetFPNConfig
    from onepose_plus_plus_tpu.models.backbone import ResNetFPN_8_2
    from onepose_plus_plus_tpu.ops.window_gather import gather_windows_aligned

    rng = np.random.default_rng(13)
    bb = ResNetFPN_8_2(ResNetFPNConfig(), dtype=jnp.bfloat16)
    img = jnp.asarray(rng.random((2, 512, 512, 1), np.float32))
    v = jax.jit(lambda r, x: bb.init(r, x, train=False))(jax.random.PRNGKey(0), img)
    ids_np = rng.integers(0, 64 * 64, (2, 512)).astype(np.int32)
    ids_np[0, :4] = [0, 63, 63 * 64, 64 * 64 - 1]
    ids_np[1, -4:] = -1
    ids = jnp.asarray(ids_np)

    @jax.jit
    def dense(x, i):
        _, ff = bb.apply(v, x)
        return gather_windows_aligned(ff, i, (64, 64), 4, 5)

    @jax.jit
    def sparse(x, i):
        _, ctx = bb.apply(v, x, method="coarse_and_ctx")
        return bb.apply(v, ctx, i, (64, 64), 4, 5, method="fine_windows")

    want = np.asarray(dense(img, ids).astype(jnp.float32))
    got = np.asarray(sparse(img, ids).astype(jnp.float32))
    scale = max(np.abs(want).max(), 1e-6)
    err = np.abs(got - want).max()
    assert err < 0.05 * scale, f"sparse fine FPN diverges: {err} vs scale {scale}"




def test_fused_coarse_loss_parity_compiled():
    """Compiled fused focal loss + VJP vs the XLA reference at the train
    config shape (P=7000, L=4096, C=256) — value AND gradient direction.

    The XLA reference consumes the same bf16-rounded features the kernels
    see, isolating Mosaic compilation from dtype rounding (the round-2
    failure mode: interpret-parity green, compiled silently wrong)."""
    from onepose_plus_plus_tpu.ops.matching import dual_softmax_confidence
    from onepose_plus_plus_tpu.ops.pallas_coarse_loss import (
        fused_coarse_focal_loss,
    )
    from onepose_plus_plus_tpu.train.losses import LossConfig, coarse_focal_loss

    cfg = LossConfig()
    t = 0.08
    p, l, c = 7000, 4096, 256
    # diffuse features, NOT _feats: planted matches saturate the dual softmax
    # (conf clipped at both ends -> ~zero gradient everywhere) and the grad
    # comparison degenerates to noise-vs-noise (cos ~0.45 at |g| ~ 1e-11
    # on every backend pair, including CPU-vs-CPU)
    rng = np.random.default_rng(0)
    f0 = jnp.asarray(rng.standard_normal((1, p, c)).astype(np.float32))
    f1 = jnp.asarray(rng.standard_normal((1, l, c)).astype(np.float32))
    rng = np.random.default_rng(2)
    gt = jnp.asarray(
        np.where(
            rng.random((1, p)) < 0.1, rng.integers(0, l, (1, p)), -1
        ).astype(np.int32)
    )
    scale = 1.0 / (c**0.5)

    def ref_fn(a, b):
        conf = dual_softmax_confidence(
            (a * scale).astype(jnp.bfloat16).astype(jnp.float32),
            (b * scale).astype(jnp.bfloat16).astype(jnp.float32),
            t,
            feat_norm="none",
        )
        return coarse_focal_loss(conf, gt, cfg)

    def fused_fn(a, b):
        return fused_coarse_focal_loss(
            a, b, gt, t, cfg.focal_alpha, cfg.focal_gamma,
            cfg.pos_weight, cfg.neg_weight,
        )[0]

    ref, g_ref = jax.jit(jax.value_and_grad(ref_fn, argnums=(0, 1)))(f0, f1)
    got, g_fused = jax.jit(jax.value_and_grad(fused_fn, argnums=(0, 1)))(f0, f1)
    np.testing.assert_allclose(float(got), float(ref), rtol=5e-4)
    for gr, gf in zip(g_ref, g_fused):
        gr, gf = np.asarray(gr), np.asarray(gf)
        s = np.abs(gr).max()
        # guard against a saturated/degenerate comparison (see above)
        assert s > 1e-8, f"reference gradient vanished (|g|max={s}) — bad inputs"
        assert np.abs(gf - gr).max() < 3e-2 * s
        cos = (gr * gf).sum() / (np.linalg.norm(gr) * np.linalg.norm(gf) + 1e-12)
        assert cos > 0.999
