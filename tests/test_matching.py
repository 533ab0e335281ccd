import numpy as np
import jax
import jax.numpy as jnp

from onepose_plus_plus_tpu.ops.matching import (
    dual_softmax_confidence,
    select_topk_matches,
    pad_matches_with_gt,
)


def _softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def test_dual_softmax_matches_reference_math():
    rng = np.random.RandomState(0)
    f0 = rng.randn(2, 6, 16).astype(np.float32)
    f1 = rng.randn(2, 8, 16).astype(np.float32)
    conf = np.asarray(
        dual_softmax_confidence(jnp.asarray(f0), jnp.asarray(f1), temperature=0.08)
    )
    sim = np.einsum("nlc,nsc->nls", f0 / 4.0, f1 / 4.0) / (0.08 + 1e-4)
    ref = _softmax(sim, 1) * _softmax(sim, 2)
    np.testing.assert_allclose(conf, ref, atol=1e-5)


def test_select_topk_finds_planted_matches():
    # plant strong mutual matches away from borders on a 4x4 grid (S=16)
    L, h, w = 10, 4, 4
    conf = np.full((1, L, h * w), 1e-4, np.float32)
    planted = [(0, 2 * w + 2), (3, 3 * w + 3), (7, 2 * w + 3)]
    for i, j in planted:
        conf[0, i, j] = 0.9
    m = select_topk_matches(jnp.asarray(conf), (h, w), thr=0.1, border_rm=2, k=5)
    got = {(int(i), int(j)) for i, j, ok in zip(m.i_ids[0], m.j_ids[0], m.mask[0]) if ok}
    assert got == set(planted)
    assert int(m.mask.sum()) == 3
    # confidences propagated
    assert np.allclose(np.sort(np.asarray(m.mconf[0])[np.asarray(m.mask[0])]), [0.9] * 3)


def test_select_topk_border_quirk_one_sided():
    # reference 2D-3D matcher masks only top/left borders (empty -b:0 slices)
    h, w = 4, 4
    conf = np.full((1, 2, h * w), 1e-4, np.float32)
    conf[0, 0, 1 * w + 1] = 0.9  # inside removed top/left border (row 1 < 2)
    conf[0, 1, 3 * w + 3] = 0.9  # bottom-right corner — kept by the quirk
    m = select_topk_matches(jnp.asarray(conf), (h, w), 0.1, 2, 4, border_two_sided=False)
    got = {(int(i), int(j)) for i, j, ok in zip(m.i_ids[0], m.j_ids[0], m.mask[0]) if ok}
    assert got == {(1, 3 * w + 3)}
    # two-sided (LoFTR pair matcher) removes it as well
    m2 = select_topk_matches(jnp.asarray(conf), (h, w), 0.1, 2, 4, border_two_sided=True)
    assert int(m2.mask.sum()) == 0


def test_select_topk_respects_mutual_nn():
    h, w = 3, 3
    conf = np.full((1, 3, 9), 1e-4, np.float32)
    # rows 0 and 1 both peak at column 8, but row 0 is larger -> only row 0 kept
    conf[0, 0, 8] = 0.9
    conf[0, 1, 8] = 0.8
    m = select_topk_matches(jnp.asarray(conf), (h, w), 0.1, 0, 3)
    got = {(int(i), int(j)) for i, j, ok in zip(m.i_ids[0], m.j_ids[0], m.mask[0]) if ok}
    assert got == {(0, 8)}


def test_pad_matches_with_gt():
    h, w = 4, 4
    L = 6
    conf = np.full((1, L, h * w), 1e-4, np.float32)
    conf[0, 2, 2 * w + 2] = 0.9
    m = select_topk_matches(jnp.asarray(conf), (h, w), 0.1, 2, k=4)
    conf_gt = np.zeros((1, L, h * w), np.float32)
    conf_gt[0, 1, 5] = 1.0
    conf_gt[0, 4, 7] = 1.0
    gt_cell = np.full((1, L), -1, np.int32)
    gt_cell[0, 1] = 5
    gt_cell[0, 4] = 7
    padded = pad_matches_with_gt(m, jnp.asarray(gt_cell), jax.random.PRNGKey(0), num_gt_min=3)
    assert padded.i_ids.shape == (1, 7)
    # GT slots: mask True, mconf == 0, (i, j) drawn from GT entries
    gt_i = np.asarray(padded.i_ids[0, 4:])
    gt_j = np.asarray(padded.j_ids[0, 4:])
    assert np.all(np.asarray(padded.mask[0, 4:]))
    assert np.all(np.asarray(padded.mconf[0, 4:]) == 0)
    for i, j in zip(gt_i, gt_j):
        assert conf_gt[0, i, j] == 1.0
    # both GT rows appear (3 slots from 2 rows -> with wraparound both present)
    assert {1, 4} == set(gt_i.tolist()) | ({1, 4} & set(gt_i.tolist()))


def test_take_scalars_mxu_formulation_exact():
    """The factorized one-hot scalar gather (TPU path) must equal
    take_along_axis for in-range ids and return 0 for out-of-range ids,
    for s32, bool and f32 values, including non-multiple-of-128 widths."""
    import numpy as np
    from onepose_plus_plus_tpu.ops.take import take_scalars

    rng = np.random.default_rng(0)
    for m in (4096, 300):
        ids = rng.integers(0, m, (3, 50)).astype(np.int32)
        ids[:, -2] = -1
        ids[:, -1] = m + 7
        for vals in (
            rng.integers(0, 2**20, (3, m)).astype(np.int32),
            rng.random((3, m)) > 0.5,
            rng.standard_normal((3, m)).astype(np.float32),
        ):
            out = np.asarray(
                take_scalars(jnp.asarray(vals), jnp.asarray(ids), _force_mxu=True)
            )
            ref = np.take_along_axis(vals, np.clip(ids, 0, m - 1), axis=1)
            ref[:, -2:] = 0
            assert out.dtype == vals.dtype
            np.testing.assert_array_equal(out, ref)


def test_take_rows_mxu_kernel_exact():
    """The fused one-hot gather-matmul kernel (interpret mode) must copy
    selected bf16 rows bit-exactly and zero out-of-range ids, including
    non-tile-multiple M/G."""
    import numpy as np
    from onepose_plus_plus_tpu.ops.pallas_gather import take_rows_mxu

    rng = np.random.default_rng(1)
    for (m, g) in [(300, 130), (512, 256)]:
        vals = jnp.asarray(rng.standard_normal((2, m, g)).astype(np.float32)).astype(
            jnp.bfloat16
        )
        ids = rng.integers(0, m, (2, 40)).astype(np.int32)
        ids[:, -2] = -1
        ids[:, -1] = m + 5
        out = take_rows_mxu(
            vals, jnp.asarray(ids), interpret=True,
            tile_k=16, tile_m=128, tile_g=128,
        )
        assert out.dtype == jnp.bfloat16
        ref = np.asarray(vals.astype(jnp.float32))[
            np.arange(2)[:, None], np.clip(ids, 0, m - 1)
        ]
        ref[:, -2:] = 0.0
        np.testing.assert_array_equal(
            np.asarray(out.astype(jnp.float32)), ref
        )


def test_scatter_rows_mxu_kernel_exact():
    """Transpose kernel (interpret mode): scatter-add with duplicate ids,
    out-of-range ids dropped, non-tile-multiple shapes."""
    import numpy as np
    from onepose_plus_plus_tpu.ops.pallas_gather import scatter_rows_mxu

    rng = np.random.default_rng(2)
    m, k, g = 300, 40, 130
    grad = rng.standard_normal((2, k, g)).astype(np.float32)
    grad = np.asarray(jnp.asarray(grad).astype(jnp.bfloat16).astype(jnp.float32))
    ids = rng.integers(0, m, (2, k)).astype(np.int32)
    ids[:, 1] = ids[:, 0]  # duplicate -> accumulate
    ids[:, -2] = -1
    ids[:, -1] = m + 5
    out = scatter_rows_mxu(
        jnp.asarray(grad, jnp.float32),
        jnp.asarray(ids),
        m,
        interpret=True,
        tile_k=16,
        tile_m=128,
        tile_g=128,
    )
    ref = np.zeros((2, m, g), np.float32)
    for b in range(2):
        for kk in range(k):
            if 0 <= ids[b, kk] < m:
                ref[b, ids[b, kk]] += grad[b, kk]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_take_rows_mxu_grad_matches_xla():
    """custom_vjp of the gather kernel == VJP of the XLA one-hot matmul
    (the train-path route in gather_windows_aligned)."""
    import numpy as np
    from onepose_plus_plus_tpu.ops.pallas_gather import take_rows_mxu_grad

    rng = np.random.default_rng(3)
    m, k, g = 256, 24, 128
    vals = jnp.asarray(
        rng.standard_normal((2, m, g)).astype(np.float32)
    ).astype(jnp.bfloat16)
    ids = jnp.asarray(rng.integers(0, m, (2, k)).astype(np.int32))
    cot = jnp.asarray(rng.standard_normal((2, k, g)).astype(np.float32)).astype(
        jnp.bfloat16
    )

    def xla_path(v):
        onehot = jax.nn.one_hot(ids, m, dtype=jnp.bfloat16)
        return jax.lax.dot_general(
            onehot, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(v.dtype)

    out_k, vjp_k = jax.vjp(lambda v: take_rows_mxu_grad(v, ids, 128), vals)
    out_x, vjp_x = jax.vjp(xla_path, vals)
    np.testing.assert_allclose(
        np.asarray(out_k, np.float32), np.asarray(out_x, np.float32), atol=1e-2
    )
    gk = np.asarray(vjp_k(cot)[0], np.float32)
    gx = np.asarray(vjp_x(cot)[0], np.float32)
    np.testing.assert_allclose(gk, gx, atol=1e-2)
