"""Parity tests: fused Pallas dual-softmax matching vs the XLA reference path
(interpret mode on CPU; the same code compiles to Mosaic on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onepose_plus_plus_tpu.ops.matching import (
    dual_softmax_confidence,
    select_topk_matches,
)
from onepose_plus_plus_tpu.ops.pallas_matching import (
    dual_softmax_rowcol_stats,
    fused_select_topk_matches,
)


def make_feats(b=2, p=384, l=256, c=64, seed=0, scale=3.0):
    # well-separated features so bf16 matmul cannot flip argmaxes
    rng = np.random.default_rng(seed)
    f0 = rng.standard_normal((b, p, c)).astype(np.float32)
    f1 = rng.standard_normal((b, l, c)).astype(np.float32)
    # plant strong mutual matches: row 3i matches col i
    for bi in range(b):
        for i in range(0, min(p // 3, l), 2):
            f0[bi, 3 * i] = f1[bi, i] * scale
    return jnp.asarray(f0), jnp.asarray(f1)


class TestStats:
    def test_lse_matches_xla(self):
        f0, f1 = make_feats()
        temp = 0.08
        stats = dual_softmax_rowcol_stats(f0, f1, temp, interpret=True)
        scale = 1.0 / (f0.shape[-1] ** 0.5)
        sim = jnp.einsum("npc,nlc->npl", f0 * scale, f1 * scale) / (temp + 1e-4)
        row_lse = jax.scipy.special.logsumexp(sim, axis=2)
        col_lse = jax.scipy.special.logsumexp(sim, axis=1)
        # bf16 matmul tolerance
        np.testing.assert_allclose(
            np.asarray(stats["row_lse"]), np.asarray(row_lse), rtol=0.02, atol=0.5
        )
        np.testing.assert_allclose(
            np.asarray(stats["col_lse"]), np.asarray(col_lse), rtol=0.02, atol=0.5
        )

    def test_argmax_matches_conf_argmax(self):
        f0, f1 = make_feats(seed=1)
        temp = 0.08
        stats = dual_softmax_rowcol_stats(f0, f1, temp, interpret=True)
        conf = dual_softmax_confidence(f0, f1, temp)
        row_argmax = jnp.argmax(conf, axis=2)
        col_argmax = jnp.argmax(conf, axis=1)
        # planted matches are strong; agreement except float-tie rows
        agree_r = np.mean(np.asarray(stats["row_best_j"] == row_argmax))
        agree_c = np.mean(np.asarray(stats["col_best_p"] == col_argmax))
        assert agree_r > 0.97, agree_r
        assert agree_c > 0.97, agree_c
        # confidences of the best match agree where argmax agrees
        best_conf = jnp.exp(stats["row_best_val"] - stats["row_lse"])
        conf_at = jnp.take_along_axis(conf, row_argmax[:, :, None], 2)[..., 0]
        m = np.asarray(stats["row_best_j"] == row_argmax)
        np.testing.assert_allclose(
            np.asarray(best_conf)[m], np.asarray(conf_at)[m], rtol=0.05, atol=1e-3
        )

    def test_multitile_stats_parity(self):
        # Multi-tile in BOTH grid axes (4 row tiles x 4 col tiles): the
        # production shapes (P=7000, L=4096 with 512/1024 tiles) run the
        # cross-tile accumulation paths that single-tile tests never touch.
        # Round-2 regression: the original 1D lane/sublane-mixed kernels
        # miscompiled under Mosaic at multi-tile shapes (zero TPU matches)
        # while passing every single-tile interpret test.
        rng = np.random.default_rng(7)
        p, l, c = 256, 512, 64
        f0 = rng.standard_normal((2, p, c)).astype(np.float32)
        perm = rng.permutation(p)
        f1 = 0.1 * rng.standard_normal((2, l, c)).astype(np.float32)
        f1[:, :p] += f0[:, perm]
        f0, f1 = jnp.asarray(f0), jnp.asarray(f1)
        stats = dual_softmax_rowcol_stats(
            f0, f1, 0.1, r_tile=64, l_tile=128, interpret=True
        )
        scale = 1.0 / (c**0.5)
        sim = jnp.einsum(
            "npc,nlc->npl",
            (f0 * scale).astype(jnp.bfloat16),
            (f1 * scale).astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ) / (0.1 + 1e-4)
        row_lse = jax.scipy.special.logsumexp(sim, axis=2)
        col_lse = jax.scipy.special.logsumexp(sim, axis=1)
        rscore = 2 * sim - col_lse[:, None, :]
        cscore = 2 * sim - row_lse[:, :, None]
        np.testing.assert_allclose(
            np.asarray(stats["row_lse"]), np.asarray(row_lse), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(stats["col_lse"]), np.asarray(col_lse), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(stats["row_best_val"]),
            np.asarray(jnp.max(rscore, axis=2)),
            atol=1e-4,
        )
        np.testing.assert_array_equal(
            np.asarray(stats["row_best_j"]), np.asarray(jnp.argmax(rscore, axis=2))
        )
        np.testing.assert_allclose(
            np.asarray(stats["col_best_val"]),
            np.asarray(jnp.max(cscore, axis=1)),
            atol=1e-4,
        )
        np.testing.assert_array_equal(
            np.asarray(stats["col_best_p"]), np.asarray(jnp.argmax(cscore, axis=1))
        )

    def test_row_padding_masked(self):
        # P not a multiple of the tile: padded rows must not corrupt col stats
        f0, f1 = make_feats(p=100, l=128, c=32, seed=2)
        stats = dual_softmax_rowcol_stats(
            f0, f1, 0.1, r_tile=64, l_tile=128, interpret=True
        )
        assert stats["row_lse"].shape == (2, 100)
        assert int(jnp.max(stats["col_best_p"])) < 100  # never a padded row


class TestFusedSelect:
    @pytest.mark.parametrize("p,l,grid", [(384, 256, (16, 16)), (200, 64, (8, 8))])
    def test_matches_xla_select(self, p, l, grid):
        f0, f1 = make_feats(p=p, l=l, c=64, seed=3)
        temp, thr, border, k = 0.08, 0.1, 2, 64
        fused = fused_select_topk_matches(
            f0, f1, temp, grid, thr, border, k, interpret=True
        )
        conf = dual_softmax_confidence(f0, f1, temp)
        ref = select_topk_matches(conf, grid, thr, border, k)
        # same number of valid matches (within bf16-tie tolerance)
        n_f = np.asarray(fused.mask).sum(1)
        n_r = np.asarray(ref.mask).sum(1)
        assert np.abs(n_f - n_r).max() <= max(2, int(0.05 * n_r.max()))
        # the match SETS agree almost entirely
        for bi in range(f0.shape[0]):
            sf = set(
                zip(
                    np.asarray(fused.i_ids[bi])[np.asarray(fused.mask[bi])].tolist(),
                    np.asarray(fused.j_ids[bi])[np.asarray(fused.mask[bi])].tolist(),
                )
            )
            sr = set(
                zip(
                    np.asarray(ref.i_ids[bi])[np.asarray(ref.mask[bi])].tolist(),
                    np.asarray(ref.j_ids[bi])[np.asarray(ref.mask[bi])].tolist(),
                )
            )
            if sr:
                overlap = len(sf & sr) / len(sr)
                assert overlap > 0.9, f"batch {bi}: overlap {overlap}"

    def test_row_grid_border(self):
        f0, f1 = make_feats(p=256, l=256, c=32, seed=4)
        fused = fused_select_topk_matches(
            f0,
            f1,
            0.1,
            (16, 16),
            0.05,
            2,
            64,
            border_two_sided=True,
            row_grid_hw=(16, 16),
            interpret=True,
        )
        # no selected row/col may lie in the removed border
        m = np.asarray(fused.mask)
        for bi in range(2):
            for i, j, ok in zip(
                np.asarray(fused.i_ids[bi]),
                np.asarray(fused.j_ids[bi]),
                m[bi],
            ):
                if ok:
                    for idx in (i, j):
                        r, c = divmod(int(idx), 16)
                        assert 2 <= r < 14 and 2 <= c < 14
