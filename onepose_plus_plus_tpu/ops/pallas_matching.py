"""Fused dual-softmax mutual-NN matching — Pallas TPU kernels.

The XLA path (``ops.matching``) materializes the [B, P, L] confidence matrix
(1.8 GB at inference shapes B16 x P7000 x L4096) several times: similarity
einsum, two softmaxes, the product, mutual-NN comparisons — ~700 ms of the
804 ms forward on one chip, all HBM-bound. This module replaces it for
inference with two streaming Pallas kernels that never materialize [P, L].

The dual-softmax confidence factorizes through log-sum-exps:

    log conf[p, l] = 2*s[p, l] - rowLSE[p] - colLSE[l]

so the per-row / per-column argmaxes of ``conf`` reduce to

    argmax_l conf[p, l] = argmax_l (2*s[p, l] - colLSE[l])
    argmax_p conf[p, l] = argmax_p (2*s[p, l] - rowLSE[p])

Kernel 1 streams similarity tiles (bf16 MXU matmuls, f32 accumulation) into
online row/col log-sum-exps; kernel 2 re-streams the same tiles against the
finished LSEs into running row/col argmaxes. Total traffic = 2 matmul passes
over the feature matrices + O(P + L) outputs. Mutual-NN + threshold + border
masking + top-K selection then run on [B, P]-sized arrays in XLA
(:func:`fused_select_topk_matches`).

Outputs match ``ops.matching.select_topk_matches`` up to float associativity.
Reference semantics source:
``src/models/OnePosePlus/utils/coarse_matching.py:56-251``.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .matching import CoarseMatches, _border_keep
from .take import take_scalars

_NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# --------------------------- kernel 1: LSE pass ----------------------------


def _lse_kernel(
    f0_ref,  # [1, R, C] row-tile features (3D points)
    f1_ref,  # [1, L, C] full column features (image cells)
    radd_ref,  # [1, R, 1] additive row mask tile (-1e9 invalid, 0 valid)
    cadd_ref,  # [1, 1, L] additive col mask
    row_lse_ref,  # out [1, R, 1] (one block per row tile)
    col_lse_ref,  # out [1, 1, L] (accumulated over row tiles)
    *,
    l_tile: int,
    r_tile: int,
    inv_temp: float,
):
    # Everything stays 2D in its natural orientation — row stats as [R, 1]
    # sublane columns, col stats as [1, L] lane rows. 1D vectors crossing the
    # sublane<->lane boundary (e.g. a lane-sliced row vector broadcast over
    # columns) miscompiled under Mosaic at multi-tile shapes (correct in
    # interpret mode), which silently zeroed TPU match counts.
    pt = pl.program_id(1)
    r = f0_ref.shape[1]
    l_total = f1_ref.shape[1]
    n_lt = l_total // l_tile

    f0 = f0_ref[0, :, :]
    radd = radd_ref[0, :, :]  # [R, 1]

    @pl.when(pt == 0)
    def _():
        col_lse_ref[:, :, :] = jnp.full_like(col_lse_ref, _NEG)

    def body(lt, carry):
        row_max, row_sum = carry  # [R, 1] each
        lsl = pl.ds(pl.multiple_of(lt * l_tile, l_tile), l_tile)
        f1_tile = f1_ref[0, lsl, :]
        sim = (
            jax.lax.dot_general(
                f0,
                f1_tile,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * inv_temp
        )  # [R, l_tile]
        sim = sim + radd + cadd_ref[0, :, lsl]

        # ONE exp pass serves both reductions: e = exp(sim - rowmax) feeds the
        # row sums directly, and rescaling rows by exp(rowmax - tilemax) turns
        # the same e into exp(sim - tilemax) for the column sums (2 exp + 2
        # max full-tile passes -> 1 + 1; the kernel is VPU-bound).
        tile_max = jnp.max(sim, axis=1, keepdims=True)  # [R, 1]
        e = jnp.exp(sim - tile_max)
        new_max = jnp.maximum(row_max, tile_max)
        row_sum = row_sum * jnp.exp(row_max - new_max) + jnp.sum(
            e, axis=1, keepdims=True
        ) * jnp.exp(tile_max - new_max)
        # column LSE contribution of this row tile, shifted by the tile max
        m_t = jnp.max(tile_max)  # scalar
        csum = jnp.sum(e * jnp.exp(tile_max - m_t), axis=0, keepdims=True)
        part = m_t + jnp.log(csum + 1e-30)  # [1, l_tile] partial LSE
        col_lse_ref[0, :, lsl] = jnp.logaddexp(col_lse_ref[0, :, lsl], part)
        return new_max, row_sum

    row_max0 = jnp.full((r, 1), _NEG, jnp.float32)
    row_sum0 = jnp.zeros((r, 1), jnp.float32)
    row_max, row_sum = jax.lax.fori_loop(0, n_lt, body, (row_max0, row_sum0))
    row_lse_ref[0, :, :] = row_max + jnp.log(row_sum + 1e-30)


# ------------------------- kernel 2: argmax pass ---------------------------


def _argmax_kernel(
    f0_ref,  # [1, R, C]
    f1_ref,  # [1, L, C]
    radd_ref,  # [1, R, 1]
    cadd_ref,  # [1, 1, L]
    row_lse_ref,  # [1, R, 1]
    col_lse_ref,  # [1, 1, L]
    row_val_ref,  # out [1, R, 1] max_l (2s - colLSE), one block per row tile
    row_j_ref,  # out [1, R, 1] int32 argmax
    col_val_ref,  # out [1, 1, L] max_p (2s - rowLSE), accumulated
    col_p_ref,  # out [1, 1, L] int32 argmax, accumulated
    *,
    l_tile: int,
    r_tile: int,
    inv_temp: float,
):
    # 2D-only orientation discipline: see _lse_kernel. Argmaxes are computed
    # as min-index-of-max via 2D iota (first index on ties, matching XLA).
    pt = pl.program_id(1)
    r = f0_ref.shape[1]
    l_total = f1_ref.shape[1]
    n_lt = l_total // l_tile

    f0 = f0_ref[0, :, :]
    radd = radd_ref[0, :, :]  # [R, 1]
    row_lse = row_lse_ref[0, :, :]  # [R, 1]

    @pl.when(pt == 0)
    def _():
        col_val_ref[:, :, :] = jnp.full_like(col_val_ref, _NEG)
        col_p_ref[:, :, :] = jnp.zeros_like(col_p_ref)

    big = jnp.int32(2**30)

    def body(lt, carry):
        best_val, best_j = carry  # [R, 1] each
        lsl = pl.ds(pl.multiple_of(lt * l_tile, l_tile), l_tile)
        f1_tile = f1_ref[0, lsl, :]
        sim = (
            jax.lax.dot_general(
                f0,
                f1_tile,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * inv_temp
        )
        sim = sim + radd + cadd_ref[0, :, lsl]
        two_s = 2.0 * sim

        # --- row argmax of (2s - colLSE[l])
        rscore = two_s - col_lse_ref[0, :, lsl]  # [R, l_tile]
        tile_best = jnp.max(rscore, axis=1, keepdims=True)  # [R, 1]
        ll = jax.lax.broadcasted_iota(jnp.int32, rscore.shape, 1)
        tile_j = jnp.min(
            jnp.where(rscore == tile_best, ll, big), axis=1, keepdims=True
        ) + lt * l_tile  # [R, 1]
        take = tile_best > best_val
        best_val = jnp.where(take, tile_best, best_val)
        best_j = jnp.where(take, tile_j, best_j)

        # --- col argmax of (2s - rowLSE[p]) over this row tile
        cscore = two_s - row_lse  # [R, l_tile]
        ctile_best = jnp.max(cscore, axis=0, keepdims=True)  # [1, l_tile]
        rr = jax.lax.broadcasted_iota(jnp.int32, cscore.shape, 0)
        ctile_p = jnp.min(
            jnp.where(cscore == ctile_best, rr, big), axis=0, keepdims=True
        ) + pt * r_tile  # [1, l_tile]
        old_val = col_val_ref[0, :, lsl]
        old_p = col_p_ref[0, :, lsl]
        ctake = ctile_best > old_val
        col_val_ref[0, :, lsl] = jnp.where(ctake, ctile_best, old_val)
        col_p_ref[0, :, lsl] = jnp.where(ctake, ctile_p, old_p)
        return best_val, best_j

    bv0 = jnp.full((r, 1), _NEG, jnp.float32)
    bj0 = jnp.zeros((r, 1), jnp.int32)
    best_val, best_j = jax.lax.fori_loop(0, n_lt, body, (bv0, bj0))
    row_val_ref[0, :, :] = best_val
    row_j_ref[0, :, :] = best_j


# ------------------------------ host wrapper -------------------------------


def _default_interpret() -> bool:
    return jax.default_backend() != "tpu"


def dual_softmax_rowcol_stats(
    feat0: jnp.ndarray,
    feat1: jnp.ndarray,
    temperature: float,
    row_add: Optional[jnp.ndarray] = None,
    col_add: Optional[jnp.ndarray] = None,
    r_tile: int = 512,
    l_tile: int = 1024,
    feat_norm: str = "sqrt_feat_dim",
    interpret: Optional[bool] = None,
):
    """Streaming dual-softmax statistics without materializing [P, L].

    Args:
        feat0: [B, P, C] row features (3D points).
        feat1: [B, L, C] column features (query grid cells).
        row_add / col_add: additive masks ([B, P] / [B, L]; -1e9 at invalid).
    Returns dict with row_lse [B, P], col_lse [B, L], row_best_val/j [B, P],
    col_best_val/p [B, L]; the confidence of row p's best match is
    ``exp(row_best_val - row_lse)``.
    """
    if interpret is None:
        interpret = _default_interpret()
    b, p, c = feat0.shape
    l = feat1.shape[1]
    if feat_norm == "sqrt_feat_dim":
        scale = 1.0 / (c**0.5)
        feat0 = feat0 * scale
        feat1 = feat1 * scale
    elif feat_norm not in ("none", None):
        raise ValueError(f"unknown feat_norm {feat_norm}")
    inv_temp = 1.0 / (temperature + 1e-4)

    r_tile = min(r_tile, _round_up(p, 128))
    l_tile = min(l_tile, _round_up(l, 128))
    p_pad = _round_up(p, r_tile)
    l_pad = _round_up(l, l_tile)
    f0 = jnp.zeros((b, p_pad, c), jnp.bfloat16).at[:, :p].set(
        feat0.astype(jnp.bfloat16)
    )
    f1 = jnp.zeros((b, l_pad, c), jnp.bfloat16).at[:, :l].set(
        feat1.astype(jnp.bfloat16)
    )
    # row vectors ride sublane-oriented as [B, P, 1] (tile-sized blocks), col
    # vectors lane-oriented as [B, 1, L] (full-length blocks, accumulated
    # across row tiles) — each quantity stays in the orientation its kernel
    # math produces, so Mosaic never relayouts across the sublane/lane axis
    radd = jnp.full((b, p_pad, 1), -1e9, jnp.float32)
    radd = radd.at[:, :p, 0].set(
        row_add if row_add is not None else jnp.zeros((b, p), jnp.float32)
    )
    cadd = jnp.full((b, 1, l_pad), -1e9, jnp.float32)
    cadd = cadd.at[:, 0, :l].set(
        col_add if col_add is not None else jnp.zeros((b, l), jnp.float32)
    )

    n_pt = p_pad // r_tile
    grid = (b, n_pt)
    row_specs = pl.BlockSpec(
        (1, r_tile, c), lambda bi, pt: (bi, pt, 0), memory_space=pltpu.VMEM
    )
    col_specs = pl.BlockSpec(
        (1, l_pad, c), lambda bi, pt: (bi, 0, 0), memory_space=pltpu.VMEM
    )
    rvec = pl.BlockSpec(
        (1, r_tile, 1), lambda bi, pt: (bi, pt, 0), memory_space=pltpu.VMEM
    )
    cvec = pl.BlockSpec(
        (1, 1, l_pad), lambda bi, pt: (bi, 0, 0), memory_space=pltpu.VMEM
    )

    row_lse, col_lse = pl.pallas_call(
        partial(_lse_kernel, l_tile=l_tile, r_tile=r_tile, inv_temp=inv_temp),
        grid=grid,
        in_specs=[row_specs, col_specs, rvec, cvec],
        out_specs=[rvec, cvec],
        out_shape=[
            jax.ShapeDtypeStruct((b, p_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, l_pad), jnp.float32),
        ],
        interpret=interpret,
    )(f0, f1, radd, cadd)

    row_val, row_j, col_val, col_p = pl.pallas_call(
        partial(_argmax_kernel, l_tile=l_tile, r_tile=r_tile, inv_temp=inv_temp),
        grid=grid,
        in_specs=[row_specs, col_specs, rvec, cvec, rvec, cvec],
        out_specs=[rvec, rvec, cvec, cvec],
        out_shape=[
            jax.ShapeDtypeStruct((b, p_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, p_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, l_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, l_pad), jnp.int32),
        ],
        interpret=interpret,
    )(f0, f1, radd, cadd, row_lse, col_lse)

    return {
        "row_lse": row_lse[:, :p, 0],
        "col_lse": col_lse[:, 0, :l],
        "row_best_val": row_val[:, :p, 0],
        "row_best_j": row_j[:, :p, 0],
        "col_best_val": col_val[:, 0, :l],
        "col_best_p": col_p[:, 0, :l],
    }


def fused_select_topk_matches(
    feat0: jnp.ndarray,
    feat1: jnp.ndarray,
    temperature: float,
    grid_hw: Tuple[int, int],
    thr: float,
    border_rm: int,
    k: int,
    border_two_sided: bool = False,
    row_grid_hw: Optional[Tuple[int, int]] = None,
    feat_norm: str = "sqrt_feat_dim",
    col_mask: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
) -> CoarseMatches:
    """Drop-in fused replacement for confidence-matrix + ``select_topk_matches``.

    Same output contract as ``ops.matching.select_topk_matches`` applied to
    ``dual_softmax_confidence(feat0, feat1, temperature)``.

    Border semantics: like the reference (``mask_border`` applied to the
    thresholded mask, ``coarse_matching.py:122-141``), border cells DO
    participate in the softmax normalization and in the mutual-NN argmaxes —
    a row whose best column lies in the border yields NO match (it is not
    rerouted to its second-best column). The border filter is applied to the
    final validity only.
    """
    b, p, _ = feat0.shape
    l = feat1.shape[1]
    h, w = grid_hw
    assert h * w == l, f"grid {grid_hw} != L {l}"

    # padding masks are PRE-softmax (-1e9 on the similarity), exactly like the
    # XLA path's mask handling in dual_softmax_confidence
    col_add = (
        jnp.where(col_mask.astype(bool), 0.0, -1e9) if col_mask is not None else None
    )
    stats = dual_softmax_rowcol_stats(
        feat0,
        feat1,
        temperature,
        col_add=col_add,
        feat_norm=feat_norm,
        interpret=interpret,
    )

    j_of_row = stats["row_best_j"]  # [B, P]
    # mutual: the best row of this row's best column is this row. The two
    # per-column lookups (best row id + border keep) ride one factorized
    # one-hot gather (ops.take.take_scalars; XLA's scalar gather is a ~6 ms
    # row loop at [48, 7000] on v5e) with both values packed into one int.
    col_keep = _border_keep(h, w, border_rm, border_two_sided)  # [L]
    packed = stats["col_best_p"] * 2 + jnp.broadcast_to(
        col_keep.astype(jnp.int32), stats["col_best_p"].shape
    )
    packed_at_j = take_scalars(packed, j_of_row)  # [B, P]
    mutual = (packed_at_j // 2) == jnp.arange(p)[None, :]
    keep_at_j = (packed_at_j % 2) == 1
    conf = jnp.exp(stats["row_best_val"] - stats["row_lse"])  # [B, P]

    valid = mutual & (conf > thr) & keep_at_j
    if row_grid_hw is not None:
        rh, rw = row_grid_hw
        assert rh * rw == p
        row_keep = _border_keep(rh, rw, border_rm, border_two_sided)
        valid = valid & row_keep[None, :]
    score = jnp.where(valid, conf, -1.0)

    k_eff = min(k, p)
    top_score, i_ids = jax.lax.top_k(score, k_eff)
    if k_eff < k:
        pad = k - k_eff
        top_score = jnp.pad(top_score, ((0, 0), (0, pad)), constant_values=-1.0)
        i_ids = jnp.pad(i_ids, ((0, 0), (0, pad)))
    j_ids = jnp.take_along_axis(j_of_row, i_ids, axis=1)
    mask = top_score > 0.0
    mconf = jnp.where(mask, top_score, 0.0)
    return CoarseMatches(
        i_ids.astype(jnp.int32), j_ids.astype(jnp.int32), mconf, mask
    )
