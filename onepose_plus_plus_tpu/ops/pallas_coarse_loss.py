"""Fused dual-softmax focal loss — streaming Pallas kernels with custom VJP.

The XLA training path materializes the [B, P, L] confidence matrix for the
coarse focal loss (reference ``src/lightning_model/losses.py:18-56`` over the
dense ``conf_matrix``): similarity, two softmaxes, their product, focal
powers — and their backward duals. At the train config (B4 x P7000 x L4096,
f32) that is ~459 MB per instance and several HBM round trips per step.

This module computes the SAME scalar loss without ever materializing [P, L],
using the LSE factorization of the dual softmax (see ``pallas_matching``):

    log conf[p, l] = 2*s[p, l] - colLSE[l] - rowLSE[p]

Forward: the shared streaming LSE kernel (``pallas_matching._lse_kernel``)
produces rowLSE/colLSE, then one more streaming pass accumulates the
positive/negative focal sums per row. Backward is analytic: with
g[p,l] = dL/dconf * conf,

    dL/ds[p,l] = 2 g[p,l] - softmax_p(s)[p,l] * colsum_g[l]
                          - softmax_l(s)[p,l] * rowsum_g[p]

so one pass accumulates rowsum_g/colsum_g and a second recomputes the tiles
and contracts dL/ds against the features on the MXU (flash-attention-style
recompute-in-backward). Total: 4 similarity passes, O(P + L) intermediates.

Semantics match ``train.losses.coarse_focal_loss`` in its default log-space
form (positive focal term ``-alpha*(1-conf)^gamma*log_conf`` computed from
the LSE factorization directly — no 1e-6 clamp, so the positive gradient
survives arbitrarily diffuse confidences; see ``LossConfig.log_space``),
per-class count normalization over the whole batch, pos/neg class weights
scaling numerators only, at bf16 similarity precision (MXU matmuls, f32
accumulation — same as the fused inference matching kernels). The backward
passes work in d/d(log conf) throughout: with g[p,l] = dL/dlogconf[p,l]
(== dL/dconf * conf), the dsim identity above holds unchanged.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_matching import _lse_kernel, _round_up

# upper cap on log conf: keeps the negative term's log1p finite and the
# positive term non-negative (conf <= 1 - ~1e-6); no LOWER clamp anywhere —
# that is the whole point (see train.losses.LossConfig.log_space)
_LOGCAP = -1e-6


def _focal_terms(conf, logconf, gamma: float):
    """(pos_term, neg_term) of the log-space focal BCE.

    gamma == 2 avoids the transcendental pow lowering (the kernels are
    VPU-bound; exp/log already dominate).
    """
    one_m = 1.0 - conf
    if gamma == 2.0:
        pg, ng = one_m * one_m, conf * conf
    else:
        pg, ng = one_m**gamma, conf**gamma
    pos = -pg * logconf
    neg = -ng * jnp.log1p(-conf)
    return pos, neg


def _focal_dterms(conf, logconf, gamma: float):
    """d/d(log conf) of the (unweighted) focal terms.

    pos(x) = -(1-e^x)^g * x, neg(x) = -e^(gx) * log1p(-e^x) at x = log conf.
    Bounded as conf -> 0 (dpos -> -1, dneg -> 0): gradient never dies at the
    diffuse end. The ~1e-6 cap on x bounds the 1/(1-conf) blow-up at the
    confident end to ~1e6 before count normalization.
    """
    one_m = 1.0 - conf
    if gamma == 2.0:
        pgm1, ngm1 = one_m, conf  # x^(gamma-1)
        pg, ng = one_m * one_m, conf * conf
    else:
        pgm1, ngm1 = one_m ** (gamma - 1.0), conf ** (gamma - 1.0)
        pg, ng = pgm1 * one_m, ngm1 * conf
    dpos = gamma * conf * pgm1 * logconf - pg
    dneg = gamma * ng * (-jnp.log1p(-conf)) + ng * conf / one_m
    return dpos, dneg


def _tile_common(
    f0, f1_ref, radd, cadd_ref, row_lse, col_lse_ref, lt, l_tile, inv_temp
):
    """Recompute one [R, l_tile] tile: similarity, log-confidence, confidence."""
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
    logconf = jnp.minimum(2.0 * sim - col_lse_ref[0, :, lsl] - row_lse, _LOGCAP)
    conf = jnp.exp(logconf)
    return lsl, f1_tile, sim, logconf, conf


def _tile_g(conf, logconf, gt, ll, valid, pos_coef, neg_coef, gamma):
    """g = dL/d(log conf) for one tile (cotangent-scaled class coefs)."""
    is_pos = (gt == ll) & valid
    dpos, dneg = _focal_dterms(conf, logconf, gamma)
    g = jnp.where(
        is_pos, pos_coef * dpos, jnp.where(valid, neg_coef * dneg, 0.0)
    )
    # where the forward's _LOGCAP clamp is active (conf >= 1 - ~1e-6) the
    # capped forward is constant in sim, so the true derivative is 0 — the
    # dense path's autodiff through jnp.minimum yields exactly that. Without
    # this the uncapped chain rule injects the ~conf/(1-conf) ~ 1e6-scale
    # dneg term at saturated cells and fused/XLA gradients diverge
    # (round-3 advisor finding).
    return jnp.where(logconf >= _LOGCAP, 0.0, g)


# --------------------------- forward: loss sums -----------------------------


def _loss_kernel(
    f0_ref,  # [1, R, C]
    f1_ref,  # [1, L, C]
    radd_ref,  # [1, R, 1]
    cadd_ref,  # [1, 1, L]
    row_lse_ref,  # [1, R, 1]
    col_lse_ref,  # [1, 1, L]
    gt_ref,  # [1, R, 1] int32 GT column (cell) per row, -1/-2 = none
    pos_ref,  # out [1, R, 1] per-row positive focal sum (already * alpha)
    neg_ref,  # out [1, R, 1] per-row negative focal sum (already * 1-alpha)
    mx_ref,  # out [1, R, 1] per-row max confidence (TB `max_conf` scalar)
    *,
    l_tile: int,
    inv_temp: float,
    alpha: float,
    gamma: float,
):
    # 2D-only orientation discipline (see pallas_matching._lse_kernel).
    r = f0_ref.shape[1]
    n_lt = f1_ref.shape[1] // l_tile
    f0 = f0_ref[0, :, :]
    radd = radd_ref[0, :, :]
    row_lse = row_lse_ref[0, :, :]
    gt = gt_ref[0, :, :]  # [R, 1]
    row_valid = radd > -1.0  # [R, 1]

    def body(lt, carry):
        pos_sum, neg_sum, mx = carry
        lsl, _f1, _sim, logconf, conf = _tile_common(
            f0, f1_ref, radd, cadd_ref, row_lse, col_lse_ref, lt, l_tile, inv_temp
        )
        valid = row_valid & (cadd_ref[0, :, lsl] > -1.0)  # [R, l_tile]
        ll = jax.lax.broadcasted_iota(jnp.int32, conf.shape, 1) + lt * l_tile
        is_pos = (gt == ll) & valid
        pos_t, neg_t = _focal_terms(conf, logconf, gamma)
        pos_sum = pos_sum + jnp.sum(
            jnp.where(is_pos, pos_t, 0.0), axis=1, keepdims=True
        )
        neg_sum = neg_sum + jnp.sum(
            jnp.where(valid & jnp.logical_not(is_pos), neg_t, 0.0),
            axis=1,
            keepdims=True,
        )
        mx = jnp.maximum(
            mx, jnp.max(jnp.where(valid, conf, 0.0), axis=1, keepdims=True)
        )
        return pos_sum, neg_sum, mx

    z = jnp.zeros((r, 1), jnp.float32)
    pos_sum, neg_sum, mx = jax.lax.fori_loop(0, n_lt, body, (z, z, z))
    pos_ref[0, :, :] = alpha * pos_sum
    neg_ref[0, :, :] = (1.0 - alpha) * neg_sum
    mx_ref[0, :, :] = mx


# ------------------------ backward pass 1: g sums ---------------------------


def _gsum_kernel(
    f0_ref,
    f1_ref,
    radd_ref,
    cadd_ref,
    row_lse_ref,
    col_lse_ref,
    gt_ref,
    coef_ref,  # [1, 1, 2] cotangent-scaled (pos_coef, neg_coef)
    rowg_ref,  # out [1, R, 1]
    colg_ref,  # out [1, 1, L] accumulated over row tiles
    *,
    l_tile: int,
    inv_temp: float,
    alpha: float,
    gamma: float,
):
    pt = pl.program_id(1)
    r = f0_ref.shape[1]
    n_lt = f1_ref.shape[1] // l_tile
    f0 = f0_ref[0, :, :]
    radd = radd_ref[0, :, :]
    row_lse = row_lse_ref[0, :, :]
    gt = gt_ref[0, :, :]
    row_valid = radd > -1.0
    pos_coef = coef_ref[0, 0, 0] * alpha
    neg_coef = coef_ref[0, 0, 1] * (1.0 - alpha)

    @pl.when(pt == 0)
    def _():
        colg_ref[:, :, :] = jnp.zeros_like(colg_ref)

    def body(lt, rowg):
        lsl, _f1, _sim, logconf, conf = _tile_common(
            f0, f1_ref, radd, cadd_ref, row_lse, col_lse_ref, lt, l_tile, inv_temp
        )
        valid = row_valid & (cadd_ref[0, :, lsl] > -1.0)
        ll = jax.lax.broadcasted_iota(jnp.int32, conf.shape, 1) + lt * l_tile
        g = _tile_g(conf, logconf, gt, ll, valid, pos_coef, neg_coef, gamma)
        rowg = rowg + jnp.sum(g, axis=1, keepdims=True)
        colg_ref[0, :, lsl] = colg_ref[0, :, lsl] + jnp.sum(
            g, axis=0, keepdims=True
        )
        return rowg

    rowg = jax.lax.fori_loop(0, n_lt, body, jnp.zeros((r, 1), jnp.float32))
    rowg_ref[0, :, :] = rowg


# --------------------- backward pass 2: feature grads -----------------------


def _dfeat_kernel(
    f0_ref,
    f1_ref,
    radd_ref,
    cadd_ref,
    row_lse_ref,
    col_lse_ref,
    gt_ref,
    coef_ref,
    rowg_ref,  # [1, R, 1]
    colg_ref,  # [1, 1, L]
    df0_ref,  # out [1, R, C] f32
    df1_ref,  # out [1, L, C] f32, accumulated over row tiles
    *,
    l_tile: int,
    inv_temp: float,
    alpha: float,
    gamma: float,
):
    pt = pl.program_id(1)
    r = f0_ref.shape[1]
    c = f0_ref.shape[2]
    n_lt = f1_ref.shape[1] // l_tile
    f0 = f0_ref[0, :, :]
    radd = radd_ref[0, :, :]
    row_lse = row_lse_ref[0, :, :]
    gt = gt_ref[0, :, :]
    rowg = rowg_ref[0, :, :]
    row_valid = radd > -1.0
    pos_coef = coef_ref[0, 0, 0] * alpha
    neg_coef = coef_ref[0, 0, 1] * (1.0 - alpha)

    @pl.when(pt == 0)
    def _():
        df1_ref[:, :, :] = jnp.zeros_like(df1_ref)

    def body(lt, df0):
        lsl, f1_tile, sim, logconf, conf = _tile_common(
            f0, f1_ref, radd, cadd_ref, row_lse, col_lse_ref, lt, l_tile, inv_temp
        )
        valid = row_valid & (cadd_ref[0, :, lsl] > -1.0)
        ll = jax.lax.broadcasted_iota(jnp.int32, conf.shape, 1) + lt * l_tile
        g = _tile_g(conf, logconf, gt, ll, valid, pos_coef, neg_coef, gamma)
        # softmax over rows (p, given l) and over cols (l, given p); padded
        # entries carry sim ~ -1e9 below every LSE -> exp underflows to 0
        sm_p = jnp.exp(sim - col_lse_ref[0, :, lsl])
        sm_l = jnp.exp(sim - row_lse)
        dsim = (
            2.0 * g - sm_p * colg_ref[0, :, lsl] - sm_l * rowg
        ) * inv_temp  # [R, l_tile]
        ds16 = dsim.astype(jnp.bfloat16)
        df0 = df0 + jax.lax.dot_general(
            ds16,
            f1_tile,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        df1_ref[0, lsl, :] = df1_ref[0, lsl, :] + jax.lax.dot_general(
            ds16,
            f0,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return df0

    df0 = jax.lax.fori_loop(0, n_lt, body, jnp.zeros((r, c), jnp.float32))
    df0_ref[0, :, :] = df0


# ------------------------------ host wrappers -------------------------------


def _default_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _specs(b, p_pad, l_pad, c, r_tile):
    row_feat = pl.BlockSpec(
        (1, r_tile, c), lambda bi, pt: (bi, pt, 0), memory_space=pltpu.VMEM
    )
    col_feat = pl.BlockSpec(
        (1, l_pad, c), lambda bi, pt: (bi, 0, 0), memory_space=pltpu.VMEM
    )
    rvec = pl.BlockSpec(
        (1, r_tile, 1), lambda bi, pt: (bi, pt, 0), memory_space=pltpu.VMEM
    )
    cvec = pl.BlockSpec(
        (1, 1, l_pad), lambda bi, pt: (bi, 0, 0), memory_space=pltpu.VMEM
    )
    return row_feat, col_feat, rvec, cvec


# The core operates on pre-padded/scaled bf16 features so the VJP residuals
# are plain arrays; the outer wrapper's prep (pad + scale + cast) chains
# through ordinary autodiff. Returns RAW class sums — the count normalization
# happens outside, so its cotangents arrive pre-scaled per class.
@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _core(f0, f1, radd, cadd, gt, inv_temp, alpha, gamma, r_tile, l_tile, interpret):
    out, _ = _core_fwd(
        f0, f1, radd, cadd, gt, inv_temp, alpha, gamma, r_tile, l_tile, interpret
    )
    return out


def _core_fwd(
    f0, f1, radd, cadd, gt, inv_temp, alpha, gamma, r_tile, l_tile, interpret
):
    b, p_pad, c = f0.shape
    l_pad = f1.shape[1]
    row_feat, col_feat, rvec, cvec = _specs(b, p_pad, l_pad, c, r_tile)
    grid = (b, p_pad // r_tile)
    row_lse, col_lse = pl.pallas_call(
        partial(_lse_kernel, l_tile=l_tile, r_tile=r_tile, inv_temp=inv_temp),
        grid=grid,
        in_specs=[row_feat, col_feat, rvec, cvec],
        out_specs=[rvec, cvec],
        out_shape=[
            jax.ShapeDtypeStruct((b, p_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, l_pad), jnp.float32),
        ],
        interpret=interpret,
    )(f0, f1, radd, cadd)

    pos_s, neg_s, mx = pl.pallas_call(
        partial(
            _loss_kernel, l_tile=l_tile, inv_temp=inv_temp, alpha=alpha,
            gamma=gamma,
        ),
        grid=grid,
        in_specs=[row_feat, col_feat, rvec, cvec, rvec, cvec, rvec],
        out_specs=[rvec, rvec, rvec],
        out_shape=[
            jax.ShapeDtypeStruct((b, p_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, p_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, p_pad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(f0, f1, radd, cadd, row_lse, col_lse, gt)

    out = (jnp.sum(pos_s), jnp.sum(neg_s), jnp.max(mx))
    return out, (f0, f1, radd, cadd, gt, row_lse, col_lse)


def _core_bwd(inv_temp, alpha, gamma, r_tile, l_tile, interpret, res, cts):
    f0, f1, radd, cadd, gt, row_lse, col_lse = res
    ct_pos, ct_neg, _ct_mx = cts  # max_conf is a non-differentiable aux
    b, p_pad, c = f0.shape
    l_pad = f1.shape[1]
    coef = jnp.broadcast_to(
        jnp.stack([ct_pos, ct_neg]).astype(jnp.float32).reshape(1, 1, 2),
        (b, 1, 2),
    )
    row_feat, col_feat, rvec, cvec = _specs(b, p_pad, l_pad, c, r_tile)
    # scalars ride SMEM — a (1, 1, 2) VMEM tile is far below the minimum
    # (8, 128) lane tile and is exactly the odd-layout class Mosaic has
    # miscompiled before (round-2 1D-relayout bug family)
    coefspec = pl.BlockSpec(
        (1, 1, 2), lambda bi, pt: (bi, 0, 0), memory_space=pltpu.SMEM
    )
    grid = (b, p_pad // r_tile)
    kw = dict(l_tile=l_tile, inv_temp=inv_temp, alpha=alpha, gamma=gamma)
    # the recompute-in-backward kernels keep the full f1 block plus several
    # [r_tile, l_tile] f32 intermediates live; at the production train config
    # (P7168 x L4096 x C256, 512^2 tiles) that lands ~1 MB over Mosaic's
    # default 16 MB scoped-vmem budget — raise the per-kernel limit (v5e has
    # 128 MB VMEM; actual use is ~17-20 MB)
    bwd_params = pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024)
    rowg, colg = pl.pallas_call(
        partial(_gsum_kernel, **kw),
        grid=grid,
        in_specs=[row_feat, col_feat, rvec, cvec, rvec, cvec, rvec, coefspec],
        out_specs=[rvec, cvec],
        out_shape=[
            jax.ShapeDtypeStruct((b, p_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, l_pad), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=bwd_params,
    )(f0, f1, radd, cadd, row_lse, col_lse, gt, coef)

    df0, df1 = pl.pallas_call(
        partial(_dfeat_kernel, **kw),
        grid=grid,
        in_specs=[
            row_feat, col_feat, rvec, cvec, rvec, cvec, rvec, coefspec,
            rvec, cvec,
        ],
        out_specs=[
            pl.BlockSpec(
                (1, r_tile, c), lambda bi, pt: (bi, pt, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, l_pad, c), lambda bi, pt: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, p_pad, c), jnp.float32),
            jax.ShapeDtypeStruct((b, l_pad, c), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=bwd_params,
    )(f0, f1, radd, cadd, row_lse, col_lse, gt, coef, rowg, colg)

    return (
        df0.astype(f0.dtype),
        df1.astype(f1.dtype),
        jnp.zeros_like(radd),
        jnp.zeros_like(cadd),
        np.zeros(gt.shape, jax.dtypes.float0),
    )


_core.defvjp(_core_fwd, _core_bwd)


def fused_coarse_focal_loss(
    feat0: jnp.ndarray,
    feat1: jnp.ndarray,
    gt_cell: jnp.ndarray,
    temperature: float,
    alpha: float = 0.5,
    gamma: float = 2.0,
    pos_weight: float = 1.0,
    neg_weight: float = 1.0,
    feat_norm: str = "sqrt_feat_dim",
    tiles: Tuple[int, int] = (512, 512),
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(loss, max_conf) of the dual-softmax focal BCE, never building [P, L].

    Drop-in for ``coarse_focal_loss(dual_softmax_confidence(feat0, feat1, T),
    gt_cell, cfg)`` + ``max(conf)`` (c_weight unsupported — the production
    pipeline runs fixed shapes without padding masks). Differentiable in
    feat0/feat1 via the analytic streaming backward; max_conf is aux.

    Args:
        feat0: [B, P, C] 3D-point features (post coarse transformer).
        feat1: [B, L, C] query grid features.
        gt_cell: [B, P] int32 GT cell per point, -1 = unmatched (negative row).
    """
    if interpret is None:
        interpret = _default_interpret()
    b, p, c = feat0.shape
    l = feat1.shape[1]
    if feat_norm == "sqrt_feat_dim":
        scale = 1.0 / (c**0.5)
    elif feat_norm in ("none", None):
        scale = 1.0
    else:
        raise ValueError(f"unknown feat_norm {feat_norm}")
    inv_temp = 1.0 / (temperature + 1e-4)
    r_tile = min(tiles[0], _round_up(p, 128))
    l_tile = min(tiles[1], _round_up(l, 128))
    p_pad = _round_up(p, r_tile)
    l_pad = _round_up(l, l_tile)

    f0 = jnp.zeros((b, p_pad, c), jnp.bfloat16).at[:, :p].set(
        (feat0 * scale).astype(jnp.bfloat16)
    )
    f1 = jnp.zeros((b, l_pad, c), jnp.bfloat16).at[:, :l].set(
        (feat1 * scale).astype(jnp.bfloat16)
    )
    radd = jnp.full((b, p_pad, 1), -1e9, jnp.float32).at[:, :p, 0].set(0.0)
    cadd = jnp.full((b, 1, l_pad), -1e9, jnp.float32).at[:, 0, :l].set(0.0)
    gt = jnp.full((b, p_pad, 1), -2, jnp.int32).at[:, :p, 0].set(
        gt_cell.astype(jnp.int32)
    )

    pos_sum, neg_sum, mx = _core(
        f0, f1, radd, cadd, gt, inv_temp, alpha, gamma, r_tile, l_tile, interpret
    )
    n_pos = jnp.sum(gt_cell >= 0)
    n_neg = b * p * l - n_pos
    loss = pos_weight * pos_sum / jnp.maximum(n_pos, 1) + neg_weight * (
        neg_sum / jnp.maximum(n_neg, 1)
    )
    return loss, jax.lax.stop_gradient(mx)
