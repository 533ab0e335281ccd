"""Fused LoFTR encoder layer as Pallas TPU kernels.

One encoder layer (reference
``src/models/OnePosePlus/loftr_module/transformer.py:7-58``:
QKV projection -> elu+1 linear attention -> merge -> LayerNorm ->
concat-MLP FFN -> LayerNorm -> residual) is executed as TWO streaming
kernels instead of ~15 XLA ops:

- **Phase A** (``_kv_stats_kernel``): streams `source` tiles, projects K/V,
  applies the elu+1 feature map, and accumulates ``KVX = K'^T @ [V | 1s]``
  in a single MXU matmul per tile. The appended all-ones C-wide block makes
  the trailing C columns accumulate ``sum_s K'`` (the linear-attention
  normalizer) for free; head-block masks zero cross-head terms at the end so
  Phase B can consume ``KVX`` with one full-width matmul whose trailing C
  columns are already the per-lane denominators.
- **Phase B** (``_apply_kernel``): for each tile of `x`, computes the whole
  rest of the layer (Q proj, feature map, attention application + per-head
  normalization, merge, LayerNorm, concat-free FFN via split weights,
  LayerNorm, residual) entirely in VMEM. HBM traffic per tile is one read
  of `x` and one write of `y` — the XLA graph's ~10 full-stream
  elementwise/LayerNorm round-trips (the dominant cost of the coarse
  transformer, ~5 ms/layer-app at batch 48 on v5e) collapse into the
  matmul pipeline.

Math notes:
- The reference's 1/v_length value pre-scaling and trailing *v_length
  (``linear_attention.py:41-57``, an fp16-overflow guard) cancel exactly and
  are omitted; accumulation here is f32.
- Per-head attention contractions (head_dim 32) are MXU-hostile; instead the
  head-block-masked ``KVX`` turns them into full 256/384-wide matmuls (8x
  more MACs at ~8x better MXU utilization, bit-identical per-head results up
  to f32 summation order).
- Only the K' rows are validity/kv-masked: every KV and normalizer term
  carries a K' factor, so masking K' alone zeroes padded/masked rows
  (matches reference semantics where K and V are both masked).

Inference-only (no custom VJP); the XLA path in ``ops/attention.py`` remains
the training/backprop implementation.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-6


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _elu_p1(x: jnp.ndarray) -> jnp.ndarray:
    """elu(x) + 1 without expm1 (unsupported by the Mosaic TPU lowering):
    exactly where(x > 0, x + 1, exp(x)); the expm1+1 precision advantage is
    void since the reference adds 1 anyway."""
    return jnp.where(x > 0, x + 1.0, jnp.exp(x))


def _kv_stats_kernel(src_ref, wk_ref, wv_ref, smask_ref, kvx_ref, acc_ref, *,
                     s_actual: int, ts: int, nhead: int, c: int):
    # KVX layout: [C, 2C] — first C columns = head-block-masked K'^T V,
    # last C columns = per-head sum(K') replicated so that output lane c's
    # normalizer sits exactly at column C + c (no lane expansion needed).
    """Accumulate KVX = K'^T @ [V | ones] over source tiles."""
    s_idx = pl.program_id(1)
    n_s = pl.num_programs(1)

    @pl.when(s_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    src = src_ref[0].astype(jnp.bfloat16)  # [TS, C]
    k = jnp.dot(src, wk_ref[:], preferred_element_type=jnp.float32)
    kp = _elu_p1(k)  # [TS, C] f32
    # zero rows beyond the true source length (zero-padded rows would
    # otherwise contribute elu(0)+1 = 1 to the normalizer)
    row = jax.lax.broadcasted_iota(jnp.int32, (ts, 1), 0) + s_idx * ts
    kp = kp * (row < s_actual).astype(jnp.float32)
    if smask_ref is not None:
        # [TS, 1] sublane-oriented block (1D lane->sublane relayouts
        # miscompile under Mosaic; see ops/pallas_matching.py)
        kp = kp * smask_ref[0]
    v = jnp.dot(src, wv_ref[:], preferred_element_type=jnp.float32)
    vext = jnp.concatenate(
        [v, jnp.ones((ts, c), jnp.float32)], axis=1
    )  # [TS, 2C]
    acc_ref[:] += jax.lax.dot_general(
        kp.astype(jnp.bfloat16),
        vext.astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(s_idx == n_s - 1)
    def _():
        # head-block masks: KV part keeps same-head (d, v) pairs only; the
        # normalizer part keeps head h's sums in its own column block.
        hd = c // nhead
        r_ids = jax.lax.broadcasted_iota(jnp.int32, (c, 2 * c), 0)
        c_ids = jax.lax.broadcasted_iota(jnp.int32, (c, 2 * c), 1)
        kv_keep = ((r_ids // hd) == (c_ids // hd)).astype(jnp.float32)
        z_keep = ((r_ids // hd) == ((c_ids - c) // hd)).astype(jnp.float32)
        keep = jnp.where(c_ids < c, kv_keep, z_keep)
        kvx_ref[0] = acc_ref[:] * keep


def _apply_kernel(x_ref, kvx_ref, wq_ref, wm_ref, w0a_ref, w0b_ref, w1_ref,
                  ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref, qmask_ref, y_ref, *,
                  nhead: int, c: int):
    x32 = x_ref[0].astype(jnp.float32)  # [TL, C]
    xb = x32.astype(jnp.bfloat16)

    q = jnp.dot(xb, wq_ref[:], preferred_element_type=jnp.float32)
    qp = _elu_p1(q)
    if qmask_ref is not None:
        qp = qp * qmask_ref[0]  # [TL, 1] sublane-oriented block

    ext = jnp.dot(
        qp.astype(jnp.bfloat16), kvx_ref[0].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )  # [TL, 2C]
    num = ext[:, :c]
    den = ext[:, c:]  # [TL, C] — lane c's per-head normalizer (see Phase A)
    msg = num / (den + _EPS)

    m1 = jnp.dot(
        msg.astype(jnp.bfloat16), wm_ref[:], preferred_element_type=jnp.float32
    )
    mu = jnp.mean(m1, axis=1, keepdims=True)
    var = jnp.mean((m1 - mu) ** 2, axis=1, keepdims=True)
    h1 = (m1 - mu) * jax.lax.rsqrt(var + 1e-5) * ln1s_ref[:] + ln1b_ref[:]

    a = jnp.dot(xb, w0a_ref[:], preferred_element_type=jnp.float32) + jnp.dot(
        h1.astype(jnp.bfloat16), w0b_ref[:], preferred_element_type=jnp.float32
    )
    a = jnp.maximum(a, 0.0)
    b = jnp.dot(
        a.astype(jnp.bfloat16), w1_ref[:], preferred_element_type=jnp.float32
    )
    mu2 = jnp.mean(b, axis=1, keepdims=True)
    var2 = jnp.mean((b - mu2) ** 2, axis=1, keepdims=True)
    h2 = (b - mu2) * jax.lax.rsqrt(var2 + 1e-5) * ln2s_ref[:] + ln2b_ref[:]

    y_ref[0] = x32 + h2


@functools.partial(
    jax.jit, static_argnames=("nhead", "interpret", "tile_l", "tile_s")
)
def fused_encoder_layer(
    x: jnp.ndarray,
    source: jnp.ndarray,
    wq: jnp.ndarray,
    wk: jnp.ndarray,
    wv: jnp.ndarray,
    wmerge: jnp.ndarray,
    ln1_scale: jnp.ndarray,
    ln1_bias: jnp.ndarray,
    wmlp0: jnp.ndarray,
    wmlp1: jnp.ndarray,
    ln2_scale: jnp.ndarray,
    ln2_bias: jnp.ndarray,
    x_mask: Optional[jnp.ndarray] = None,
    source_mask: Optional[jnp.ndarray] = None,
    *,
    nhead: int = 8,
    interpret: bool = False,
    tile_l: int = 512,
    tile_s: int = 512,
) -> jnp.ndarray:
    """One fused LoFTR encoder layer: x attends to source.

    Args:
        x: [N, L, C]; source: [N, S, C] (any float dtype).
        wq/wk/wv/wmerge: [C, C] Dense kernels (flax [in, out] layout).
        ln*_scale/bias: [C] LayerNorm parameters.
        wmlp0: [2C, 2C] (concat([x, msg]) -> 2C); wmlp1: [2C, C].
        x_mask: optional [N, L] query validity; source_mask: optional [N, S].
    Returns:
        [N, L, C] float32 — matches the XLA layer within bf16-matmul tolerance.
    """
    n, l, c = x.shape
    s = source.shape[1]
    if c % 128 != 0 or c % nhead != 0 or (c // nhead) % 8 != 0:
        raise ValueError(f"unsupported dims C={c}, nhead={nhead}")
    # Mosaic kernels only compile for TPU; elsewhere (CPU tests, forced
    # fused_encoder=True off-TPU) fall back to the interpreter.
    interpret = interpret or jax.default_backend() != "tpu"

    ts = min(tile_s, _round_up(s, 8))
    tl = min(tile_l, _round_up(l, 8))
    s_pad = _round_up(s, ts)
    l_pad = _round_up(l, tl)
    src_p = jnp.pad(source, ((0, 0), (0, s_pad - s), (0, 0))) if s_pad != s else source
    x_p = jnp.pad(x, ((0, 0), (0, l_pad - l), (0, 0))) if l_pad != l else x

    bf = jnp.bfloat16
    f32 = jnp.float32

    # ---- Phase A: KVX stats over source tiles --------------------------
    a_in_specs = [
        pl.BlockSpec((1, ts, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    a_args = [src_p, wk.astype(bf), wv.astype(bf)]
    if source_mask is not None:
        sm = source_mask.astype(f32)
        sm = jnp.pad(sm, ((0, 0), (0, s_pad - s))) if s_pad != s else sm
        a_in_specs.append(
            pl.BlockSpec((1, ts, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
        )
        a_args.append(sm[:, :, None])
        a_kernel = functools.partial(
            _kv_stats_kernel, s_actual=s, ts=ts, nhead=nhead, c=c
        )
    else:
        a_kernel = functools.partial(
            lambda sr, wkr, wvr, kr, ar, **kw: _kv_stats_kernel(
                sr, wkr, wvr, None, kr, ar, **kw
            ),
            s_actual=s, ts=ts, nhead=nhead, c=c,
        )
    kvx = pl.pallas_call(
        a_kernel,
        grid=(n, s_pad // ts),
        in_specs=a_in_specs,
        out_specs=pl.BlockSpec(
            (1, c, 2 * c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, c, 2 * c), f32),
        scratch_shapes=[pltpu.VMEM((c, 2 * c), f32)],
        interpret=interpret,
    )(*a_args)

    # ---- Phase B: apply attention + merge + FFN per x tile -------------
    def w2(a):  # [C]-vector LayerNorm params as (1, C) VMEM blocks
        return a.astype(f32).reshape(1, c)

    b_in_specs = [
        pl.BlockSpec((1, tl, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c, 2 * c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, 2 * c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, 2 * c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * c, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    b_args = [
        x_p, kvx, wq.astype(bf), wmerge.astype(bf),
        wmlp0[:c].astype(bf), wmlp0[c:].astype(bf), wmlp1.astype(bf),
        w2(ln1_scale), w2(ln1_bias), w2(ln2_scale), w2(ln2_bias),
    ]
    if x_mask is not None:
        qm = x_mask.astype(f32)
        qm = jnp.pad(qm, ((0, 0), (0, l_pad - l))) if l_pad != l else qm
        b_in_specs.append(
            pl.BlockSpec((1, tl, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
        )
        b_args.append(qm[:, :, None])
        b_kernel = functools.partial(_apply_kernel, nhead=nhead, c=c)
    else:
        b_kernel = functools.partial(
            lambda xr, kr, wqr, wmr, w0ar, w0br, w1r, s1, b1, s2, b2, yr, **kw:
                _apply_kernel(xr, kr, wqr, wmr, w0ar, w0br, w1r, s1, b1, s2,
                              b2, None, yr, **kw),
            nhead=nhead, c=c,
        )
    y = pl.pallas_call(
        b_kernel,
        grid=(n, l_pad // tl),
        in_specs=b_in_specs,
        out_specs=pl.BlockSpec(
            (1, tl, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, l_pad, c), f32),
        interpret=interpret,
    )(*b_args)
    return y[:, :l] if l_pad != l else y
