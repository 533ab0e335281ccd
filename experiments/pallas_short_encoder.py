"""DEMOTED EXPERIMENT (round 3) — kept for documentation only, not part of
the package. Batched-short-sequence fused encoder kernel: measured 23.4 ms
vs XLA 8.9 ms for the fine transformer at [24576, 25, 128] on v5e (the
~12k-step Pallas grid launch overhead swamps the fusion win), so the
production path keeps XLA for short sequences (models/transformer.py).
Not imported anywhere; no tests run against it."""
"""Fused LoFTR encoder layer for BATCHED SHORT sequences (Pallas TPU).

The fine stage runs the encoder over ~24k independent 25-token windows
(reference ``src/models/OnePosePlus/loftr_module/fine_preprocess.py`` feeds
``transformer.py:7-58`` with [N*K, W*W, C] streams). The long-sequence fused
kernel (``ops/pallas_encoder.py``) tiles 512-row blocks of ONE sequence and
keeps a per-sequence [C, 2C] KV state — useless here, where each sequence is
25 rows and the per-sequence states would be 24k tiny MXU-hostile matmuls.
The XLA path costs ~27 ms/step at the flagship config (batch 48) on v5e,
~4x its roofline, in small-op overheads and [N, S, H, D] relayouts.

This kernel instead processes B sequences per grid step with the QUADRATIC
association order — exact for linear attention by associativity:

    out_h = Q'_h (K'_h^T V_h) = (Q'_h K'_h^T) V_h,  normalizer = rowsum(A_h)

and computes ALL heads' [L, S] score blocks in ONE full-width matmul by
expanding queries into disjoint head-rows (row (l, h) of Qx carries Q'[l]
masked to head h's 16 lanes, so Qx @ K'^T contracts the full C=128 width and
lands A_h at row (l, h)). Sequence isolation is a 2D iota block mask. Every
operand is 2D ([rows, C] / [rows, rows']): the [M, L, C] inputs are reshaped
to [M*L, C] row-major OUTSIDE the kernel (free), sidestepping the Mosaic
1D/3D relayout miscompiles documented in ``ops/pallas_matching.py``.

Inference-only (no custom VJP); ``ops/attention.py`` remains the
training/backprop path. Only the no-mask form is supported (the fine stage
carries no masks; padded match slots flow through as zero windows and are
masked downstream, reference ``OnePosePlusModel.py:179-201``).

MEASURED NEGATIVE RESULT (v5e, batch 48, [24576, 25, 128]): this kernel runs
the full fine transformer in 23.4 ms vs XLA's 8.9 ms — ~12k grid steps of
launch overhead swamp the fusion win at 8-sequence blocks, and XLA's own
fusion already keeps the short-seq path near its roofline. It is therefore
NOT auto-routed (``models/transformer.py`` auto picks XLA for short seqs);
it remains available via explicit ``fused_encoder=True`` and is kept
compiled-parity-tested (tests/test_tpu_compiled.py) as the reference
implementation of exact short-seq linear attention in quadratic form.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-6


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _elu_p1(x: jnp.ndarray) -> jnp.ndarray:
    # exactly elu(x) + 1 (expm1 is unsupported by the Mosaic lowering)
    return jnp.where(x > 0, x + 1.0, jnp.exp(x))


def _short_kernel(x_ref, src_ref, wq_ref, wk_ref, wv_ref, wm_ref,
                  w0a_ref, w0b_ref, w1_ref, ln1s_ref, ln1b_ref, ln2s_ref,
                  ln2b_ref, y_ref, *, b: int, l: int, s: int, nhead: int,
                  c: int):
    """One grid step: B sequences, x [B*L, C] attends to source [B*S, C]."""
    hd = c // nhead
    bl, bs, blh = b * l, b * s, b * l * nhead

    x32 = x_ref[:].astype(jnp.float32)  # [BL, C]
    xb = x32.astype(jnp.bfloat16)
    sb = src_ref[:].astype(jnp.bfloat16)  # [BS, C]

    qp = _elu_p1(jnp.dot(xb, wq_ref[:], preferred_element_type=jnp.float32))
    kp = _elu_p1(jnp.dot(sb, wk_ref[:], preferred_element_type=jnp.float32))
    v = jnp.dot(sb, wv_ref[:], preferred_element_type=jnp.float32)  # [BS, C]

    # ---- head-row expansion: Qx[(i, h), :] = Q'[i] on head h's lanes ----
    # replicate rows via a 0/1 matmul (no gather/reshape relayouts), then
    # mask lanes per head. Row order: (i, h) with h minor.
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (blh, bl), 0)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (blh, bl), 1)
    rep = (r_ids // nhead == c_ids).astype(jnp.bfloat16)  # [BLH, BL]
    qx = jnp.dot(rep, qp.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    rh = jax.lax.broadcasted_iota(jnp.int32, (blh, c), 0)
    ch = jax.lax.broadcasted_iota(jnp.int32, (blh, c), 1)
    qx = qx * (rh % nhead == ch // hd).astype(jnp.float32)  # [BLH, C]

    # ---- per-head scores: A[(i, h), j] = Q'_h[i] . K'_h[j] --------------
    a = jax.lax.dot_general(
        qx.astype(jnp.bfloat16), kp.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BLH, BS]
    # sequence isolation: query row (i, h) may only see source rows of the
    # same sequence: (i // L) == (j // S)
    ra = jax.lax.broadcasted_iota(jnp.int32, (blh, bs), 0)
    ca = jax.lax.broadcasted_iota(jnp.int32, (blh, bs), 1)
    a = a * (ra // (l * nhead) == ca // s).astype(jnp.float32)

    z = jnp.sum(a, axis=1, keepdims=True)  # [BLH, 1] = Q'_h . sum K'_h
    num = jax.lax.dot_general(
        a.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BLH, C]; only head-h lanes of row (i, h) are meaningful
    norm = num / (z + _EPS)
    norm = norm * (rh % nhead == ch // hd).astype(jnp.float32)
    # collapse heads back to [BL, C]: disjoint lane supports, so a 0/1 sum
    # matmul assembles the full-width message exactly (built with its own
    # iotas — transposing the rep matrix would be a relayout)
    cr = jax.lax.broadcasted_iota(jnp.int32, (bl, blh), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (bl, blh), 1)
    col = (cc // nhead == cr).astype(jnp.bfloat16)  # [BL, BLH]
    msg = jnp.dot(col, norm.astype(jnp.bfloat16), preferred_element_type=jnp.float32)

    # ---- merge + LN + concat-FFN + LN + residual (as pallas_encoder) ----
    m1 = jnp.dot(
        msg.astype(jnp.bfloat16), wm_ref[:], preferred_element_type=jnp.float32
    )
    mu = jnp.mean(m1, axis=1, keepdims=True)
    var = jnp.mean((m1 - mu) ** 2, axis=1, keepdims=True)
    h1 = (m1 - mu) * jax.lax.rsqrt(var + 1e-5) * ln1s_ref[:] + ln1b_ref[:]

    ffn = jnp.dot(xb, w0a_ref[:], preferred_element_type=jnp.float32) + jnp.dot(
        h1.astype(jnp.bfloat16), w0b_ref[:], preferred_element_type=jnp.float32
    )
    ffn = jnp.maximum(ffn, 0.0)
    out = jnp.dot(
        ffn.astype(jnp.bfloat16), w1_ref[:], preferred_element_type=jnp.float32
    )
    mu2 = jnp.mean(out, axis=1, keepdims=True)
    var2 = jnp.mean((out - mu2) ** 2, axis=1, keepdims=True)
    h2 = (out - mu2) * jax.lax.rsqrt(var2 + 1e-5) * ln2s_ref[:] + ln2b_ref[:]

    y_ref[:] = x32 + h2


@functools.partial(
    jax.jit, static_argnames=("nhead", "interpret", "block_rows")
)
def fused_short_encoder_layer(
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
    *,
    nhead: int = 8,
    interpret: bool = False,
    block_rows: int = 256,
) -> jnp.ndarray:
    """One fused encoder layer over M independent short sequences.

    Args:
        x: [M, L, C] queries; source: [M, S, C]. L, S small (<= ~128).
        weights: flax [in, out] Dense kernels / [C] LayerNorm params, same
            tree as ``LoFTREncoderLayer``.
    Returns:
        [M, L, C] float32, matching the XLA layer within bf16 tolerance.
    """
    m, l, c = x.shape
    s = source.shape[1]
    if c % 128 != 0 or c % nhead != 0:
        raise ValueError(f"unsupported dims C={c}, nhead={nhead}")
    interpret = interpret or jax.default_backend() != "tpu"

    # B sequences per block, sized so the score matrix stays VMEM-small and
    # forced to a multiple of 8 so every row-block dimension (B*L, B*S,
    # B*L*H) is sublane-aligned (Mosaic miscompiles odd-shaped relayouts at
    # multi-tile shapes; see ops/pallas_matching.py)
    b = max(8, (block_rows // max(l, s)) // 8 * 8)
    # score matrix A is [B*L*H, B*S] f32 — refuse configurations that would
    # not fit the ~16 MB VMEM alongside operands (callers fall back to XLA)
    if (b * l * nhead) * (b * s) * 4 > 6 * 1024 * 1024:
        raise ValueError(
            f"short-encoder block does not fit VMEM: L={l}, S={s}, B={b}"
        )
    m_pad = _round_up(m, b)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0), (0, 0)))
        source = jnp.pad(source, ((0, m_pad - m), (0, 0), (0, 0)))
    x2 = x.reshape(m_pad * l, c)
    s2 = source.reshape(m_pad * s, c)

    bf = jnp.bfloat16
    f32 = jnp.float32

    def w2(a):
        return a.astype(f32).reshape(1, c)

    grid = (m_pad // b,)
    y = pl.pallas_call(
        functools.partial(_short_kernel, b=b, l=l, s=s, nhead=nhead, c=c),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b * l, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b * s, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 2 * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 2 * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (b * l, c), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad * l, c), f32),
        interpret=interpret,
    )(
        x2, s2, wq.astype(bf), wk.astype(bf), wv.astype(bf),
        wmerge.astype(bf), wmlp0[:c].astype(bf), wmlp0[c:].astype(bf),
        wmlp1.astype(bf), w2(ln1_scale), w2(ln1_bias), w2(ln2_scale),
        w2(ln2_bias),
    )
    y = y.reshape(m_pad, l, c)
    return y[:m] if m_pad != m else y
