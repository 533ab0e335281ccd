"""Window/patch gathering by direct DMA — Pallas TPU kernel.

The one-hot-matmul gather (``ops/pallas_gather.py``) selects rows by streaming
the WHOLE source through the MXU against register-generated 0/1 tiles. Its
cost therefore scales with ``K x (grid rows) x (row payload)`` — fine for the
5x5/128-ch fine windows (~12 ms at flagship shapes on v5e), but quadratically
worse for larger halo patches (a 9x9/196-ch gather would burn ~6 TFLOP of
selection matmuls, more than the convs it feeds).

This kernel instead issues ONE async copy per patch: the feature map stays in
HBM (``memory_space=ANY``), patch top-left corners arrive via scalar
prefetch, and each grid step DMAs a block of ``[W, W*C]`` strided slices
straight into the output tile. Cost scales with the number of patches (DMA
issue rate on the scalar core) and the payload bytes — independent of window
area beyond bandwidth, so 9x9 halo patches cost the same issue overhead as
5x5 windows.

Zero out-of-bounds semantics (reference ``fine_preprocess.py`` zero padding,
``F.unfold(padding=W//2)``) come from gathering out of a zero-padded map: the
wrapper pads by W on every side, shifts the corners, and points INVALID
patches (negative corners, e.g. padded match slots) at the all-zero top-left
pad band.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(row0_ref, coloff_ref, feat_ref, out_ref, sems, *, bk: int, w: int):
    n = pl.program_id(0)
    kb = pl.program_id(1)
    k0 = kb * bk
    dmas = []
    for b in range(bk):
        r0 = row0_ref[n, k0 + b]
        c0 = coloff_ref[n, k0 + b]
        dmas.append(
            pltpu.make_async_copy(
                feat_ref.at[n].at[pl.ds(r0, w), pl.ds(c0, out_ref.shape[-1])],
                out_ref.at[0, b],
                sems.at[b],
            )
        )
        dmas[-1].start()
    for dma in dmas:
        dma.wait()


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("window", "interpret", "block_k"))
def gather_patches_dma(
    feat: jnp.ndarray,
    row0: jnp.ndarray,
    col0: jnp.ndarray,
    window: int,
    *,
    interpret: bool = False,
    block_k: int = 128,
) -> jnp.ndarray:
    """Gather K ``window x window`` patches per image by top-left corner.

    Args:
        feat: [N, H, W, C] feature map.
        row0/col0: [N, K] int32 patch top-left corners, in UNPADDED map
            coordinates; may be negative or reach past the border — taps
            outside the map read as zero. Fully out-of-range corners (e.g.
            ``row0 <= -window`` from invalid match slots) yield all-zero
            patches.
        window: patch side W.
    Returns:
        [N, K, W*W, C] patches (feat dtype).
    """
    n, h, wdim, c = feat.shape
    k = row0.shape[1]
    interpret = interpret or jax.default_backend() != "tpu"

    fp = jnp.pad(feat, ((0, 0), (window, window), (window, window), (0, 0)))
    hp, wp = h + 2 * window, wdim + 2 * window
    # corners shifted into the padded frame; anything still out of range is
    # an invalid slot -> read the all-zero [0:W, 0:W] pad corner
    r = row0.astype(jnp.int32) + window
    cc = col0.astype(jnp.int32) + window
    valid = (r >= 0) & (r <= hp - window) & (cc >= 0) & (cc <= wp - window)
    r = jnp.where(valid, r, 0)
    cc = jnp.where(valid, cc, 0) * c  # minor-dim offset in the [Hp, Wp*C] view

    # cap the out block at ~2 MB so Mosaic's double buffering keeps the
    # kernel well inside VMEM even for wide halo patches (9x9 @ 196ch)
    patch_bytes = window * window * c * feat.dtype.itemsize
    bk = max(8, min(block_k, k, (2 << 20) // max(patch_bytes, 1)))
    k_pad = _round_up(k, bk)
    if k_pad != k:
        r = jnp.pad(r, ((0, 0), (0, k_pad - k)))
        cc = jnp.pad(cc, ((0, 0), (0, k_pad - k)))

    f2 = fp.reshape(n, hp, wp * c)
    out = pl.pallas_call(
        functools.partial(_kernel, bk=bk, w=window),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n, k_pad // bk),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, bk, window, window * c),
                lambda i, j, *_: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.SemaphoreType.DMA((bk,))],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n, k_pad, window, window * c), feat.dtype
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
    )(r, cc, f2)
    return out[:, :k].reshape(n, k, window * window, c)
