"""Window/patch gathering by direct DMA — Pallas TPU kernel.

The one-hot-matmul gather (``ops/pallas_gather.py``) selects rows by streaming
the WHOLE source through the MXU against register-generated 0/1 tiles. Its
cost therefore scales with ``K x (grid rows) x (row payload)`` — fine for the
5x5/128-ch fine windows (~12 ms at flagship shapes on v5e), but quadratically
worse for larger halo patches (a 9x9/196-ch gather would burn ~6 TFLOP of
selection matmuls, more than the convs it feeds).

This kernel instead issues ONE async copy per patch: the feature map stays in
HBM, patch corners arrive via scalar prefetch, and each grid step DMAs a
block of strided slices straight into the output tile. Cost scales with the
number of patches (DMA issue rate on the scalar core) and the payload bytes —
independent of window area beyond bandwidth, so 9x9 halo patches cost the
same issue overhead as 5x5 windows.

Mosaic constrains every memref slice — including HBM->VMEM DMA sources — to
offsets and extents it can PROVE aligned to the (8, 128) tiling on the two
minor dims. Arbitrary patch corners are therefore unexpressible directly;
instead the kernel copies the aligned SUPERSET block containing each patch
(row offset ``8*(r//8)``, lane offset ``128*(off//128)`` — the prefetched
scalars hold the tile indices, and the in-kernel ``*8``/``*128`` makes
divisibility provable), and the wrapper slices the true ``[W, W*C]`` window
back out with XLA gathers over the residues.

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


def _kernel(
    rtile_ref, ctile_ref, feat_ref, out_ref, sems, *, bk: int, rows: int
):
    n = pl.program_id(0)
    kb = pl.program_id(1)
    k0 = kb * bk
    lanes = out_ref.shape[-1]
    dmas = []
    for b in range(bk):
        r0 = rtile_ref[n, k0 + b] * 8  # provably 8-aligned sublane offset
        c0 = ctile_ref[n, k0 + b] * 128  # provably 128-aligned lane offset
        dmas.append(
            pltpu.make_async_copy(
                feat_ref.at[n].at[pl.ds(r0, rows), pl.ds(c0, lanes)],
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

    # aligned superset block: rows [8*(r//8), +R), lanes [128*(cc//128), +L);
    # the true window sits at residue (r%8, cc%128) inside it
    wc = window * c
    rows_blk = _round_up(window + 7, 8)
    lanes_exact = c % 128 == 0  # cc is then always 128-aligned -> no residue
    lanes_blk = _round_up(wc, 128) if lanes_exact else _round_up(wc + 127, 128)
    # pad the flattened map so superset reads stay in bounds: max row base is
    # 8*((hp-window)//8) <= hp-window, max lane base <= (wp-window)*c
    hp8 = _round_up(hp - window + rows_blk, 8)
    minor = _round_up((wp - window) * c + lanes_blk, 128)

    # cap the out block at ~2 MB so Mosaic's double buffering keeps the
    # kernel well inside VMEM even for wide halo patches (9x9 @ 196ch)
    patch_bytes = rows_blk * lanes_blk * feat.dtype.itemsize
    bk = max(8, min(block_k, k, (2 << 20) // max(patch_bytes, 1)))
    k_pad = _round_up(k, bk)
    rt, ct = r // 8, cc // 128
    if k_pad != k:
        rt = jnp.pad(rt, ((0, 0), (0, k_pad - k)))
        ct = jnp.pad(ct, ((0, 0), (0, k_pad - k)))

    f2 = fp.reshape(n, hp, wp * c)
    if hp8 != hp or minor != wp * c:
        f2 = jnp.pad(f2, ((0, 0), (0, max(hp8 - hp, 0)), (0, minor - wp * c)))
    out = pl.pallas_call(
        functools.partial(_kernel, bk=bk, rows=rows_blk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n, k_pad // bk),
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
            out_specs=pl.BlockSpec(
                (1, bk, rows_blk, lanes_blk),
                lambda i, j, *_: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.SemaphoreType.DMA((bk,))],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n, k_pad, rows_blk, lanes_blk), feat.dtype
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
    )(rt, ct, f2)

    # slice the true [W, W*C] window out of each aligned superset block
    out = out[:, :k]
    row_idx = (r % 8)[..., None] + jnp.arange(window, dtype=jnp.int32)
    out = jnp.take_along_axis(out, row_idx[..., None], axis=2)
    if lanes_exact:
        out = out[..., :wc]
    else:
        col_idx = (cc % 128)[..., None] + jnp.arange(wc, dtype=jnp.int32)
        out = jnp.take_along_axis(out, col_idx[:, :, None, :], axis=3)
    return out.reshape(n, k, window * window, c)
