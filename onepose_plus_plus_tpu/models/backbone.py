"""ResNet-FPN backbone (Flax, NHWC) for grayscale images.

Functional re-design of the reference torch backbone
(``src/models/OnePosePlus/backbone/resnet.py:20-164``): same topology
(ResNet-18-style BasicBlocks + top-down FPN with align-corners upsampling),
NHWC layout and fused conv+BN-friendly structure for TPU. ``ResNetFPN_8_2``
returns the 1/8 coarse (block_dims[2]-d) and 1/2 fine (block_dims[0]-d) maps.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from jax import lax

from ..config import ResNetFPNConfig
from ..ops.upsample import upsample2x_align_corners

_KAIMING = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _stem_s2d_perm():
    """[64, 49] 0/1 scatter matrix taking the flat 7x7 single-channel stem
    kernel to its space-to-depth-equivalent (4, 4, 4) form.

    With ``y[oi,oj] = sum_{u,v} K[u,v] x[2oi+u-3, 2oj+v-3]`` and the 2x2
    space-to-depth image ``xs[i,j,di*2+dj] = x[2i+di, 2j+dj]``, each tap
    ``(u,v)`` lands at s2d offset ``off = (u-3-di)//2`` with ``di=(u-3)%2``
    (and likewise for v), i.e. a 4x4 window at offsets -2..1. The 7x7=49 taps
    scatter injectively into 4*4*4=64 slots; the rest stay zero.
    """
    import numpy as _np

    perm = _np.zeros((64, 49), _np.float32)
    for u in range(7):
        di = (u - 3) % 2
        a = (u - 3 - di) // 2 + 2
        for v in range(7):
            dj = (v - 3) % 2
            b = (v - 3 - dj) // 2 + 2
            perm[(a * 4 + b) * 4 + (di * 2 + dj), u * 7 + v] = 1.0
    return perm


_STEM_PERM = _stem_s2d_perm()


class _StemConv(nn.Module):
    """7x7/2 stem conv over a 1-channel image, computed space-to-depth.

    The direct form offers the MXU a contraction depth of 49 x 1 channel —
    worst-case systolic-array utilization. The s2d form (input
    [H,W,1] -> [H/2,W/2,4], kernel scattered to 4x4x4 via ``_STEM_PERM``)
    is mathematically identical (modulo float reassociation) with 4x the
    contraction density. Parameter is the SAME f32 (7,7,1,C) ``kernel`` as
    the direct conv, so checkpoints are unaffected; falls back to the direct
    conv for odd sizes, multi-channel inputs, or ``s2d=False``.
    """

    features: int
    dtype: object = jnp.float32
    quant: bool = False
    s2d: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.param(
            "kernel", _KAIMING, (7, 7, x.shape[-1], self.features), jnp.float32
        )
        n, h, wd, c = x.shape
        q = self.quant and not train
        if not (self.s2d and c == 1 and h % 2 == 0 and wd % 2 == 0):
            if q:
                return _quant_conv(x, w, 2, 3, self.dtype)
            dn = lax.conv_dimension_numbers(
                x.shape, w.shape, ("NHWC", "HWIO", "NHWC")
            )
            return lax.conv_general_dilated(
                x.astype(self.dtype),
                w.astype(self.dtype),
                (2, 2),
                [(3, 3)] * 2,
                dimension_numbers=dn,
            )
        xs = (
            x.reshape(n, h // 2, 2, wd // 2, 2)
            .transpose(0, 1, 3, 2, 4)
            .reshape(n, h // 2, wd // 2, 4)
        )
        xs = jnp.pad(xs, ((0, 0), (2, 1), (2, 1), (0, 0)))
        kp = (jnp.asarray(_STEM_PERM) @ w.reshape(49, self.features)).reshape(
            4, 4, 4, self.features
        )
        if q:
            return _quant_conv(xs, kp, 1, 0, self.dtype)
        dn = lax.conv_dimension_numbers(xs.shape, kp.shape, ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(
            xs.astype(self.dtype),
            kp.astype(self.dtype),
            (1, 1),
            [(0, 0)] * 2,
            dimension_numbers=dn,
        )


def _quant_conv(x, w, stride: int, pad: int, out_dtype) -> jnp.ndarray:
    """Dynamically-quantized int8 conv (inference only).

    Weights are quantized per-output-channel and the activations per-tensor
    (dynamic max), and the conv runs s8 x s8 -> s32 on the MXU — 2x the bf16
    peak on v5e. Quantization error is bounded by the per-tensor activation
    step (|x|_max/127); the backbone's BN layers renormalize between convs so
    the error does not compound multiplicatively.
    """
    sw = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0  # [cout]
    sw = jnp.maximum(sw, 1e-12)
    wq = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
    sx = jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0
    sx = jnp.maximum(sx, 1e-12)
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) / sx), -127, 127
    ).astype(jnp.int8)
    dn = lax.conv_dimension_numbers(xq.shape, wq.shape, ("NHWC", "HWIO", "NHWC"))
    if jax.default_backend() != "tpu":
        # CPU XLA has no s8 conv fast path and f32 accumulation of the
        # integer products can exceed 2^24; accumulate in int32
        xq, wq = xq.astype(jnp.int32), wq.astype(jnp.int32)
    y = lax.conv_general_dilated(
        xq,
        wq,
        (stride, stride),
        [(pad, pad)] * 2,
        dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    scale = (sx * sw).astype(jnp.float32)
    return (y.astype(jnp.float32) * scale).astype(out_dtype)


class _QuantConv(nn.Module):
    """Int8-quantized conv module (see ``_quant_conv``).

    Same single ``kernel`` parameter (f32, HWIO) as the ``nn.Conv`` it
    replaces, so checkpoints load identically.
    """

    features: int
    kernel: int
    stride: int = 1
    out_dtype: object = jnp.bfloat16
    pad: int | None = None

    @nn.compact
    def __call__(self, x):
        kh = kw = self.kernel
        w = self.param(
            "kernel", _KAIMING, (kh, kw, x.shape[-1], self.features), jnp.float32
        )
        pad = kh // 2 if self.pad is None else self.pad
        return _quant_conv(x, w, self.stride, pad, self.out_dtype)


class _ConvQ(nn.Module):
    """Conv with a call-time ``train`` flag and optional int8 dynamic quant.

    Single ``kernel`` parameter (f32 HWIO) — the exact param tree of the
    ``nn.Conv``/``_QuantConv`` pair it replaces, so checkpoints are
    unaffected. Setup-defined at the FPN level of ``ResNetFPN_8_2`` so the
    same conv instances can run both on dense maps and on gathered patches
    (the sparse fine path).
    """

    features: int
    kernel: int
    stride: int = 1
    dtype: object = jnp.float32
    quant: bool = False
    pad: int | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kh = kw = self.kernel
        w = self.param(
            "kernel", _KAIMING, (kh, kw, x.shape[-1], self.features), jnp.float32
        )
        pad = kh // 2 if self.pad is None else self.pad
        if self.quant and not train:
            return _quant_conv(x, w, self.stride, pad, self.dtype)
        dt = self.dtype
        dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(
            x.astype(dt),
            w.astype(dt),
            (self.stride, self.stride),
            [(pad, pad)] * 2,
            dimension_numbers=dn,
        )


def _conv(
    features: int,
    kernel: int,
    stride: int = 1,
    name: str | None = None,
    dtype=jnp.float32,
    quant: bool = False,
    pad: int | None = None,
):
    if quant:
        return _QuantConv(
            features, kernel, stride, out_dtype=dtype, pad=pad, name=name
        )
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2 if pad is None else pad,) * 2] * 2,
        use_bias=False,
        kernel_init=_KAIMING,
        name=name,
        dtype=dtype,
    )


class _BN(nn.Module):
    """BatchNorm matching torch defaults (eps 1e-5, momentum 0.1)."""

    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            scale_init=nn.initializers.ones,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )(x)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: object = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        q = self.quant and not train
        y = _conv(self.planes, 3, self.stride, name="conv1", dtype=dt, quant=q)(x)
        y = _BN(name="bn1", dtype=dt)(y, train)
        y = nn.relu(y)
        y = _conv(self.planes, 3, name="conv2", dtype=dt, quant=q)(y)
        y = _BN(name="bn2", dtype=dt)(y, train)
        if self.stride != 1:
            x = _conv(
                self.planes, 1, self.stride, name="downsample_conv",
                dtype=dt, quant=q,
            )(x)
            x = _BN(name="downsample_bn", dtype=dt)(x, train)
        return nn.relu(x + y)


class BottleneckBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        y = _conv(self.planes // 4, 1, name="conv1", dtype=dt)(x)
        y = nn.relu(_BN(name="bn1", dtype=dt)(y, train))
        y = _conv(self.planes // 4, 3, self.stride, name="conv2", dtype=dt)(y)
        y = nn.relu(_BN(name="bn2", dtype=dt)(y, train))
        y = _conv(self.planes, 1, name="conv3", dtype=dt)(y)
        y = _BN(name="bn3", dtype=dt)(y, train)
        if self.stride != 1:
            x = _conv(self.planes, 1, self.stride, name="downsample_conv", dtype=dt)(x)
            x = _BN(name="downsample_bn", dtype=dt)(x, train)
        return nn.relu(x + y)


_BLOCKS = {"basic": BasicBlock, "bottleneck": BottleneckBlock}


class _OutConv2(nn.Module):
    """FPN lateral refinement: conv3x3 -> BN -> LeakyReLU -> conv3x3.

    The convs are built VALID with explicit zero pads when ``pad=True`` (XLA
    folds a zero pad into the conv, so the dense path is unchanged — verified
    bit-identical by the backbone parity tests). ``pad=False`` runs the pair
    as valid convs over gathered halo patches (the sparse fine path);
    ``mid_mask`` then re-imposes the dense path's map-border zeros between
    the two convs (positions the dense conv2 reads as SAME-padding zeros).
    """

    mid: int
    out: int
    dtype: object = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(
        self,
        x,
        train: bool = False,
        pad: bool = True,
        mid_mask: jnp.ndarray | None = None,
    ):
        q = self.quant and not train
        if pad:
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        x = _conv(self.mid, 3, name="conv1", dtype=self.dtype, quant=q, pad=0)(x)
        x = _BN(name="bn", dtype=self.dtype)(x, train)
        x = nn.leaky_relu(x, negative_slope=0.01)
        if mid_mask is not None:
            x = x * mid_mask.astype(x.dtype)
        if pad:
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        # conv2 writes the output descriptors directly (no BN behind it to
        # absorb quantization error) — always bf16/f32
        return _conv(self.out, 3, name="conv2", dtype=self.dtype, pad=0)(x)


class ResNetFPN_8_2(nn.Module):
    """ResNet + FPN, coarse 1/8 and fine 1/2 outputs.

    Input [N, H, W, 1] grayscale; returns (coarse [N, H/8, W/8, block_dims[2]],
    fine [N, H/2, W/2, block_dims[0]]).

    Setup-structured (unlike the other backbones) so the fine FPN stage can
    run in two modes over shared params: densely over the whole map
    (``__call__``), or only on per-match halo patches
    (``coarse_and_ctx`` + ``fine_windows`` — the sparse fine path, which
    skips ~2/3 of the fine-branch conv FLOPs when only K windows of the
    1/2-resolution map are consumed downstream).
    """

    cfg: ResNetFPNConfig = ResNetFPNConfig()
    dtype: object = jnp.float32

    def setup(self):
        block = _BLOCKS[self.cfg.block_type]
        d0, d1, d2 = self.cfg.block_dims
        dt = self.dtype
        q = self.cfg.quant_int8
        self.conv1 = _StemConv(
            self.cfg.initial_dim,
            dtype=dt,
            quant=q,
            s2d=self.cfg.stem_s2d,
            name="conv1",
        )
        self.bn1 = _BN(dtype=dt, name="bn1")
        self.layer1_0 = block(d0, 1, dtype=dt, quant=q, name="layer1_0")
        self.layer1_1 = block(d0, 1, dtype=dt, quant=q, name="layer1_1")
        self.layer2_0 = block(d1, 2, dtype=dt, quant=q, name="layer2_0")
        self.layer2_1 = block(d1, 1, dtype=dt, quant=q, name="layer2_1")
        self.layer3_0 = block(d2, 2, dtype=dt, quant=q, name="layer3_0")
        self.layer3_1 = block(d2, 1, dtype=dt, quant=q, name="layer3_1")
        # FPN top-down (the descriptor-producing convs — layer3_outconv and
        # each _OutConv2's conv2 — always stay in the compute dtype)
        self.layer3_outconv = _ConvQ(d2, 1, dtype=dt, name="layer3_outconv")
        self.layer2_outconv = _ConvQ(d2, 1, dtype=dt, quant=q, name="layer2_outconv")
        self.layer2_outconv2 = _OutConv2(
            d2, d1, dtype=dt, quant=q, name="layer2_outconv2"
        )
        self.layer1_outconv = _ConvQ(d1, 1, dtype=dt, quant=q, name="layer1_outconv")
        self.layer1_outconv2 = _OutConv2(
            d1, d0, dtype=dt, quant=q, name="layer1_outconv2"
        )

    def _trunk_and_mid(self, x, train: bool):
        """Stem + residual trunk + FPN down to the 1/4 level."""
        x = x.astype(self.dtype)
        x0 = nn.relu(self.bn1(self.conv1(x, train), train))  # 1/2
        x1 = self.layer1_1(self.layer1_0(x0, train), train)  # 1/2
        x2 = self.layer2_1(self.layer2_0(x1, train), train)  # 1/4
        x3 = self.layer3_1(self.layer3_0(x2, train), train)  # 1/8

        x3_out = self.layer3_outconv(x3, train)
        x3_up = upsample2x_align_corners(x3_out)
        x2_out = self.layer2_outconv2(
            self.layer2_outconv(x2, train) + x3_up, train
        )
        return x1, x2_out, x3_out

    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x1, x2_out, x3_out = self._trunk_and_mid(x, train)
        x2_up = upsample2x_align_corners(x2_out)
        x1_out = self.layer1_outconv2(
            self.layer1_outconv(x1, train) + x2_up, train
        )
        # Outputs stay in the compute dtype: upcasting the 1/2-resolution fine
        # map to f32 here cost ~15 ms/step at batch 48 on v5e (full-map
        # convert + layout copy) and doubled the fine window-gather traffic.
        # Downstream consumers that need f32 (matching softmax, LayerNorms)
        # upcast their own tiles.
        return x3_out, x1_out

    def coarse_and_ctx(self, x, train: bool = False):
        """Coarse map + the context the sparse fine path needs later.

        Returns (coarse [N, H/8, W/8, d2], ctx) where ctx carries the 1/2
        trunk feature and the 1/4 FPN output; feed ctx to :meth:`fine_windows`
        once the matched coarse cells are known.
        """
        x1, x2_out, _x3_out = self._trunk_and_mid(x, train)
        return _x3_out, (x1, x2_out)

    def fine_windows(
        self,
        ctx,
        cell_ids: jnp.ndarray,
        grid_hw: Tuple[int, int],
        stride: int,
        window: int,
        train: bool = False,
    ) -> jnp.ndarray:
        """Sparse fine stage: FPN 1/2-level convs only on per-match patches.

        Exactly equivalent (modulo conv reassociation noise) to
        ``gather_windows_aligned(self(x)[1], cell_ids, grid_hw, stride,
        window)`` — the dense 1/2-level stage costs ~2/3 of the fine-branch
        FLOPs to produce h_f*w_f outputs of which only K*window^2 are read.
        Inference-only (the DMA gather has no VJP; training uses the dense
        path).

        Args:
            ctx: (x1 [N, h_f, w_f, d0-in], x2_out [N, h_f/2, w_f/2, d1]) from
                :meth:`coarse_and_ctx`.
            cell_ids: [N, K] flat coarse-cell ids; out-of-range ids yield
                all-zero windows (padded match slots).
        Returns:
            [N, K, window*window, d0] fine descriptor windows.
        """
        from ..ops.pallas_patch_gather import gather_patches_dma

        x1, x2_out = ctx
        n, h_f, w_f, _ = x1.shape
        h_c, w_c = grid_hw
        k = cell_ids.shape[1]
        halo = 2  # two valid 3x3 convs
        w_in = window + 2 * halo
        half = window // 2

        ci = cell_ids // w_c
        cj = cell_ids - ci * w_c
        in_range = (cell_ids >= 0) & (cell_ids < h_c * w_c)
        far = jnp.int32(-10 * w_in)  # out-of-map corner -> all-zero patch
        r0 = jnp.where(in_range, ci * stride - half - halo, far)
        c0 = jnp.where(in_range, cj * stride - half - halo, far)

        # the 1x1 lateral conv and the upsample-add stay dense (cheap — the
        # 3x3 pair holds ~90% of the stage FLOPs), so ONE gather fetches the
        # exact dense conv1 input
        pin_map = self.layer1_outconv(x1, train) + upsample2x_align_corners(
            x2_out
        )
        pin = gather_patches_dma(pin_map, r0, c0, w_in).reshape(
            n * k, w_in, w_in, pin_map.shape[-1]
        )

        def _border_mask(off: int, size: int) -> jnp.ndarray:
            # patch position i at offset off maps to map row r0 + off + i;
            # the dense path has zeros (conv SAME padding) outside the map
            rows = r0.reshape(n * k, 1, 1) + off + jax.lax.broadcasted_iota(
                jnp.int32, (1, size, 1), 1
            )
            cols = c0.reshape(n * k, 1, 1) + off + jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, size), 2
            )
            ok = ((rows >= 0) & (rows < h_f)) & ((cols >= 0) & (cols < w_f))
            return ok[..., None]  # [N*K, size, size, 1]

        out = self.layer1_outconv2(
            pin,
            train,
            pad=False,
            mid_mask=_border_mask(halo - 1, w_in - 2),
        )
        out = out * _border_mask(halo, window).astype(out.dtype)
        return out.reshape(n, k, window * window, self.cfg.block_dims[0])


class ResNetFPN_16_4(nn.Module):
    """ResNet + FPN variant with coarse 1/16 and fine 1/4 outputs.

    Reference ``backbone/resnet.py`` ``ResNetFPN_16_4`` (4-stage ResNet, FPN
    down to 1/4): used by LoFTR configs with resolution (16, 4). Requires
    ``block_dims`` of length 4.
    """

    cfg: ResNetFPNConfig = ResNetFPNConfig(block_dims=(128, 196, 256, 512))
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        block = _BLOCKS[self.cfg.block_type]
        dims = self.cfg.block_dims
        assert len(dims) == 4, "ResNetFPN_16_4 needs 4 block dims"
        d0, d1, d2, d3 = dims
        dt = self.dtype
        x = x.astype(dt)

        x0 = _StemConv(
            self.cfg.initial_dim, dtype=dt, s2d=self.cfg.stem_s2d, name="conv1"
        )(x, train)
        x0 = nn.relu(_BN(name="bn1", dtype=dt)(x0, train))  # 1/2

        def layer(planes, stride, name, h):
            h = block(planes, stride, name=f"{name}_0", dtype=dt)(h, train)
            return block(planes, 1, name=f"{name}_1", dtype=dt)(h, train)

        x1 = layer(d0, 1, "layer1", x0)  # 1/2
        x2 = layer(d1, 2, "layer2", x1)  # 1/4
        x3 = layer(d2, 2, "layer3", x2)  # 1/8
        x4 = layer(d3, 2, "layer4", x3)  # 1/16

        x4_out = _conv(d3, 1, name="layer4_outconv", dtype=dt)(x4)

        x4_up = upsample2x_align_corners(x4_out)
        x3_out = _conv(d3, 1, name="layer3_outconv", dtype=dt)(x3)
        x3_out = _OutConv2(d3, d2, name="layer3_outconv2", dtype=dt)(
            x3_out + x4_up, train
        )

        x3_up = upsample2x_align_corners(x3_out)
        x2_out = _conv(d2, 1, name="layer2_outconv", dtype=dt)(x2)
        x2_out = _OutConv2(d2, d1, name="layer2_outconv2", dtype=dt)(
            x2_out + x3_up, train
        )

        return x4_out.astype(jnp.float32), x2_out.astype(jnp.float32)


class ResNet18_C(nn.Module):
    """Plain ResNet-18 trunk to stage C2 or C3 (no FPN).

    Reference ``backbone/resnet.py`` ``ResNet18C2``/``ResNet18C3`` single-map
    variants (used as lightweight descriptor extractors).
    """

    cfg: ResNetFPNConfig = ResNetFPNConfig()
    stage: int = 3  # 2 -> 1/2 map, 3 -> 1/4 map
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> jnp.ndarray:
        block = _BLOCKS[self.cfg.block_type]
        dims = self.cfg.block_dims
        dt = self.dtype
        x = x.astype(dt)
        x0 = _StemConv(
            self.cfg.initial_dim, dtype=dt, s2d=self.cfg.stem_s2d, name="conv1"
        )(x, train)
        x0 = nn.relu(_BN(name="bn1", dtype=dt)(x0, train))

        def layer(planes, stride, name, h):
            h = block(planes, stride, name=f"{name}_0", dtype=dt)(h, train)
            return block(planes, 1, name=f"{name}_1", dtype=dt)(h, train)

        h = layer(dims[0], 1, "layer1", x0)  # 1/2 (C2)
        if self.stage >= 3:
            h = layer(dims[1], 2, "layer2", h)  # 1/4 (C3)
        return h.astype(jnp.float32)


def build_backbone(name: str, cfg: ResNetFPNConfig, dtype=jnp.float32):
    """Backbone registry mirroring reference ``backbone/__init__.py:6-14``."""
    if name in ("ResNetFPN_8_2", "resnetfpn_8_2"):
        return ResNetFPN_8_2(cfg, dtype=dtype)
    if name in ("ResNetFPN_16_4", "resnetfpn_16_4"):
        return ResNetFPN_16_4(cfg, dtype=dtype)
    if name in ("ResNet18C2", "resnet18c2"):
        return ResNet18_C(cfg, stage=2, dtype=dtype)
    if name in ("ResNet18C3", "resnet18c3"):
        return ResNet18_C(cfg, stage=3, dtype=dtype)
    raise ValueError(f"unknown backbone {name}")
