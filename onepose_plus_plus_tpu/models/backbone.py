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


class _QuantConv(nn.Module):
    """Dynamically-quantized int8 conv (inference only).

    Same single ``kernel`` parameter (f32, HWIO) as the ``nn.Conv`` it
    replaces, so checkpoints load identically. At apply time the weights are
    quantized per-output-channel and the activations per-tensor (dynamic
    max), and the conv runs s8 x s8 -> s32 on the MXU — 2x the bf16 peak on
    v5e. Quantization error is bounded by the per-tensor activation step
    (|x|_max/127); the backbone's BN layers renormalize between convs so the
    error does not compound multiplicatively.
    """

    features: int
    kernel: int
    stride: int = 1
    out_dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kh = kw = self.kernel
        cin = x.shape[-1]
        w = self.param(
            "kernel", _KAIMING, (kh, kw, cin, self.features), jnp.float32
        )
        sw = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0  # [cout]
        sw = jnp.maximum(sw, 1e-12)
        wq = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
        sx = jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0
        sx = jnp.maximum(sx, 1e-12)
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) / sx), -127, 127
        ).astype(jnp.int8)
        dn = lax.conv_dimension_numbers(
            xq.shape, wq.shape, ("NHWC", "HWIO", "NHWC")
        )
        if jax.default_backend() != "tpu":
            # CPU XLA has no s8 conv fast path and f32 accumulation of the
            # integer products can exceed 2^24; accumulate in int32
            xq, wq = xq.astype(jnp.int32), wq.astype(jnp.int32)
        y = lax.conv_general_dilated(
            xq,
            wq,
            (self.stride, self.stride),
            [(kh // 2, kh // 2), (kw // 2, kw // 2)],
            dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        scale = (sx * sw).astype(jnp.float32)
        return (y.astype(jnp.float32) * scale).astype(self.out_dtype)


def _conv(
    features: int,
    kernel: int,
    stride: int = 1,
    name: str | None = None,
    dtype=jnp.float32,
    quant: bool = False,
):
    if quant:
        return _QuantConv(
            features, kernel, stride, out_dtype=dtype, name=name
        )
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
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
    """FPN lateral refinement: conv3x3 -> BN -> LeakyReLU -> conv3x3."""

    mid: int
    out: int
    dtype: object = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        q = self.quant and not train
        x = _conv(self.mid, 3, name="conv1", dtype=self.dtype, quant=q)(x)
        x = _BN(name="bn", dtype=self.dtype)(x, train)
        x = nn.leaky_relu(x, negative_slope=0.01)
        # conv2 writes the output descriptors directly (no BN behind it to
        # absorb quantization error) — always bf16/f32
        return _conv(self.out, 3, name="conv2", dtype=self.dtype)(x)


class ResNetFPN_8_2(nn.Module):
    """ResNet + FPN, coarse 1/8 and fine 1/2 outputs.

    Input [N, H, W, 1] grayscale; returns (coarse [N, H/8, W/8, block_dims[2]],
    fine [N, H/2, W/2, block_dims[0]]).
    """

    cfg: ResNetFPNConfig = ResNetFPNConfig()
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        block = _BLOCKS[self.cfg.block_type]
        d0, d1, d2 = self.cfg.block_dims
        dt = self.dtype
        q = self.cfg.quant_int8 and not train
        x = x.astype(dt)

        x0 = _conv(self.cfg.initial_dim, 7, 2, name="conv1", dtype=dt, quant=q)(x)
        x0 = nn.relu(_BN(name="bn1", dtype=dt)(x0, train))  # 1/2

        def layer(planes, stride, name, h):
            h = block(planes, stride, name=f"{name}_0", dtype=dt, quant=q)(h, train)
            return block(planes, 1, name=f"{name}_1", dtype=dt, quant=q)(h, train)

        x1 = layer(d0, 1, "layer1", x0)  # 1/2
        x2 = layer(d1, 2, "layer2", x1)  # 1/4
        x3 = layer(d2, 2, "layer3", x2)  # 1/8

        # FPN top-down (the descriptor-producing convs — layer3_outconv and
        # each _OutConv2's conv2 — always stay in the compute dtype)
        x3_out = _conv(d2, 1, name="layer3_outconv", dtype=dt)(x3)

        x3_up = upsample2x_align_corners(x3_out)
        x2_out = _conv(d2, 1, name="layer2_outconv", dtype=dt, quant=q)(x2)
        x2_out = _OutConv2(d2, d1, name="layer2_outconv2", dtype=dt, quant=q)(
            x2_out + x3_up, train
        )

        x2_up = upsample2x_align_corners(x2_out)
        x1_out = _conv(d1, 1, name="layer1_outconv", dtype=dt, quant=q)(x1)
        x1_out = _OutConv2(d1, d0, name="layer1_outconv2", dtype=dt, quant=q)(
            x1_out + x2_up, train
        )

        # Outputs stay in the compute dtype: upcasting the 1/2-resolution fine
        # map to f32 here cost ~15 ms/step at batch 48 on v5e (full-map
        # convert + layout copy) and doubled the fine window-gather traffic.
        # Downstream consumers that need f32 (matching softmax, LayerNorms)
        # upcast their own tiles.
        return x3_out, x1_out


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

        x0 = _conv(self.cfg.initial_dim, 7, 2, name="conv1", dtype=dt)(x)
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
        x0 = _conv(self.cfg.initial_dim, 7, 2, name="conv1", dtype=dt)(x)
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
