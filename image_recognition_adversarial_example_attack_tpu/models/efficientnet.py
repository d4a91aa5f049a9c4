"""Flax EfficientNet-B0 (torchvision-compatible structure) in NHWC.

Transfer-study target (reference transferability_attack.py:33-34 loads
``torchvision.models.efficientnet_b0``).  MBConv inverted residuals with
squeeze-excitation and SiLU; BN in inference mode.  Stochastic depth is a
no-op at inference and is omitted.

torchvision naming: features.0 (stem conv+bn), features.1..7 (stages of
MBConv blocks, each block.N with block-internal sequential indices),
features.8 (head conv+bn), classifier.1 (linear).  Mirrored here as
stem_conv/stem_bn, stageS_blockB_*, head_conv/head_bn, classifier.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.int8 import quant_conv_kwargs, quant_dense_kwargs


class MBConvSpec(NamedTuple):
    expand_ratio: int
    kernel: int
    stride: int
    in_ch: int
    out_ch: int
    repeats: int


# EfficientNet-B0 stage plan (torchvision defaults).
_B0_PLAN: Sequence[MBConvSpec] = (
    MBConvSpec(1, 3, 1, 32, 16, 1),
    MBConvSpec(6, 3, 2, 16, 24, 2),
    MBConvSpec(6, 5, 2, 24, 40, 2),
    MBConvSpec(6, 3, 2, 40, 80, 3),
    MBConvSpec(6, 5, 1, 80, 112, 3),
    MBConvSpec(6, 5, 2, 112, 192, 4),
    MBConvSpec(6, 3, 1, 192, 320, 1),
)


class SqueezeExcite(nn.Module):
    channels: int
    squeeze_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = partial(nn.Conv, kernel_size=(1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32)
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.silu(conv(self.squeeze_channels, name="fc1")(s))
        s = nn.sigmoid(conv(self.channels, name="fc2")(s))
        return x * s


class MBConv(nn.Module):
    spec: MBConvSpec
    stride: int
    in_ch: int
    dtype: Any = jnp.float32
    int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # int8 hits the MXU-bound expand/project 1x1 convs; the depthwise
        # conv is VPU-bound (no int8 win) and the SE block is negligible
        # FLOPs through a sigmoid — both stay float.
        qkw = quant_conv_kwargs(self.int8)
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32)
        bn = partial(nn.BatchNorm, use_running_average=True, epsilon=1e-5,
                     momentum=0.9, dtype=self.dtype, param_dtype=jnp.float32)
        spec = self.spec
        mid = self.in_ch * spec.expand_ratio
        identity = x

        y = x
        if spec.expand_ratio != 1:
            y = nn.silu(bn(name="expand_bn")(
                conv(mid, (1, 1), name="expand_conv", **qkw)(y)))

        k = spec.kernel
        pad = (k - 1) // 2
        y = conv(mid, (k, k), strides=(self.stride, self.stride),
                 padding=((pad, pad), (pad, pad)), feature_group_count=mid,
                 name="dw_conv")(y)
        y = nn.silu(bn(name="dw_bn")(y))

        y = SqueezeExcite(channels=mid, squeeze_channels=max(1, self.in_ch // 4),
                          dtype=self.dtype, name="se")(y)

        y = bn(name="project_bn")(
            conv(spec.out_ch, (1, 1), name="project_conv", **qkw)(y))

        if self.stride == 1 and self.in_ch == spec.out_ch:
            y = y + identity
        return y


class EfficientNet(nn.Module):
    plan: Sequence[MBConvSpec] = _B0_PLAN
    stem_ch: int = 32
    head_ch: int = 1280
    num_classes: int = 1000
    dtype: Any = jnp.float32
    int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32,
                       **quant_conv_kwargs(self.int8))
        bn = partial(nn.BatchNorm, use_running_average=True, epsilon=1e-5,
                     momentum=0.9, dtype=self.dtype, param_dtype=jnp.float32)
        x = x.astype(self.dtype)
        x = conv(self.stem_ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                 name="stem_conv")(x)
        x = nn.silu(bn(name="stem_bn")(x))

        for s, spec in enumerate(self.plan, start=1):
            in_ch = spec.in_ch
            for b in range(spec.repeats):
                stride = spec.stride if b == 0 else 1
                x = MBConv(spec=spec, stride=stride, in_ch=in_ch,
                           dtype=self.dtype, int8=self.int8,
                           name=f"stage{s}_block{b}")(x)
                in_ch = spec.out_ch

        x = conv(self.head_ch, (1, 1), name="head_conv")(x)
        x = nn.silu(bn(name="head_bn")(x))
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.num_classes, dtype=self.dtype, param_dtype=jnp.float32,
                     name="classifier", **quant_dense_kwargs(self.int8))(x)
        return x.astype(jnp.float32)


def efficientnet_b0(num_classes: int = 1000, dtype: Any = jnp.float32,
                    int8: bool = False) -> EfficientNet:
    return EfficientNet(num_classes=num_classes, dtype=dtype, int8=int8)


def efficientnet_tiny(num_classes: int = 10, dtype: Any = jnp.float32,
                      int8: bool = False) -> EfficientNet:
    plan = (
        MBConvSpec(1, 3, 1, 8, 8, 1),
        MBConvSpec(6, 3, 2, 8, 16, 1),
    )
    return EfficientNet(plan=plan, stem_ch=8, head_ch=32,
                        num_classes=num_classes, dtype=dtype, int8=int8)
