"""Flax MobileNetV2 (torchvision-compatible structure) in NHWC.

Eighth zoo family (beyond-reference: the reference's transfer studies use
resnet/vgg/densenet/vit — transferability_attack.py:22-49; MobileNetV2 is
the standard LIGHTWEIGHT transfer target, and its depthwise-separable
blocks exercise a different inductive bias than anything else in the
zoo).  Sandler et al., CVPR 2018: inverted residuals with linear
bottlenecks, ReLU6, no squeeze-excitation; BN in inference mode.

torchvision naming: features.0 (stem Conv2dNormActivation),
features.1..17 (InvertedResidual blocks), features.18 (head CNA),
classifier.1 (linear).  Mirrored here as stem_conv/stem_bn,
block{N}_{expand,dw,project}_{conv,bn} with N the torchvision features
index, head_conv/head_bn, classifier — so models/convert.py's mechanical
renamer round-trips real checkpoints.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.int8 import quant_conv_kwargs, quant_dense_kwargs


class IRSpec(NamedTuple):
    expand_ratio: int
    stride: int
    in_ch: int
    out_ch: int


def _v2_plan() -> tuple[IRSpec, ...]:
    """Flatten the paper's (t, c, n, s) table into one spec per block
    (torchvision features indices 1..17)."""
    cfg = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
           (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))
    plan: list[IRSpec] = []
    in_ch = 32
    for t, c, n, s in cfg:
        for b in range(n):
            plan.append(IRSpec(t, s if b == 0 else 1, in_ch, c))
            in_ch = c
    return tuple(plan)


_V2_PLAN = _v2_plan()


class InvertedResidual(nn.Module):
    spec: IRSpec
    dtype: Any = jnp.float32
    int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # int8 hits the MXU-bound expand/project 1x1 convs; the depthwise
        # conv is VPU-bound (no int8 win) and stays float — the same
        # split as models/efficientnet.py's MBConv.
        qkw = quant_conv_kwargs(self.int8)
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32)
        bn = partial(nn.BatchNorm, use_running_average=True, epsilon=1e-5,
                     momentum=0.9, dtype=self.dtype, param_dtype=jnp.float32)
        spec = self.spec
        mid = spec.in_ch * spec.expand_ratio
        identity = x

        y = x
        if spec.expand_ratio != 1:
            y = nn.relu6(bn(name="expand_bn")(
                conv(mid, (1, 1), name="expand_conv", **qkw)(y)))

        y = conv(mid, (3, 3), strides=(spec.stride, spec.stride),
                 padding=((1, 1), (1, 1)), feature_group_count=mid,
                 name="dw_conv")(y)
        y = nn.relu6(bn(name="dw_bn")(y))

        # linear bottleneck: NO activation after the projection
        y = bn(name="project_bn")(
            conv(spec.out_ch, (1, 1), name="project_conv", **qkw)(y))

        if spec.stride == 1 and spec.in_ch == spec.out_ch:
            y = y + identity
        return y


class MobileNetV2(nn.Module):
    plan: Sequence[IRSpec] = _V2_PLAN
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
        x = conv(self.stem_ch, (3, 3), strides=(2, 2),
                 padding=((1, 1), (1, 1)), name="stem_conv")(x)
        x = nn.relu6(bn(name="stem_bn")(x))

        # torchvision features indices: blocks are 1..len(plan)
        for n, spec in enumerate(self.plan, start=1):
            x = InvertedResidual(spec=spec, dtype=self.dtype,
                                 int8=self.int8, name=f"block{n}")(x)

        x = conv(self.head_ch, (1, 1), name="head_conv")(x)
        x = nn.relu6(bn(name="head_bn")(x))
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.num_classes, dtype=self.dtype,
                     param_dtype=jnp.float32, name="classifier",
                     **quant_dense_kwargs(self.int8))(x)
        return x.astype(jnp.float32)


def mobilenet_v2(num_classes: int = 1000, dtype: Any = jnp.float32,
                 int8: bool = False) -> MobileNetV2:
    return MobileNetV2(num_classes=num_classes, dtype=dtype, int8=int8)


def mobilenet_tiny(num_classes: int = 10, dtype: Any = jnp.float32,
                   int8: bool = False) -> MobileNetV2:
    plan = (IRSpec(1, 1, 8, 8), IRSpec(6, 2, 8, 16))
    return MobileNetV2(plan=plan, stem_ch=8, head_ch=32,
                       num_classes=num_classes, dtype=dtype, int8=int8)
