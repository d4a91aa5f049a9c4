"""Flax ConvNeXt-Tiny (torchvision-compatible structure) in NHWC.

Ninth zoo family (beyond-reference: the reference's transfer studies stop
at resnet/vgg/vit/swin/densenet/efficientnet — transferability_attack.py:
22-49; ConvNeXt is the modern convnet that matches transformer recipes,
Liu et al., CVPR 2022, and probes yet another inductive bias: 7x7
depthwise mixing + inverted-bottleneck MLPs + LayerNorm, no BatchNorm).

torchvision naming (torchvision/models/convnext.py): features.0 = stem
Conv2dNormActivation (conv 4x4/4 + LayerNorm2d), features.{1,3,5,7} =
stages of CNBlocks, features.{2,4,6} = downsample (LayerNorm2d + conv
2x2/2), classifier = [LayerNorm2d, Flatten, Linear].  Mirrored here as
stem_conv/stem_ln, stage{K}_{J} blocks (K = 1..4), down{D}_{ln,conv}
(D = 1..3), head_ln, classifier — models/convert.py::convnext_rename is
the mechanical key mapping.

TPU notes: the block is natively NHWC (torchvision permutes NCHW<->NHWC
around the LN/MLP; here there is nothing to permute).  The MLP pair is
named mlp_linear_1/mlp_linear_2 so tensor parallelism's existing
Megatron column/row rule (parallel/mesh.py) covers ConvNeXt's dominant
tensors with zero new rules; the 7x7 depthwise kernels ride the stage-
conv out-channel rule.  GELU is exact-erf (torch nn.GELU default), and
BatchNorm-free means no running stats — the whole model is pure params.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.int8 import quant_conv_kwargs, quant_dense_kwargs


class CNBlock(nn.Module):
    """dwconv7x7 -> LN -> Linear 4x -> GELU -> Linear -> layer_scale,
    residual.  Stochastic depth is identity at inference (the zoo runs
    eval mode, like BN elsewhere)."""

    dim: int
    dtype: Any = jnp.float32
    int8: bool = False
    layer_scale_init: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Conv(self.dim, (7, 7), padding=((3, 3), (3, 3)),
                    feature_group_count=self.dim, dtype=self.dtype,
                    param_dtype=jnp.float32, name="dwconv")(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=jnp.float32, name="ln")(y)
        # int8 hits the two MXU-bound linears (the block's FLOPs); the
        # depthwise conv is VPU-bound and stays float (same split as
        # mobilenet.py / efficientnet.py)
        qkw = quant_dense_kwargs(self.int8)
        y = nn.Dense(4 * self.dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="mlp_linear_1", **qkw)(y)
        y = nn.gelu(y, approximate=False)  # torch nn.GELU default (erf)
        y = nn.Dense(self.dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="mlp_linear_2", **qkw)(y)
        gamma = self.param("layer_scale",
                           nn.initializers.constant(self.layer_scale_init),
                           (self.dim,), jnp.float32)
        return x + gamma.astype(y.dtype) * y


class ConvNeXt(nn.Module):
    """setup-style so ``features_stage3`` (the detector tap) shares the
    stem/stage modules with ``__call__``."""

    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    num_classes: int = 1000
    dtype: Any = jnp.float32
    int8: bool = False

    def setup(self) -> None:
        conv = partial(nn.Conv, dtype=self.dtype, param_dtype=jnp.float32,
                       **quant_conv_kwargs(self.int8))
        ln = partial(nn.LayerNorm, epsilon=1e-6, dtype=self.dtype,
                     param_dtype=jnp.float32)
        self.stem_conv = conv(self.dims[0], (4, 4), strides=(4, 4),
                              padding="VALID", name="stem_conv")
        self.stem_ln = ln(name="stem_ln")
        blocks: list = []
        downs: list = []
        for k, (depth, dim) in enumerate(zip(self.depths, self.dims),
                                         start=1):
            blocks.append(tuple(
                CNBlock(dim=dim, dtype=self.dtype, int8=self.int8,
                        name=f"stage{k}_{j}") for j in range(depth)))
            if k < len(self.depths):
                downs.append((ln(name=f"down{k}_ln"),
                              conv(self.dims[k], (2, 2), strides=(2, 2),
                                   padding="VALID", name=f"down{k}_conv")))
        self.stages = tuple(blocks)
        self.downsamples = tuple(downs)
        self.head_ln = ln(name="head_ln")
        self.classifier = nn.Dense(self.num_classes, dtype=self.dtype,
                                   param_dtype=jnp.float32, name="classifier",
                                   **quant_dense_kwargs(self.int8))

    def _run_stages(self, x: jnp.ndarray, upto: int) -> jnp.ndarray:
        x = self.stem_ln(self.stem_conv(x.astype(self.dtype)))
        for k in range(upto):
            for block in self.stages[k]:
                x = block(x)
            if k + 1 < upto and k < len(self.downsamples):
                ds_ln, ds_conv = self.downsamples[k]
                x = ds_conv(ds_ln(x))
        return x

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self._run_stages(x, len(self.stages))
        x = jnp.mean(x, axis=(1, 2))          # avgpool
        x = self.head_ln(x)                   # LayerNorm2d on [B,C,1,1] == LN
        return self.classifier(x).astype(jnp.float32)

    def features_stage3(self, x: jnp.ndarray) -> jnp.ndarray:
        """Activation after stage 3 (torchvision features.5), NHWC — the
        detector tap (reference defense_experiments.py:232-238 semantics,
        stage-3 statistics); stage 4 + head are dead-code-eliminated.
        Test-scale configs with fewer stages tap their last stage."""
        return self._run_stages(x, min(3, len(self.stages))).astype(jnp.float32)


def convnext_tiny(num_classes: int = 1000, dtype: Any = jnp.float32,
                  int8: bool = False) -> ConvNeXt:
    return ConvNeXt(num_classes=num_classes, dtype=dtype, int8=int8)


def convnext_micro(num_classes: int = 10, dtype: Any = jnp.float32,
                   int8: bool = False) -> ConvNeXt:
    """Test-scale config (two stages, tiny dims) for CPU suites."""
    return ConvNeXt(depths=(1, 2), dims=(8, 16), num_classes=num_classes,
                    dtype=dtype, int8=int8)
