"""Flax ResNet (v1.5, torchvision-compatible structure) in NHWC.

A from-scratch TPU-native implementation of the reference's primary model
(reference ResNet.py:13 loads ``torchvision.models.resnet50``).  Design
choices for TPU:

- NHWC layout end-to-end (XLA's preferred conv layout on TPU).
- Configurable compute dtype (bfloat16 on TPU for the MXU; float32 in
  CPU tests); parameters are always stored float32.
- Inference-mode BatchNorm (running stats folded at apply time) so the whole
  network is a pure function of (variables, x) and fuses under one jit.
- Optional ``int8=True`` inference mode: every conv and the classifier
  matmul run on the int8 MXU via flax's op-injection hooks
  (ops/int8.py — per-channel weight / dynamic per-tensor activation
  quantization, float-VJP so attacks still differentiate); measured 1.68x
  over bf16 for the body conv on v5e (benchmarks/int8_probe.py).  Param
  trees and checkpoints are untouched.
- ``features_stage3`` exposes the stage-3 (a.k.a. torchvision ``layer3``)
  activation map used by the adversarial detector (reference
  defense_experiments.py:232-238); XLA dead-code-eliminates stage 4 and the
  classifier head when only this method is applied.

Module/parameter naming intentionally mirrors torchvision's state_dict keys
(``conv1``, ``bn1``, ``layer1_0`` ~ ``layer1.0`` ...) to keep the torch ->
Flax weight converter (models/convert.py) a mechanical key mapping.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.int8 import quant_conv_kwargs, quant_dense_kwargs

ModuleDef = Any


def _conv_partial(dtype, int8):
    return partial(nn.Conv, use_bias=False, dtype=dtype,
                   param_dtype=jnp.float32, **quant_conv_kwargs(int8))


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 -> 3x3(stride) -> 1x1(x4) + identity.

    Stride lives on the 3x3 conv (ResNet v1.5), matching torchvision.
    """

    features: int  # bottleneck width; output channels = features * 4
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = _conv_partial(self.dtype, self.int8)
        bn = partial(
            nn.BatchNorm,
            use_running_average=True,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )

        identity = x
        out = conv(self.features, (1, 1), name="conv1")(x)
        out = bn(name="bn1")(out)
        out = nn.relu(out)
        out = conv(self.features, (3, 3), strides=(self.stride, self.stride),
                   padding=((1, 1), (1, 1)), name="conv2")(out)
        out = bn(name="bn2")(out)
        out = nn.relu(out)
        out = conv(self.features * 4, (1, 1), name="conv3")(out)
        out = bn(name="bn3")(out)

        if self.downsample:
            identity = conv(self.features * 4, (1, 1),
                            strides=(self.stride, self.stride), name="downsample_conv")(x)
            identity = bn(name="downsample_bn")(identity)

        return nn.relu(out + identity)


class ResNet(nn.Module):
    """ResNet-v1.5 with Bottleneck blocks (50/101/152 layer family)."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    num_classes: int = 1000
    width: int = 64
    dtype: Any = jnp.float32
    int8: bool = False

    def setup(self):
        conv = _conv_partial(self.dtype, self.int8)
        bn = partial(
            nn.BatchNorm,
            use_running_average=True,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        self.conv1 = conv(self.width, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), name="conv1")
        self.bn1 = bn(name="bn1")

        blocks = []
        for stage, n_blocks in enumerate(self.stage_sizes):
            feats = self.width * (2 ** stage)
            stage_blocks = []
            for i in range(n_blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                stage_blocks.append(
                    Bottleneck(
                        features=feats,
                        stride=stride,
                        downsample=(i == 0),  # stage 0 block 0 expands channels too
                        dtype=self.dtype,
                        int8=self.int8,
                        name=f"layer{stage + 1}_{i}",
                    )
                )
            blocks.append(stage_blocks)
        self.stages = blocks

        self.fc = nn.Dense(self.num_classes, name="fc", dtype=self.dtype,
                           param_dtype=jnp.float32,
                           **quant_dense_kwargs(self.int8))

    def stem(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        x = self.conv1(x)
        x = self.bn1(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        return x

    def _run_stages(self, x: jnp.ndarray, upto: int) -> jnp.ndarray:
        for stage_blocks in self.stages[:upto]:
            for block in stage_blocks:
                x = block(x)
        return x

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B,H,W,3] normalized input -> [B,num_classes] logits (float32)."""
        x = self.stem(x)
        x = self._run_stages(x, len(self.stage_sizes))
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        x = self.fc(x)
        return x.astype(jnp.float32)

    def features_stage3(self, x: jnp.ndarray) -> jnp.ndarray:
        """Activation after stage 3 (torchvision ``layer3``), NHWC.

        Detector input; see defenses/detector.py.  Reference semantics:
        defense_experiments.py:232-238.
        """
        x = self.stem(x)
        x = self._run_stages(x, 3)
        return x.astype(jnp.float32)

    def features_last(self, x: jnp.ndarray) -> jnp.ndarray:
        """Last convolutional activation map (after stage 4), NHWC float32.

        The Grad-CAM tap (eval/explain.py): ``__call__`` is exactly
        ``head_from_features(features_last(x))``, so gradients of a class
        logit w.r.t. this map are well-defined through the split.
        """
        x = self.stem(x)
        x = self._run_stages(x, len(self.stage_sizes))
        return x.astype(jnp.float32)

    def head_from_features(self, feats: jnp.ndarray) -> jnp.ndarray:
        """[B,h,w,C] last-conv map -> [B,num_classes] logits (the GAP+fc
        tail of ``__call__``)."""
        x = jnp.mean(feats.astype(self.dtype), axis=(1, 2))
        x = self.fc(x)
        return x.astype(jnp.float32)


def resnet50(num_classes: int = 1000, dtype: Any = jnp.float32,
             int8: bool = False) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), num_classes=num_classes,
                  width=64, dtype=dtype, int8=int8)


def resnet_tiny(num_classes: int = 10, dtype: Any = jnp.float32,
                int8: bool = False) -> ResNet:
    """A miniature ResNet with the real code path, for CPU tests and the
    multi-chip dry run: same Bottleneck topology, 1/8 width, one block per
    stage.  Works on inputs as small as 32x32."""
    return ResNet(stage_sizes=(1, 1, 1, 1), num_classes=num_classes,
                  width=8, dtype=dtype, int8=int8)
