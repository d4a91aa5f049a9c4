"""Flax PreActResNet-18 (He et al. 2016, full pre-activation) in NHWC.

The second standard CIFAR robustness backbone (Rice et al. 2020 "robust
overfitting" and many RobustBench Linf entries train PreActResNet-18);
complements models/wideresnet.py: 11.2M params vs WRN-28-10's 36.5M, the
fast-adversarial-training default.

TPU design follows resnet.py/wideresnet.py: NHWC, configurable compute
dtype (bf16 MXU), float32 params, inference-mode BatchNorm, optional
``int8=True`` inference, 3x3 stride-1 stem (no downsampling at 32x32 —
spatial plan 32-32-16-8-4).

Module names mirror the torch implementation the robustness literature
shares (kuangliu/pytorch-cifar lineage, as vendored by RobustBench):
``conv1``, ``layer{1..4}.{i}.{bn1,conv1,bn2,conv2,shortcut.0}``, final
``bn``, ``linear`` — so RobustBench-style checkpoints convert with the
mechanical key mapping in models/convert.py::preactresnet_rename.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.int8 import quant_conv_kwargs, quant_dense_kwargs


def _conv(dtype, int8):
    return partial(nn.Conv, use_bias=False, dtype=dtype,
                   param_dtype=jnp.float32, **quant_conv_kwargs(int8))


def _bn(dtype, train_bn=False):
    # train_bn: batch-statistics mode for from-scratch training; running
    # stats recalibrated at export (train/adversarial.py::calibrate_batch_stats)
    return partial(nn.BatchNorm, use_running_average=not train_bn,
                   momentum=0.9, epsilon=1e-5, dtype=dtype,
                   param_dtype=jnp.float32)


class PreActBlock(nn.Module):
    """bn-relu-3x3(s) - bn-relu-3x3 + shortcut.

    The shortcut (1x1, stride s, present only when the shape changes)
    consumes the PRE-ACTIVATED input relu(bn1(x)) — the detail that
    distinguishes this family from the post-activation ResNet and from
    WRN's raw-x shortcut in the equal case.
    """

    features: int
    stride: int = 1
    dtype: Any = jnp.float32
    int8: bool = False
    train_bn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = _conv(self.dtype, self.int8)
        pre = nn.relu(_bn(self.dtype, self.train_bn)(name="bn1")(x))
        needs_proj = x.shape[-1] != self.features or self.stride != 1
        shortcut = (conv(self.features, (1, 1),
                         strides=(self.stride, self.stride),
                         name="shortcut_0")(pre)
                    if needs_proj else x)
        out = conv(self.features, (3, 3), strides=(self.stride, self.stride),
                   padding=((1, 1), (1, 1)), name="conv1")(pre)
        out = nn.relu(_bn(self.dtype, self.train_bn)(name="bn2")(out))
        out = conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                   name="conv2")(out)
        return out + shortcut


class PreActResNet(nn.Module):
    """PreActResNet-{18,34} topology (BasicBlock only)."""

    stage_sizes: tuple = (2, 2, 2, 2)
    num_classes: int = 10
    dtype: Any = jnp.float32
    int8: bool = False
    train_bn: bool = False

    def setup(self):
        self.conv1 = _conv(self.dtype, self.int8)(
            64, (3, 3), padding=((1, 1), (1, 1)), name="conv1")
        blocks = []
        for stage, n_blocks in enumerate(self.stage_sizes):
            feats = 64 * (2 ** stage)
            stage_blocks = []
            for i in range(n_blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                stage_blocks.append(PreActBlock(
                    features=feats, stride=stride, dtype=self.dtype,
                    int8=self.int8, train_bn=self.train_bn,
                    name=f"layer{stage + 1}_{i}"))
            blocks.append(stage_blocks)
        self.stages = blocks
        self.bn = _bn(self.dtype, self.train_bn)(name="bn")
        self.linear = nn.Dense(self.num_classes, name="linear",
                               dtype=self.dtype, param_dtype=jnp.float32,
                               **quant_dense_kwargs(self.int8))

    def _run_stages(self, x: jnp.ndarray, upto: int) -> jnp.ndarray:
        x = self.conv1(x.astype(self.dtype))
        for stage_blocks in self.stages[:upto]:
            for block in stage_blocks:
                x = block(x)
        return x

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B,H,W,3] normalized input -> [B,num_classes] logits (float32)."""
        x = self._run_stages(x, len(self.stage_sizes))
        x = nn.relu(self.bn(x))
        x = jnp.mean(x, axis=(1, 2))
        return self.linear(x).astype(jnp.float32)

    def features_stage3(self, x: jnp.ndarray) -> jnp.ndarray:
        """Stage-3 activation map (NHWC) — the detector tap
        (defenses/detector.py), same convention as resnet.py."""
        return self._run_stages(x, 3).astype(jnp.float32)

    def features_last(self, x: jnp.ndarray) -> jnp.ndarray:
        """Last conv activation (post bn+relu, pre-GAP), the Grad-CAM tap
        (eval/explain.py): ``__call__`` == head_from_features ∘ features_last."""
        x = self._run_stages(x, len(self.stage_sizes))
        x = nn.relu(self.bn(x))
        return x.astype(jnp.float32)

    def head_from_features(self, feats: jnp.ndarray) -> jnp.ndarray:
        """[B,h,w,C] -> logits: the GAP+linear tail of ``__call__``."""
        x = jnp.mean(feats.astype(self.dtype), axis=(1, 2))
        return self.linear(x).astype(jnp.float32)


def preact_resnet18(num_classes: int = 10, dtype: Any = jnp.float32,
                    int8: bool = False) -> PreActResNet:
    """PreActResNet-18 (11.2M params at 10 classes)."""
    return PreActResNet(stage_sizes=(2, 2, 2, 2), num_classes=num_classes,
                        dtype=dtype, int8=int8)
