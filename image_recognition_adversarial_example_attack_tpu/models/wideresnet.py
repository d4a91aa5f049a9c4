"""Flax WideResNet (pre-activation, WRN-d-k) in NHWC — the CIFAR family.

The adversarial-robustness literature's standard small-image backbone
(Zagoruyko & Komodakis 2016; used by Madry et al. 2018, TRADES, MART and
most RobustBench CIFAR-10 entries).  The reference evaluates a
RobustBench-trained robust model it cannot produce
(/root/reference/defense_experiments.py:674-686); this module closes the
loop the other way: WRN-28-10 at 32x32 is small enough to adversarially
train FROM SCRATCH on one TPU chip with ``cli/adversarial_train.py``, and
RobustBench-style torch checkpoints convert mechanically
(models/convert.py::wideresnet_rename).

TPU design (same rules as resnet.py):
- NHWC end-to-end; configurable compute dtype (bf16 on the MXU), float32
  params; inference-mode BatchNorm so the network is a pure function.
- Optional ``int8=True`` inference via the ops/int8.py hooks.
- 32x32 inputs: no stem downsampling (3x3 stride-1 conv, no pool) —
  spatial dims 32-32-16-8, all MXU-tileable.

Module names mirror the torch reference implementation's state_dict keys
(``conv1``, ``block1.layer.0.bn1`` ~ ``block1_0/bn1``, ``convShortcut``,
final ``bn1``, ``fc``) so the weight converter is a key mapping.
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
    # train_bn: normalize by BATCH statistics (from-scratch training mode;
    # running stats are recalibrated at export — train/adversarial.py::
    # calibrate_batch_stats, the 'precise BN' recipe)
    return partial(nn.BatchNorm, use_running_average=not train_bn,
                   momentum=0.9, epsilon=1e-5, dtype=dtype,
                   param_dtype=jnp.float32)


class WideBasicBlock(nn.Module):
    """Pre-activation basic block: bn-relu-3x3(s) - bn-relu-3x3 + shortcut.

    Matches the Madry/RobustBench ``wide_resnet.BasicBlock`` semantics:
    when in/out widths differ, the FIRST bn-relu is shared by the residual
    branch and the 1x1 ``convShortcut`` (both consume relu(bn1(x))); when
    they match, the shortcut is the raw input.
    """

    features: int
    stride: int = 1
    dtype: Any = jnp.float32
    int8: bool = False
    train_bn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = _conv(self.dtype, self.int8)
        bn = _bn(self.dtype, self.train_bn)
        equal_in_out = x.shape[-1] == self.features and self.stride == 1

        pre = nn.relu(bn(name="bn1")(x))
        out = conv(self.features, (3, 3), strides=(self.stride, self.stride),
                   padding=((1, 1), (1, 1)), name="conv1")(pre)
        out = nn.relu(bn(name="bn2")(out))
        out = conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                   name="conv2")(out)

        if equal_in_out:
            shortcut = x
        else:
            shortcut = conv(self.features, (1, 1),
                            strides=(self.stride, self.stride),
                            name="convShortcut")(pre)
        return out + shortcut


class WideResNet(nn.Module):
    """WRN-depth-widen: depth = 6n+4; groups of n blocks at widths
    16k/32k/64k, strides 1/2/2."""

    depth: int = 28
    widen: int = 10
    num_classes: int = 10
    dtype: Any = jnp.float32
    int8: bool = False
    train_bn: bool = False

    def setup(self):
        assert (self.depth - 4) % 6 == 0, "WideResNet depth must be 6n+4"
        n = (self.depth - 4) // 6
        widths = (16 * self.widen, 32 * self.widen, 64 * self.widen)

        self.conv1 = _conv(self.dtype, self.int8)(
            16, (3, 3), padding=((1, 1), (1, 1)), name="conv1")
        groups = []
        for g, feats in enumerate(widths, start=1):
            blocks = []
            for i in range(n):
                blocks.append(WideBasicBlock(
                    features=feats,
                    stride=(2 if (g > 1 and i == 0) else 1),
                    dtype=self.dtype, int8=self.int8,
                    train_bn=self.train_bn,
                    name=f"block{g}_{i}",
                ))
            groups.append(blocks)
        self.groups = groups
        self.bn1 = _bn(self.dtype, self.train_bn)(name="bn1")
        self.fc = nn.Dense(self.num_classes, name="fc", dtype=self.dtype,
                           param_dtype=jnp.float32,
                           **quant_dense_kwargs(self.int8))

    def _run_groups(self, x: jnp.ndarray, upto: int) -> jnp.ndarray:
        x = self.conv1(x.astype(self.dtype))
        for blocks in self.groups[:upto]:
            for block in blocks:
                x = block(x)
        return x

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B,H,W,3] normalized input -> [B,num_classes] logits (float32)."""
        x = self._run_groups(x, 3)
        x = nn.relu(self.bn1(x))
        x = jnp.mean(x, axis=(1, 2))
        return self.fc(x).astype(jnp.float32)

    def features_stage3(self, x: jnp.ndarray) -> jnp.ndarray:
        """Penultimate-group activation map (NHWC), the detector's input —
        the WRN analog of ResNet's stage-3 tap (defenses/detector.py)."""
        return self._run_groups(x, 2).astype(jnp.float32)

    def features_last(self, x: jnp.ndarray) -> jnp.ndarray:
        """Last conv activation (post bn1+relu, pre-GAP), the Grad-CAM tap
        (eval/explain.py): ``__call__`` == head_from_features ∘ features_last."""
        x = self._run_groups(x, 3)
        x = nn.relu(self.bn1(x))
        return x.astype(jnp.float32)

    def head_from_features(self, feats: jnp.ndarray) -> jnp.ndarray:
        """[B,h,w,C] -> logits: the GAP+fc tail of ``__call__``."""
        x = jnp.mean(feats.astype(self.dtype), axis=(1, 2))
        return self.fc(x).astype(jnp.float32)


def wrn28_10(num_classes: int = 10, dtype: Any = jnp.float32,
             int8: bool = False) -> WideResNet:
    """WRN-28-10 (36.5M params) — the RobustBench CIFAR-10 standard."""
    return WideResNet(depth=28, widen=10, num_classes=num_classes,
                      dtype=dtype, int8=int8)


def wrn34_10(num_classes: int = 10, dtype: Any = jnp.float32,
             int8: bool = False) -> WideResNet:
    """WRN-34-10 — the Madry et al. 2018 / TRADES architecture."""
    return WideResNet(depth=34, widen=10, num_classes=num_classes,
                      dtype=dtype, int8=int8)


def wrn_tiny(num_classes: int = 10, dtype: Any = jnp.float32,
             int8: bool = False) -> WideResNet:
    """WRN-10-1: the real code path at test scale (one block per group)."""
    return WideResNet(depth=10, widen=1, num_classes=num_classes,
                      dtype=dtype, int8=int8)
