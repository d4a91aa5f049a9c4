"""Flax DenseNet (torchvision-compatible structure) in NHWC.

Transfer-study target (reference transferability_attack.py:29-30 loads
``torchvision.models.densenet121``).  Dense connectivity is expressed as
channel-axis concatenation — NHWC makes that the fast minor-dim concat on
TPU.  BN runs in inference mode (pure scale/shift, fused by XLA).

Names mirror torchvision: features_conv0/norm0, denseblockB_denselayerL
(with norm1/conv1/norm2/conv2), transitionT (norm/conv), features_norm5,
classifier.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.int8 import quant_conv_kwargs, quant_dense_kwargs


class DenseLayer(nn.Module):
    """BN-ReLU-Conv1x1 (bottleneck 4k) -> BN-ReLU-Conv3x3 (k new channels)."""

    growth_rate: int
    bn_size: int = 4
    dtype: Any = jnp.float32
    int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32, **quant_conv_kwargs(self.int8))
        bn = partial(nn.BatchNorm, use_running_average=True, epsilon=1e-5,
                     dtype=self.dtype, param_dtype=jnp.float32)
        y = nn.relu(bn(name="norm1")(x))
        y = conv(self.bn_size * self.growth_rate, (1, 1), name="conv1")(y)
        y = nn.relu(bn(name="norm2")(y))
        y = conv(self.growth_rate, (3, 3), padding=((1, 1), (1, 1)), name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class Transition(nn.Module):
    out_features: int
    dtype: Any = jnp.float32
    int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                                 dtype=self.dtype, param_dtype=jnp.float32,
                                 name="norm")(x))
        x = nn.Conv(self.out_features, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv", **quant_conv_kwargs(self.int8))(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNet(nn.Module):
    block_config: Sequence[int] = (6, 12, 24, 16)
    growth_rate: int = 32
    init_features: int = 64
    num_classes: int = 1000
    dtype: Any = jnp.float32
    int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        bn = partial(nn.BatchNorm, use_running_average=True, epsilon=1e-5,
                     dtype=self.dtype, param_dtype=jnp.float32)
        x = x.astype(self.dtype)
        x = nn.Conv(self.init_features, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="features_conv0",
                    **quant_conv_kwargs(self.int8))(x)
        x = nn.relu(bn(name="features_norm0")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        features = self.init_features
        for b, n_layers in enumerate(self.block_config, start=1):
            for l in range(1, n_layers + 1):
                x = DenseLayer(growth_rate=self.growth_rate, dtype=self.dtype,
                               int8=self.int8,
                               name=f"denseblock{b}_denselayer{l}")(x)
            features += n_layers * self.growth_rate
            if b != len(self.block_config):
                features //= 2
                x = Transition(out_features=features, dtype=self.dtype,
                               int8=self.int8, name=f"transition{b}")(x)

        x = nn.relu(bn(name="features_norm5")(x))
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.num_classes, dtype=self.dtype, param_dtype=jnp.float32,
                     name="classifier", **quant_dense_kwargs(self.int8))(x)
        return x.astype(jnp.float32)


def densenet121(num_classes: int = 1000, dtype: Any = jnp.float32,
                int8: bool = False) -> DenseNet:
    return DenseNet(num_classes=num_classes, dtype=dtype, int8=int8)


def densenet_tiny(num_classes: int = 10, dtype: Any = jnp.float32,
                  int8: bool = False) -> DenseNet:
    return DenseNet(block_config=(2, 2), growth_rate=8, init_features=16,
                    num_classes=num_classes, dtype=dtype, int8=int8)
