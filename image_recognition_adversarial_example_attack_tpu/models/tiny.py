"""Tiny deterministic CNN for unit tests.

The reference has no test suite (SURVEY.md §4); this framework's test
strategy validates attack math against closed forms on a small, fixed-seed
model where a full forward+backward costs microseconds on CPU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.int8 import quant_conv_kwargs, quant_dense_kwargs


class TinyCNN(nn.Module):
    """2-conv + dense classifier over NHWC images of any small size."""

    num_classes: int = 8
    features: int = 8
    dtype: Any = jnp.float32
    int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        qc, qd = quant_conv_kwargs(self.int8), quant_dense_kwargs(self.int8)
        x = x.astype(self.dtype)
        x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype, **qc)(x)
        x = nn.relu(x)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(self.features * 2, (3, 3), padding="SAME", dtype=self.dtype, **qc)(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.num_classes, dtype=self.dtype, **qd)(x)
        return x.astype(jnp.float32)


def make_tiny(seed: int = 0, image_size: int = 16, num_classes: int = 8):
    """Returns (module, variables) with deterministic init."""
    model = TinyCNN(num_classes=num_classes)
    variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, image_size, image_size, 3)))
    return model, variables
