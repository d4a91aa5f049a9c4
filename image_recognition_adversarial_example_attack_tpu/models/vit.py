"""Flax Vision Transformer (ViT-B/16, torchvision-compatible) — NHWC, MXU-first.

Transfer-study target (reference blackbox_transfer.py:36-43 loads
``torchvision.models.vit_b_16``).  TPU design choices:

- the qkv projection is ONE fused GEMM with the kernel stored
  HEAD-ALIGNED [D, 3, H, hd] (one large MXU GEMM, and the tensor-parallel
  shard of the H axis never crosses a q/k/v or head boundary — measured 7
  collective-permutes/block cheaper than a packed [D, 3D] contiguous
  split, benchmarks/tp_qkv_probe.py); torch's packed ``in_proj_weight``
  re-layouts into it row-major at conversion;
- attention math follows jax.nn conventions with static shapes — 197 tokens
  pad well onto the 8x128 VPU lanes after the [B, heads, T, T] softmax;
- GELU is torch-exact (erf form), matching torchvision inference.

Module names mirror the torchvision state dict (conv_proj, class_token,
encoder.pos_embedding, encoder.layers.encoder_layer_N.*, encoder.ln,
heads.head) so conversion is a rename + qkv re-layout.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.int8 import quant_conv_kwargs, quant_dense_kwargs


class MHSA(nn.Module):
    """Multi-head self-attention with a fused qkv GEMM."""

    dim: int
    num_heads: int
    dtype: Any = jnp.float32
    int8: bool = False  # quantize qkv/out matmuls; attention einsums stay float

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, d = x.shape
        head_dim = self.dim // self.num_heads
        dense = partial(nn.Dense, dtype=self.dtype, param_dtype=jnp.float32,
                        **quant_dense_kwargs(self.int8))

        # One fused qkv GEMM with the kernel stored HEAD-ALIGNED
        # [D, 3, H, hd] (bias [3, H, hd]) instead of packed [D, 3D]:
        # under tensor parallelism the H axis shards cleanly
        # (P(None, None, 'model', None)), so the q/k/v slice + head split
        # below never crosses a shard boundary.  Measured on the 8-device
        # virtual mesh at ViT-B geometry (benchmarks/tp_qkv_probe.py):
        # the packed-contiguous layout costs 7 collective-permutes per
        # block vs 1 all-reduce here, 1.09x slower per block.  Same math,
        # same FLOPs; converters reshape torch's packed [3D, D] into this
        # layout row-major (models/convert.py::conform_qkv_layout).
        qkv = nn.DenseGeneral(
            features=(3, self.num_heads, head_dim), name="qkv",
            dtype=self.dtype, param_dtype=jnp.float32,
            **quant_dense_kwargs(self.int8))(x)       # [B, T, 3, H, hd]
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
            jnp.array(head_dim, self.dtype)
        )
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.dim)
        return dense(self.dim, name="out")(out)


class EncoderBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_dim: int
    dtype: Any = jnp.float32
    int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ln = partial(nn.LayerNorm, epsilon=1e-6, dtype=self.dtype,
                     param_dtype=jnp.float32)
        dense = partial(nn.Dense, dtype=self.dtype, param_dtype=jnp.float32,
                        **quant_dense_kwargs(self.int8))

        y = ln(name="ln_1")(x)
        y = MHSA(dim=self.dim, num_heads=self.num_heads, dtype=self.dtype,
                 int8=self.int8, name="self_attention")(y)
        x = x + y

        y = ln(name="ln_2")(x)
        y = dense(self.mlp_dim, name="mlp_linear_1")(y)
        y = nn.gelu(y, approximate=False)  # torch GELU is the erf form
        y = dense(self.dim, name="mlp_linear_2")(y)
        return x + y


class ViT(nn.Module):
    """torchvision-style ViT: conv patchify, class token, learned pos emb."""

    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    num_classes: int = 1000
    image_size: int = 224
    dtype: Any = jnp.float32
    int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b = x.shape[0]
        x = x.astype(self.dtype)
        p = self.patch_size
        x = nn.Conv(self.dim, (p, p), strides=(p, p), dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_proj",
                    **quant_conv_kwargs(self.int8))(x)
        x = x.reshape(b, -1, self.dim)  # [B, T, D], row-major patches

        n_tokens = x.shape[1] + 1
        cls = self.param("class_token", nn.initializers.zeros, (1, 1, self.dim))
        x = jnp.concatenate([jnp.tile(cls.astype(self.dtype), (b, 1, 1)), x], axis=1)
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(stddev=0.02),
            (1, n_tokens, self.dim),
        )
        x = x + pos.astype(self.dtype)

        for i in range(self.depth):
            x = EncoderBlock(dim=self.dim, num_heads=self.num_heads,
                             mlp_dim=self.mlp_dim, dtype=self.dtype,
                             int8=self.int8, name=f"encoder_layer_{i}")(x)

        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32,
                         name="ln")(x)
        x = x[:, 0]  # class token
        x = nn.Dense(self.num_classes, dtype=self.dtype, param_dtype=jnp.float32,
                     name="head", **quant_dense_kwargs(self.int8))(x)
        return x.astype(jnp.float32)


def vit_b_16(num_classes: int = 1000, dtype: Any = jnp.float32,
             int8: bool = False) -> ViT:
    return ViT(num_classes=num_classes, dtype=dtype, int8=int8)


def vit_tiny(num_classes: int = 10, dtype: Any = jnp.float32,
             int8: bool = False) -> ViT:
    """Miniature ViT (same code path) for CPU tests: 32x32/8, depth 2."""
    return ViT(patch_size=8, dim=32, depth=2, num_heads=2, mlp_dim=64,
               num_classes=num_classes, image_size=32, dtype=dtype, int8=int8)
