"""Flax Swin Transformer (Swin-T, torchvision-compatible structure), NHWC.

Transfer-study target (reference blackbox_transfer.py:47-54 loads
``torchvision.models.swin_t``).  TPU design:

- feature maps stay [B, H, W, C] end-to-end (Swin is natively NHWC);
- window partition/reverse are pure reshapes/transposes (layout ops XLA
  folds away), attention per 7x7 window is a batch of small GEMMs the MXU
  executes as one batched matmul over [B * num_windows, 49, C];
- the shifted-window attention mask and the relative-position-bias gather
  indices are Python-time numpy constants (static shapes), so nothing
  data-dependent reaches the compiled program;
- stochastic depth is an inference no-op and is omitted.

Naming mirrors torchvision swin_t's state dict (patch conv + norm, per-block
norm1/attn.qkv/attn.proj/relative_position_bias_table/norm2/mlp, patch
merging reduction+norm, final norm + head) modulo '.'->'_' flattening.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.int8 import quant_conv_kwargs, quant_dense_kwargs
import numpy as np


def _relative_position_index(window: int) -> np.ndarray:
    """[ws*ws, ws*ws] gather indices into the (2w-1)^2 bias table (static)."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))  # [2, w, w]
    flat = coords.reshape(2, -1)  # [2, w*w]
    rel = flat[:, :, None] - flat[:, None, :]  # [2, w*w, w*w]
    rel = rel.transpose(1, 2, 0)  # [w*w, w*w, 2]
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)  # [w*w, w*w]


def _shift_attn_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """Additive mask [nW, w*w, w*w] for shifted-window attention (static)."""
    img = np.zeros((h, w), np.int32)
    cnt = 0
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    for hs in slices:
        for ws_ in slices:
            img[hs, ws_] = cnt
            cnt += 1
    # partition into windows
    img = img.reshape(h // window, window, w // window, window)
    img = img.transpose(0, 2, 1, 3).reshape(-1, window * window)  # [nW, w*w]
    diff = img[:, :, None] - img[:, None, :]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    dtype: Any = jnp.float32
    # quantize qkv/proj matmuls; attention einsums stay float.  Per-example
    # activation scales here are per-WINDOW (batch axis is B*nW) — windows
    # never mix samples, so cross-request isolation still holds.
    int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        ws = self.window
        # torchvision disables the cyclic shift when the feature map is no
        # larger than one window (stage 4 at 224^2 is exactly 7x7).
        sh = 0 if (h <= ws and w <= ws) else self.shift
        nh = self.num_heads
        hd = self.dim // nh
        wsq = ws * ws

        if sh > 0:
            x = jnp.roll(x, shift=(-sh, -sh), axis=(1, 2))

        # partition into [B * nW, wsq, C]
        x = x.reshape(b, h // ws, ws, w // ws, ws, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, wsq, c)
        nw = (h // ws) * (w // ws)

        dense = partial(nn.Dense, dtype=self.dtype, param_dtype=jnp.float32,
                        **quant_dense_kwargs(self.int8))
        # one fused GEMM, kernel stored head-aligned [C, 3, H, hd] — the
        # TP shard of H never crosses a q/k/v boundary (see
        # models/vit.py::MHSA and benchmarks/tp_qkv_probe.py; torch's
        # packed [3C, C] Linear re-layouts row-major at conversion)
        qkv = nn.DenseGeneral(
            features=(3, nh, hd), name="qkv", dtype=self.dtype,
            param_dtype=jnp.float32,
            **quant_dense_kwargs(self.int8))(x)   # [B*nW, wsq, 3, H, hd]
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.array(hd, self.dtype))

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(stddev=0.02),
            ((2 * ws - 1) ** 2, nh),
        )
        # jnp.take (not raw indexing): variables may arrive as host numpy
        # arrays, and numpy fancy-indexing on a traced index array fails.
        idx = jnp.asarray(_relative_position_index(ws).reshape(-1))  # static
        bias = jnp.take(jnp.asarray(table), idx, axis=0).reshape(wsq, wsq, nh)
        attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)

        if sh > 0:
            mask = jnp.asarray(_shift_attn_mask(h, w, ws, sh))  # [nW, wsq, wsq]
            attn = attn.reshape(b, nw, nh, wsq, wsq)
            attn = attn + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(b * nw, nh, wsq, wsq)

        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(-1, wsq, self.dim)
        out = dense(self.dim, name="proj")(out)

        # reverse partition
        out = out.reshape(b, h // ws, w // ws, ws, ws, c)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
        if sh > 0:
            out = jnp.roll(out, shift=(sh, sh), axis=(1, 2))
        return out


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: int = 4
    dtype: Any = jnp.float32
    int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ln = partial(nn.LayerNorm, epsilon=1e-5, dtype=self.dtype,
                     param_dtype=jnp.float32)
        dense = partial(nn.Dense, dtype=self.dtype, param_dtype=jnp.float32,
                        **quant_dense_kwargs(self.int8))

        y = ln(name="norm1")(x)
        y = WindowAttention(dim=self.dim, num_heads=self.num_heads,
                            window=self.window, shift=self.shift,
                            dtype=self.dtype, int8=self.int8, name="attn")(y)
        x = x + y

        y = ln(name="norm2")(x)
        y = dense(self.dim * self.mlp_ratio, name="mlp_0")(y)
        y = nn.gelu(y, approximate=False)
        y = dense(self.dim, name="mlp_3")(y)
        return x + y


class PatchMerging(nn.Module):
    """2x2 neighborhood concat (4C) -> LN -> Linear to 2C (torchvision order)."""

    dim: int  # input channel count C
    dtype: Any = jnp.float32
    int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)  # [B, H/2, W/2, 4C]
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm")(x)
        x = nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="reduction",
                     **quant_dense_kwargs(self.int8))(x)
        return x


class SwinTransformer(nn.Module):
    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 7
    num_classes: int = 1000
    dtype: Any = jnp.float32
    int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), dtype=self.dtype,
                    param_dtype=jnp.float32, name="patch_conv",
                    **quant_conv_kwargs(self.int8))(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="patch_norm")(x)

        dim = self.embed_dim
        for s, (depth, heads) in enumerate(zip(self.depths, self.num_heads), start=1):
            if s > 1:
                x = PatchMerging(dim=dim, dtype=self.dtype, int8=self.int8,
                                 name=f"merge{s - 1}")(x)
                dim *= 2
            for blk in range(depth):
                shift = 0 if blk % 2 == 0 else self.window // 2
                x = SwinBlock(dim=dim, num_heads=heads, window=self.window,
                              shift=shift, dtype=self.dtype, int8=self.int8,
                              name=f"stage{s}_block{blk}")(x)

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm")(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.num_classes, dtype=self.dtype, param_dtype=jnp.float32,
                     name="head", **quant_dense_kwargs(self.int8))(x)
        return x.astype(jnp.float32)


def swin_t(num_classes: int = 1000, dtype: Any = jnp.float32,
           int8: bool = False) -> SwinTransformer:
    return SwinTransformer(num_classes=num_classes, dtype=dtype, int8=int8)


def swin_tiny_test(num_classes: int = 10, dtype: Any = jnp.float32,
                   int8: bool = False) -> SwinTransformer:
    """Miniature Swin (same code path) for CPU tests: 32x32 input, window 4."""
    return SwinTransformer(patch_size=2, embed_dim=16, depths=(2, 2),
                           num_heads=(2, 4), window=4,
                           num_classes=num_classes, dtype=dtype, int8=int8)
