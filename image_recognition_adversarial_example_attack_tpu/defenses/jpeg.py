"""JPEG-compression defense via an ordered host callback.

The reference does a per-image CPU PIL round-trip in a Python loop
(defense_experiments.py:188-207).  JPEG encoding has no XLA equivalent, so
this stays host-side — but wrapped in ``jax.experimental.io_callback`` it
can live INSIDE a jitted evaluation program: the compiled graph pauses once,
ships the batch to host, and resumes, instead of breaking the program into
eager pieces.

SPMD limitation: XLA host callbacks abort inside multi-device-sharded
programs.  Two strategies exist:
- single-device: run the whole JPEG-bearing program on one device with the
  fused ``io_callback`` below;
- sharded: split the cell into two sharded programs around one explicit
  host stage (``jpeg_roundtrip_host``) — gather, encode/decode, re-scatter
  — so the attack loop and model forwards keep the mesh
  (eval/defense_eval.py::make_defense_eval_fn_split_jpeg; the defense CLI
  picks this automatically when a mesh is active).
"""

from __future__ import annotations

import io

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..core.constants import JPEG_QUALITY


def jpeg_roundtrip_host(x: np.ndarray, quality: np.ndarray) -> np.ndarray:
    """[B,H,W,C] float32 in [0,1] -> same, through PIL JPEG at ``quality``."""
    q = int(np.asarray(quality).reshape(()))
    x = np.clip(np.asarray(x, dtype=np.float32), 0.0, 1.0)
    out = np.empty_like(x)
    for i in range(x.shape[0]):
        img = Image.fromarray(np.round(x[i] * 255.0).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="JPEG", quality=q)
        buf.seek(0)
        decoded = Image.open(buf).convert("RGB")
        out[i] = np.asarray(decoded, dtype=np.float32) / 255.0
    return out


def jpeg_compress_batch(x: jnp.ndarray, quality: int = JPEG_QUALITY) -> jnp.ndarray:
    """JPEG round-trip usable under jit (host callback, batched once)."""
    result = jax.experimental.io_callback(
        jpeg_roundtrip_host,
        jax.ShapeDtypeStruct(x.shape, jnp.float32),
        x.astype(jnp.float32),
        jnp.asarray(quality, jnp.int32),
        ordered=False,
    )
    return jnp.clip(result.astype(x.dtype), 0.0, 1.0)
