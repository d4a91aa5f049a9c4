"""Batch execution engine: images -> padded sharded batch -> compiled programs.

This is the runtime spine that replaces the reference's per-image Python
loops: a directory of images becomes one [B,H,W,C] batch, padded up to a
multiple of the mesh's data-axis size, placed with a NamedSharding, and
every downstream jitted program (attacks, defense eval, transfer forwards)
runs once over the whole batch; results are sliced back to the valid count.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..core.images import list_images, load_image_batch, pad_batch
from ..parallel.mesh import data_sharding, make_mesh


@dataclass
class Batch:
    """A device-resident image batch plus bookkeeping."""

    x: jax.Array          # [B_padded, H, W, 3] float32 in [0,1]
    paths: list[Path]     # length n_valid
    n_valid: int

    @property
    def padded_size(self) -> int:
        return self.x.shape[0]


class Engine:
    """Owns the mesh and moves batches onto it."""

    def __init__(self, mesh: Mesh | None = None, use_mesh: bool = True):
        if mesh is None and use_mesh and len(jax.devices()) > 1:
            mesh = make_mesh()
        self.mesh = mesh

    def batch_from_paths(self, paths: Sequence[str | Path], size: int = 224) -> Batch:
        x_np = load_image_batch(paths, size=size)
        return self.batch_from_array(x_np, paths=[Path(p) for p in paths])

    def batch_from_dir(self, image_dir: str | Path, size: int = 224) -> Batch:
        paths = list_images(image_dir)
        if not paths:
            raise FileNotFoundError(f"no images found in {image_dir}")
        return self.batch_from_paths(paths, size=size)

    def batch_from_array(self, x_np: np.ndarray, paths: list[Path] | None = None) -> Batch:
        multiple = self.mesh.shape["data"] if self.mesh is not None else 1
        x_pad, n_valid = pad_batch(np.asarray(x_np, np.float32), multiple)
        if self.mesh is not None:
            x = jax.device_put(x_pad, data_sharding(self.mesh))
        else:
            x = jnp.asarray(x_pad)
        return Batch(x=x, paths=paths or [], n_valid=n_valid)

    def unpad(self, arr, batch: Batch):
        """Slice a [B_padded, ...] result back to the valid prefix (host)."""
        return np.asarray(jax.device_get(arr))[: batch.n_valid]
