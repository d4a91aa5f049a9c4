"""Host-side image IO and preprocessing.

Pipeline parity with the reference (ResNet.py:27-31): shorter side -> 256
(PIL bilinear, antialiased -- exactly what torchvision does for PIL inputs),
center crop 224, scale to [0,1].  Output layout is NHWC float32, the
TPU-native layout, instead of the reference's NCHW.

All functions here are host-side by design: decode/resize happen once per
image while attacks/evaluation run as compiled XLA programs on device.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path
from typing import Iterable, Sequence

import numpy as np
from PIL import Image

from .constants import IMAGE_EXTS, IMAGE_SIZE, RESIZE_SIZE


def preprocess_pil(
    img: Image.Image,
    resize: int = RESIZE_SIZE,
    crop: int = IMAGE_SIZE,
) -> np.ndarray:
    """PIL image -> [H, W, 3] float32 array in [0,1].

    Matches torchvision's ``Resize(resize) + CenterCrop(crop) + ToTensor``
    semantics for PIL inputs: the shorter side is scaled to ``resize``
    keeping aspect ratio (bilinear, antialiased), then a centered
    ``crop x crop`` window is taken.
    """
    img = img.convert("RGB")
    w, h = img.size
    # torchvision computes the scaled long side with int() TRUNCATION
    # (_compute_resized_output_size), not round(); matching it exactly keeps
    # the resample grid and crop offsets identical to the reference pipeline.
    if w <= h:
        new_w, new_h = resize, max(1, int(h * resize / w))
    else:
        new_w, new_h = max(1, int(w * resize / h)), resize
    img = img.resize((new_w, new_h), Image.Resampling.BILINEAR)

    left = int(round((new_w - crop) / 2.0))
    top = int(round((new_h - crop) / 2.0))
    img = img.crop((left, top, left + crop, top + crop))

    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:  # grayscale safety; convert("RGB") should prevent this
        arr = np.stack([arr] * 3, axis=-1)
    return arr


def load_image(path: str | Path, size: int = IMAGE_SIZE) -> np.ndarray:
    """Load one image -> [1, size, size, 3] float32 in [0,1] (NHWC)."""
    with Image.open(path) as img:
        arr = preprocess_pil(img, crop=size, resize=_resize_for(size))
    return arr[None]


def _resize_for(size: int) -> int:
    """The resize edge for a given crop: 256/224 scaled, floor ``size``."""
    return max(size, round(size * RESIZE_SIZE / IMAGE_SIZE))


def load_image_bytes(raw: bytes, size: int = IMAGE_SIZE) -> np.ndarray:
    """Decode encoded image BYTES -> [size, size, 3] float32 in [0,1],
    with exactly ``load_image``'s resize/crop semantics — in-memory
    requests (serve's image_b64 route) must see the same pixels a path
    request to the same model sees at every input size, not just 224."""
    import io

    with Image.open(io.BytesIO(raw)) as img:
        return preprocess_pil(img, crop=size, resize=_resize_for(size))


def list_images(image_dir: str | Path, recursive: bool = False) -> list[Path]:
    """Sorted image files under a directory (jpg/jpeg/png/bmp)."""
    image_dir = Path(image_dir)
    it: Iterable[Path] = image_dir.rglob("*") if recursive else image_dir.iterdir()
    return sorted(p for p in it if p.is_file() and p.suffix.lower() in IMAGE_EXTS)


def load_image_batch(
    paths: Sequence[str | Path],
    size: int = IMAGE_SIZE,
) -> np.ndarray:
    """Load many images into one [B, size, size, 3] float32 batch.

    This replaces the reference's per-image Python loop (e.g.
    defense_experiments.py:816-832) with a single dense batch that one XLA
    program processes at once.  With ``ADV_TPU_NATIVE_LOADER=1`` the batch
    is decoded by the threaded C++ loader (native/loader.cc; <=1/255 from
    the PIL path, per-image PIL fallback on failure).
    """
    if not paths:
        raise ValueError("load_image_batch: empty path list")
    if os.environ.get("ADV_TPU_NATIVE_LOADER", "") in ("1", "on", "true"):
        from ..utils.native_loader import load_image_batch_native

        return load_image_batch_native(paths, size=size)
    return np.concatenate([load_image(p, size=size) for p in paths], axis=0)


def load_image_batch_tolerant(
    paths: Sequence[str | Path],
    size: int = IMAGE_SIZE,
) -> tuple[np.ndarray, list[Path]]:
    """Like load_image_batch but skips unreadable files with a warning.

    Per-image error isolation in the spirit of the reference's
    try/except-continue loops (test.py:111-113, defense_experiments.py:318).
    Returns (batch, list of successfully loaded paths).  Honors
    ``ADV_TPU_NATIVE_LOADER=1`` (threaded C++ decode; PIL retries the rows
    the native decoder flags, then unreadable files are dropped).
    """
    paths = list(paths)
    native_out = None
    ok = np.zeros((len(paths),), np.int32)  # rows the native decoder filled
    if paths and os.environ.get("ADV_TPU_NATIVE_LOADER", "") in ("1", "on", "true"):
        from ..utils.native_loader import load_batch_native_with_status

        native_out, ok = load_batch_native_with_status(paths, size=size)

    arrays: list[np.ndarray] = []
    good: list[Path] = []
    for i, p in enumerate(paths):
        if ok[i]:
            arrays.append(native_out[i][None])
            good.append(Path(p))
            continue
        try:
            arrays.append(load_image(p, size=size))
            good.append(Path(p))
        except Exception as e:  # noqa: BLE001 — isolate any decode failure
            # stderr, not stdout: callers' stdout may be a data stream
            # (cli/serve.py's JSON protocol) and this can run on a
            # background decode thread, where a process-global
            # redirect_stdout would race the protocol writer (r5 review)
            print(f"WARNING: skipping unreadable image {p}: {e}",
                  file=sys.stderr)
    if not arrays:
        raise ValueError("no readable images in batch")
    return np.concatenate(arrays, axis=0), good


def pad_batch(x: np.ndarray, multiple: int) -> tuple[np.ndarray, int]:
    """Pad batch dim up to a multiple (for even sharding). Returns (padded, n_valid)."""
    n = x.shape[0]
    if multiple <= 1 or n % multiple == 0:
        return x, n
    pad = multiple - (n % multiple)
    # Repeat the last image; callers slice results back to n_valid.
    x_pad = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], axis=0)
    return x_pad, n


def save_image_01(x, path: str | Path) -> None:
    """Save a [H,W,3] or [1,H,W,3] array in [0,1] as PNG/JPEG.

    Uses round() (not floor) so a [0,1] pixel value round-trips through
    uint8 with <= 0.5/255 error, same as torchvision's ToPILImage.
    """
    arr = np.asarray(x)
    if arr.ndim == 4:
        arr = arr[0]
    arr = np.clip(arr, 0.0, 1.0)
    arr8 = np.round(arr * 255.0).astype(np.uint8)
    path = Path(path)
    if path.parent and str(path.parent) not in ("", "."):
        path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(arr8).save(path)
