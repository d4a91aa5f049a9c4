"""Standard dataset-archive readers (CIFAR-10).

The reference consumes loose image directories only; the WRN/CIFAR family
(models/wideresnet.py) makes the standard CIFAR-10 archives the natural
training input, so this module reads them directly — no torchvision in
the container (zero egress), and none needed: the formats are plain
pickle / raw bytes.

Supported layouts under ``root`` (auto-detected):

- ``cifar-10-batches-py/`` (or the files directly in ``root``): python
  pickles ``data_batch_1..5`` + ``test_batch``, each
  ``{b"data": uint8 [N,3072] RRGGBB row-major, b"labels": [N]}``.
- ``cifar-10-batches-bin/``: raw records of 1 label byte + 3072 pixel
  bytes (``data_batch_N.bin`` / ``test_batch.bin``).

Everything returns NHWC float32 in [0,1] — the framework's universal
image convention (images live in pixel space; normalization happens only
inside ``make_logits_fn`` closures).
"""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

CIFAR10_CLASSES = (
    "airplane", "automobile", "bird", "cat", "deer",
    "dog", "frog", "horse", "ship", "truck",
)

_PY_DIR = "cifar-10-batches-py"
_BIN_DIR = "cifar-10-batches-bin"


def _find_dir(root: Path, sub: str, markers: tuple[str, ...]) -> Path | None:
    for cand in (root / sub, root):
        if any((cand / m).is_file() for m in markers):
            return cand
    return None


def _decode_rows(rows: np.ndarray) -> np.ndarray:
    """uint8 [N, 3072] channel-planar rows -> float32 [N, 32, 32, 3]."""
    x = rows.reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    return np.ascontiguousarray(x, dtype=np.float32) / 255.0


def _load_pickle_batch(path: Path) -> tuple[np.ndarray, np.ndarray]:
    with open(path, "rb") as f:
        d = pickle.load(f, encoding="bytes")

    def get(key: str):
        # the official archives pickle with bytes keys; tolerate str keys
        return d[key.encode()] if key.encode() in d else d[key]

    data = np.asarray(get("data"), np.uint8)
    return _decode_rows(data), np.asarray(get("labels"), np.int32)


def _load_bin_batch(path: Path) -> tuple[np.ndarray, np.ndarray]:
    raw = np.frombuffer(path.read_bytes(), np.uint8)
    if raw.size % 3073:
        raise ValueError(f"{path}: size {raw.size} is not a multiple of "
                         "3073 (1 label byte + 3072 pixels per record)")
    rec = raw.reshape(-1, 3073)
    return _decode_rows(rec[:, 1:].copy()), rec[:, 0].astype(np.int32)


def load_cifar10(
    root: str | Path,
    split: str = "train",
) -> tuple[np.ndarray, np.ndarray]:
    """Load CIFAR-10 from the standard archives.

    Args:
      root: directory containing ``cifar-10-batches-py`` /
        ``cifar-10-batches-bin`` (or the batch files themselves).
      split: ``"train"`` (data_batch_1..5) or ``"test"`` (test_batch).

    Returns ``(x [N,32,32,3] float32 in [0,1], y [N] int32)``.
    """
    if split not in ("train", "test"):
        raise ValueError(f"split must be 'train' or 'test', got {split!r}")
    root = Path(root)

    py_dir = _find_dir(root, _PY_DIR, ("data_batch_1", "test_batch"))
    if py_dir is not None:
        names = ([f"data_batch_{i}" for i in range(1, 6)]
                 if split == "train" else ["test_batch"])
        present = [py_dir / n for n in names if (py_dir / n).is_file()]
        if not present:
            raise FileNotFoundError(f"no {split} batches under {py_dir}")
        parts = [_load_pickle_batch(p) for p in present]
        return (np.concatenate([x for x, _ in parts]),
                np.concatenate([y for _, y in parts]))

    bin_dir = _find_dir(root, _BIN_DIR,
                        ("data_batch_1.bin", "test_batch.bin"))
    if bin_dir is not None:
        names = ([f"data_batch_{i}.bin" for i in range(1, 6)]
                 if split == "train" else ["test_batch.bin"])
        present = [bin_dir / n for n in names if (bin_dir / n).is_file()]
        if not present:
            raise FileNotFoundError(f"no {split} .bin batches under {bin_dir}")
        parts = [_load_bin_batch(p) for p in present]
        return (np.concatenate([x for x, _ in parts]),
                np.concatenate([y for _, y in parts]))

    raise FileNotFoundError(
        f"no CIFAR-10 archive found under {root} (looked for "
        f"{_PY_DIR}/data_batch_1 and {_BIN_DIR}/data_batch_1.bin)")


# ---------------------------------------------------------------------------
# ImageNet validation set (ground-truth data plane at ImageNet scale)
# ---------------------------------------------------------------------------

_VAL_MAP_NAMES = ("val_map.txt", "val_annotations.txt")


def list_imagenet_val(
    val_dir: str | Path,
) -> tuple[list[Path], np.ndarray, list[str] | None]:
    """Paths + ground-truth labels from an ImageNet-val directory.

    The reference takes labels from per-image files / filenames only
    (test.py:48-60); at the dataset scale this rebuild targets, the two
    standard on-disk layouts are supported instead (auto-detected):

    - **class subfolders** (torchvision ``ImageFolder``):
      ``val_dir/<class>/*.JPEG``.  Class index = position of the folder
      name in the SORTED folder list — torchvision's exact convention, so
      when the folders are the standard WNIDs (``n01440764``...) the
      indices line up with any checkpoint imported by models/convert.py.
    - **annotation file** ``val_map.txt`` (or ``val_annotations.txt``):
      whitespace-separated lines ``<filename> <label>`` where label is
      either an integer class index (the devkit-derived val_map format)
      or a class-name string such as a WNID (the real tiny-imagenet
      ``val_annotations.txt`` has ``n03444034`` in column 2 — indices are
      then positions in the SORTED unique-name list, the same convention
      as the subfolder layout); extra columns (tiny-imagenet box coords)
      are ignored.  Images may sit next to the file OR in an ``images/``
      subdirectory (the tiny-imagenet layout).  When an annotation file
      exists it WINS over subfolder detection — the tiny-imagenet tree
      has both, and treating ``images/`` as a class folder would silently
      label everything 0.

    Returns ``(paths sorted, labels int64 [N], class_names or None)``
    (class names for the subfolder and named-annotation layouts).  Unlike
    the tolerant eval loaders, an image with no label is an error — this
    entry point exists precisely to guarantee ground truth.
    """
    from .constants import IMAGE_EXTS

    exts = tuple(IMAGE_EXTS)
    root = Path(val_dir)
    if not root.is_dir():
        raise FileNotFoundError(f"imagenet_val_dir not found: {root}")

    for name in _VAL_MAP_NAMES:
        map_file = root / name
        if map_file.is_file():
            return _val_from_annotations(root, map_file, exts)

    classes = sorted(d.name for d in root.iterdir() if d.is_dir())
    if classes:
        idx = {c: i for i, c in enumerate(classes)}
        pairs: list[tuple[Path, int]] = []
        for c in classes:
            for p in sorted((root / c).iterdir()):
                if p.is_file() and p.suffix.lower() in exts:
                    pairs.append((p, idx[c]))
        if not pairs:
            raise FileNotFoundError(
                f"{root}: {len(classes)} class folders but no images with "
                f"extensions {exts}")
        paths = [p for p, _ in pairs]
        labels = np.asarray([l for _, l in pairs], np.int64)
        return paths, labels, classes

    raise FileNotFoundError(
        f"{root}: neither class subfolders nor a "
        f"{'/'.join(_VAL_MAP_NAMES)} annotation file found")


def _val_from_annotations(root: Path, map_file: Path, exts) -> tuple:
    raw: dict[str, str] = {}
    for ln, line in enumerate(map_file.read_text().splitlines(), 1):
        parts = line.split()
        if not parts:
            continue
        if len(parts) < 2:
            raise ValueError(
                f"{map_file}:{ln}: expected '<filename> "
                f"<label>', got {line!r}")
        raw[parts[0]] = parts[1]

    def _is_int(v: str) -> bool:
        try:
            int(v)
            return True
        except ValueError:
            return False

    int_like = [_is_int(v) for v in raw.values()]
    class_names: list[str] | None = None
    if all(int_like):
        table = {k: int(v) for k, v in raw.items()}
    elif not any(int_like):
        # tiny-imagenet WNID column: sorted unique names -> indices
        # (the subfolder-layout convention applied to annotation labels)
        class_names = sorted(set(raw.values()))
        idx = {c: i for i, c in enumerate(class_names)}
        table = {k: idx[v] for k, v in raw.items()}
    else:
        raise ValueError(
            f"{map_file}: labels mix integer class indices and class-name "
            f"strings — ground-truth mode needs one convention")
    scan_dirs = [root]
    if (root / "images").is_dir():  # tiny-imagenet: val/images/*.JPEG
        scan_dirs.append(root / "images")
    paths = sorted(p for d in scan_dirs for p in d.iterdir()
                   if p.is_file() and p.suffix.lower() in exts)
    if not paths:
        raise FileNotFoundError(f"{root}: no images next to {map_file.name}")
    missing = [p.name for p in paths if p.name not in table]
    if missing:
        raise ValueError(
            f"{map_file}: no entry for {len(missing)} image(s) "
            f"({missing[:3]}{'...' if len(missing) > 3 else ''}) — "
            f"ground-truth mode requires every image labeled")
    labels = np.asarray([table[p.name] for p in paths], np.int64)
    return paths, labels, class_names
