"""ImageNet class-name lookup with graceful fallback.

The reference fetches class names over HTTP at runtime
(visualized_attacks.py:197-205) and falls back to ``class_{i}``.  This
framework is built for air-gapped TPU pods, so the lookup order is purely
local: ``$IMAGENET_CLASSES`` env var -> ``imagenet_classes.txt`` in the
working directory -> packaged data file -> ``class_{i}`` fallback.
"""

from __future__ import annotations

import os
from functools import lru_cache
from pathlib import Path

from .constants import NUM_CLASSES

_DATA_FILE = Path(__file__).resolve().parent.parent / "data" / "imagenet_classes.txt"


@lru_cache(maxsize=1)
def load_imagenet_labels() -> list[str]:
    candidates = []
    env = os.environ.get("IMAGENET_CLASSES")
    if env:
        candidates.append(Path(env))
    candidates.append(Path("imagenet_classes.txt"))
    candidates.append(_DATA_FILE)
    for path in candidates:
        try:
            if path.is_file():
                lines = [ln.strip() for ln in path.read_text(encoding="utf-8").splitlines()]
                lines = [ln for ln in lines if ln]
                if len(lines) >= NUM_CLASSES:
                    return lines[:NUM_CLASSES]
        except OSError:
            continue
    return [f"class_{i}" for i in range(NUM_CLASSES)]


def label_name(idx: int, labels: list[str] | None = None) -> str:
    labels = labels if labels is not None else load_imagenet_labels()
    if 0 <= idx < len(labels):
        return labels[idx]
    return str(idx)
