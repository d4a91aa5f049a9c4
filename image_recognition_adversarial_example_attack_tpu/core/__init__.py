"""Core runtime: constants, preprocessing, normalization, RNG."""

from .constants import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    IMAGE_SIZE,
    RESIZE_SIZE,
    DEFAULT_EPS,
    DEFAULT_ALPHA,
    DEFAULT_STEPS,
)
from .normalize import normalize_batch, normalizer
from .images import (
    load_image,
    load_image_batch,
    preprocess_pil,
    save_image_01,
    list_images,
)
