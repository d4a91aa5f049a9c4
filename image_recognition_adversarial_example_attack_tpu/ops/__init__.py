"""Pallas TPU kernels for the framework's hot elementwise paths."""

from .pallas_ops import (
    pgd_step_pallas,
    quantize_pallas,
    uniform_noise_pallas,
    pallas_available,
)
