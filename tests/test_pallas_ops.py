"""Pallas kernel semantics vs the jnp reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from image_recognition_adversarial_example_attack_tpu.attacks.pgd import pgd_step
from image_recognition_adversarial_example_attack_tpu.defenses.preprocess import (
    defense_quantization,
)
from image_recognition_adversarial_example_attack_tpu.ops import (
    pgd_step_pallas,
    quantize_pallas,
    uniform_noise_pallas,
)


def _data(shape=(2, 16, 16, 3)):
    rng = np.random.RandomState(0)
    return (
        jnp.asarray(rng.rand(*shape), jnp.float32),
        jnp.asarray(rng.randn(*shape).astype(np.float32)),
        jnp.asarray(rng.rand(*shape), jnp.float32),
    )


def test_pgd_step_matches_reference():
    x, g, x0 = _data()
    got = pgd_step_pallas(x, g, x0, 8 / 255, 2 / 255, interpret=True)
    want = pgd_step(x, g, x0, 8 / 255, 2 / 255)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pgd_step_non_lane_aligned_shape():
    """Shapes not divisible by 128 go through the pad/unpad path."""
    x, g, x0 = _data((3, 7, 5, 3))
    got = pgd_step_pallas(x, g, x0, 8 / 255, 2 / 255, interpret=True)
    want = pgd_step(x, g, x0, 8 / 255, 2 / 255)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_quantize_matches_reference():
    x, _, _ = _data()
    got = quantize_pallas(x, 16, interpret=True)
    want = defense_quantization(x, 16)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_uniform_noise_cpu_fallback_statistics():
    n = uniform_noise_pallas((4, 32, 32, 3), 8 / 255, seed=1, interpret=True)
    arr = np.asarray(n)
    assert arr.shape == (4, 32, 32, 3)
    assert arr.min() >= -8 / 255 and arr.max() <= 8 / 255
    # roughly uniform: std of U(-e, e) is e/sqrt(3)
    assert abs(arr.std() - (8 / 255) / np.sqrt(3)) < 0.002
