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


def test_pallas_conv_probe_interpret_matches_xla():
    """The conv-probe kernel (benchmarks/pallas_conv_probe.py) in
    interpreter mode must match lax.conv on CPU — the numerics gate the
    on-chip benchmark asserts before timing (VERDICT r2 next #5)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "benchmarks"))
    try:
        import pallas_conv_probe as probe
    finally:
        sys.path.pop(0)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, probe.H, probe.W, probe.C_IN), jnp.float32)
    w = jnp.asarray(rng.randn(probe.K, probe.K, probe.C_IN, probe.C_OUT) * 0.05,
                    jnp.float32)
    ours = probe.pallas_conv3x3(x, w, interpret=True)
    ref = probe.xla_conv3x3(x, w)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
