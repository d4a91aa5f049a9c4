"""Metric tests: SSIM/PSNR against independent references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_recognition_adversarial_example_attack_tpu.eval.metrics import (
    attack_metrics,
    metrics_to_python,
    psnr,
    ssim,
)


class TestSSIM:
    def test_identical_images(self):
        x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3), jnp.float32)
        assert abs(float(ssim(x, x)) - 1.0) < 1e-5

    def test_decreases_with_noise(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)
        small = jnp.clip(x + 0.01 * jnp.asarray(rng.randn(1, 32, 32, 3)), 0, 1)
        big = jnp.clip(x + 0.2 * jnp.asarray(rng.randn(1, 32, 32, 3)), 0, 1)
        assert float(ssim(x, small)) > float(ssim(x, big))

    def test_against_scipy_reference(self):
        """Cross-check vs an independent numpy/scipy implementation."""
        from scipy.ndimage import convolve

        rng = np.random.RandomState(2)
        a = rng.rand(1, 24, 24, 1).astype(np.float32)
        b = np.clip(a + 0.05 * rng.randn(1, 24, 24, 1).astype(np.float32), 0, 1)

        # independent SSIM with the same 11x11 sigma-1.5 gaussian, VALID window
        coords = np.arange(11) - 5.0
        g = np.exp(-(coords**2) / (2 * 1.5**2))
        g /= g.sum()
        k = np.outer(g, g)

        def filt(img):
            out = convolve(img, k, mode="constant")
            return out[5:-5, 5:-5]

        A, B = a[0, :, :, 0], b[0, :, :, 0]
        mu_a, mu_b = filt(A), filt(B)
        s_aa = filt(A * A) - mu_a**2
        s_bb = filt(B * B) - mu_b**2
        s_ab = filt(A * B) - mu_a * mu_b
        c1, c2 = 0.01**2, 0.03**2
        want = np.mean(
            ((2 * mu_a * mu_b + c1) * (2 * s_ab + c2))
            / ((mu_a**2 + mu_b**2 + c1) * (s_aa + s_bb + c2))
        )
        got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        assert abs(got - want) < 1e-4


class TestPSNR:
    def test_known_value(self):
        a = jnp.zeros((1, 8, 8, 3))
        b = jnp.full((1, 8, 8, 3), 0.1)
        # mse = 0.01 -> psnr = 20*log10(1/0.1) = 20
        assert abs(float(psnr(a, b)) - 20.0) < 1e-4

    def test_identical_capped(self):
        a = jnp.zeros((1, 8, 8, 3))
        assert float(psnr(a, a)) == 100.0


class TestAttackMetrics:
    def test_keys_and_values(self):
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
        delta = (8 / 255) * jnp.sign(jnp.asarray(rng.randn(2, 32, 32, 3)))
        x_adv = jnp.clip(x + delta, 0, 1)
        m = metrics_to_python(attack_metrics(x, x_adv))
        assert set(m) == {
            "L∞ (pixel)", "L2", "L1", "SSIM", "PSNR",
            "Perturbed Pixels %", "High Freq Ratio %",
        }
        assert m["L∞ (pixel)"] <= 8 / 255 + 1e-6
        assert 0 <= m["Perturbed Pixels %"] <= 100
        assert 0 <= m["High Freq Ratio %"] <= 100
        assert m["SSIM"] < 1.0
        assert m["L2"] > 0 and m["L1"] > m["L2"]


class TestECE:
    def _ece(self, probs, labels, **kw):
        from image_recognition_adversarial_example_attack_tpu.eval.metrics import (
            expected_calibration_error,
        )

        return float(expected_calibration_error(
            jnp.asarray(probs, jnp.float32), jnp.asarray(labels), **kw))

    def test_confident_and_correct_is_zero(self):
        probs = np.eye(4, dtype=np.float32)  # conf 1.0, all correct
        assert self._ece(probs, np.arange(4)) == pytest.approx(0.0, abs=1e-6)

    def test_confident_and_wrong_is_one(self):
        probs = np.eye(4, dtype=np.float32)
        labels = (np.arange(4) + 1) % 4  # all wrong at conf 1.0
        assert self._ece(probs, labels) == pytest.approx(1.0, abs=1e-6)

    def test_hand_computed_single_bin(self):
        # conf 0.9 everywhere, half correct: ECE = |0.5 - 0.9| = 0.4
        probs = np.tile(np.asarray([[0.9, 0.1]], np.float32), (4, 1))
        labels = np.asarray([0, 0, 1, 1])
        assert self._ece(probs, labels) == pytest.approx(0.4, abs=1e-6)

    def test_matches_numpy_binning(self):
        rng = np.random.RandomState(0)
        logits = rng.randn(64, 10).astype(np.float32) * 2.0
        probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
        labels = rng.randint(0, 10, 64)
        n_bins = 15
        conf = probs.max(-1)
        correct = (probs.argmax(-1) == labels).astype(np.float64)
        idx = np.minimum((conf * n_bins).astype(int), n_bins - 1)
        want = 0.0
        for b in range(n_bins):
            m = idx == b
            if m.any():
                want += m.mean() * abs(correct[m].mean() - conf[m].mean())
        got = self._ece(probs, labels, n_bins=n_bins)
        assert got == pytest.approx(want, abs=1e-5)

    def test_jits(self):
        from image_recognition_adversarial_example_attack_tpu.eval.metrics import (
            expected_calibration_error,
        )

        fn = jax.jit(expected_calibration_error)
        probs = jax.nn.softmax(jnp.asarray(
            np.random.RandomState(1).randn(8, 5), jnp.float32), -1)
        out = float(fn(probs, jnp.arange(8) % 5))
        assert 0.0 <= out <= 1.0
