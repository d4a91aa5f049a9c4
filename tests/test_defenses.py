"""Defense + detector unit tests."""

import jax
import jax.numpy as jnp
import numpy as np

from image_recognition_adversarial_example_attack_tpu.defenses import (
    DefenseConfig,
    defend_input,
    defense_quantization,
    defense_smoothing,
)
from image_recognition_adversarial_example_attack_tpu.defenses.detector import (
    calibrate_feature_threshold,
    feature_score,
    make_features_fn,
    score_from_features,
    threshold_from_scores,
)
from image_recognition_adversarial_example_attack_tpu.core.constants import (
    IMAGENET_MEAN,
    IMAGENET_STD,
)


class TestSmoothing:
    def test_matches_manual_3x3_mean(self):
        rng = np.random.RandomState(1)
        x = np.asarray(rng.rand(1, 5, 5, 2), np.float32)
        got = np.asarray(defense_smoothing(jnp.asarray(x)))
        # manual zero-padded 3x3 mean with divisor 9 everywhere
        # (count_include_pad=True, torch F.avg_pool2d default)
        xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        want = np.zeros_like(x)
        for i in range(5):
            for j in range(5):
                want[:, i, j, :] = xp[:, i : i + 3, j : j + 3, :].sum(axis=(1, 2)) / 9.0
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_constant_image_interior_fixed_point(self):
        x = jnp.full((1, 8, 8, 3), 0.5)
        y = defense_smoothing(x)
        np.testing.assert_allclose(np.asarray(y)[0, 2:-2, 2:-2], 0.5, atol=1e-7)


class TestQuantization:
    def test_idempotent(self):
        x = jnp.asarray(np.random.RandomState(2).rand(2, 8, 8, 3), jnp.float32)
        q1 = defense_quantization(x)
        q2 = defense_quantization(q1)
        np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-7)

    def test_levels(self):
        x = jnp.linspace(0, 1, 100).reshape(1, 10, 10, 1)
        q = defense_quantization(x, levels=16)
        uniq = np.unique(np.round(np.asarray(q) * 15))
        assert len(uniq) <= 16
        np.testing.assert_allclose(np.asarray(q) * 15, np.round(np.asarray(q) * 15), atol=1e-5)

    def test_out_of_range_clamped(self):
        x = jnp.asarray([[-0.5, 1.5]]).reshape(1, 1, 2, 1)
        q = defense_quantization(x)
        assert float(q.min()) == 0.0 and float(q.max()) == 1.0


class TestDefendInput:
    def test_composite_pipeline_range(self):
        x = jnp.asarray(np.random.RandomState(3).rand(2, 16, 16, 3), jnp.float32)
        y = defend_input(x)
        assert y.shape == x.shape
        assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0

    def test_jpeg_path_under_jit(self):
        x = jnp.asarray(np.random.RandomState(4).rand(2, 16, 16, 3), jnp.float32)
        cfg = DefenseConfig(use_jpeg=True, jpeg_quality=75)
        fn = jax.jit(lambda x: defend_input(x, cfg))
        y = np.asarray(fn(x))
        assert y.shape == x.shape
        assert y.min() >= 0.0 and y.max() <= 1.0
        # JPEG at q=75 must still be within a loose distance of the input
        assert np.abs(y - np.asarray(defend_input(x))).mean() < 0.15


class TestDetector:
    def test_score_formula_4d(self):
        rng = np.random.RandomState(5)
        feats = np.asarray(rng.rand(3, 4, 4, 8), np.float32)
        got = np.asarray(score_from_features(jnp.asarray(feats)))
        l2 = np.sqrt((feats**2).sum(axis=(1, 2, 3))) / feats.shape[-1]
        var = feats.reshape(3, 16, 8).var(axis=1, ddof=1).mean(axis=-1)
        want = np.clip(l2 + 0.1 * var, 0, 100)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_score_2d_fallback(self):
        feats = jnp.asarray(np.random.RandomState(6).rand(3, 10), jnp.float32)
        got = np.asarray(score_from_features(feats))
        want = np.linalg.norm(np.asarray(feats), axis=-1)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_clip_at_100(self):
        feats = jnp.full((1, 4, 4, 2), 1e4)
        assert float(score_from_features(feats)[0]) == 100.0

    def test_stage3_features_and_calibration(self, tiny_resnet):
        model, variables = tiny_resnet
        ffn = make_features_fn(model, variables, IMAGENET_MEAN, IMAGENET_STD)
        x = jnp.asarray(np.random.RandomState(7).rand(8, 32, 32, 3), jnp.float32)
        feats = ffn(x)
        assert feats.ndim == 4 and feats.shape[0] == 8
        scores = feature_score(ffn, x)
        assert scores.shape == (8,)
        thr = calibrate_feature_threshold(ffn, x, n=8, quantile=0.95, verbose=False)
        assert thr >= 1.0  # reference floor

    def test_threshold_rails(self):
        assert threshold_from_scores(jnp.asarray([60.0] * 10), 0.95) == 30.0  # halved
        assert threshold_from_scores(jnp.asarray([0.1] * 10), 0.95) == 1.0  # floor

    def test_quantile_matches_torch_linear_interpolation(self):
        scores = jnp.asarray([1.0, 2.0, 3.0, 4.0])
        # linear interpolation quantile: q=0.5 -> 2.5
        assert abs(float(jnp.quantile(scores, 0.5)) - 2.5) < 1e-6
