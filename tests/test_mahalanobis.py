"""Mahalanobis detector (defenses/mahalanobis.py): fit correctness against
closed-form cases, shrinkage/empty-class robustness, clean-vs-adversarial
separation, calibration, and the defense-eval cell integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_recognition_adversarial_example_attack_tpu.defenses.mahalanobis import (
    MahalanobisParams,
    calibrate_mahalanobis,
    fit_mahalanobis,
    is_adversarial_by_mahalanobis,
    mahalanobis_score,
    mahalanobis_score_from_features,
    pool_features,
)


class TestFit:
    def test_recovers_class_means(self):
        rng = np.random.RandomState(0)
        mu = np.array([[0.0, 0.0], [10.0, 10.0]], np.float32)
        y = np.repeat([0, 1], 50)
        z = mu[y] + rng.randn(100, 2).astype(np.float32)
        params = fit_mahalanobis(jnp.asarray(z), jnp.asarray(y), 2)
        np.testing.assert_allclose(np.asarray(params.mean), mu, atol=0.5)

    def test_identity_covariance_gives_euclidean(self):
        """Unit-variance isotropic clusters with tiny shrinkage: the score
        approaches the squared Euclidean distance to the nearest mean."""
        rng = np.random.RandomState(1)
        y = np.repeat([0, 1], 500)
        mu = np.array([[0.0, 0.0], [8.0, 0.0]], np.float32)
        z = mu[y] + rng.randn(1000, 2).astype(np.float32)
        params = fit_mahalanobis(jnp.asarray(z), jnp.asarray(y), 2,
                                 shrinkage=1e-4)
        q = jnp.asarray([[1.0, 0.0], [7.0, 1.0]], jnp.float32)
        d = mahalanobis_score_from_features(q, params)
        mu_j = np.asarray(params.mean)
        expect = [min(((qq - m) ** 2).sum() for m in mu_j)
                  for qq in np.asarray(q)]
        np.testing.assert_allclose(np.asarray(d), expect, rtol=0.15)

    def test_empty_class_does_not_nan(self):
        rng = np.random.RandomState(2)
        z = rng.randn(20, 4).astype(np.float32)
        y = np.zeros(20, np.int64)  # class 1..4 empty
        params = fit_mahalanobis(jnp.asarray(z), jnp.asarray(y), 5)
        d = mahalanobis_score_from_features(jnp.asarray(z), params)
        assert bool(jnp.isfinite(d).all())
        assert bool(jnp.isfinite(params.precision).all())

    def test_n_smaller_than_c_is_well_posed(self):
        """The 100-images-on-1024-channels regime: shrinkage must keep the
        covariance invertible and scores finite/positive."""
        rng = np.random.RandomState(3)
        z = rng.randn(10, 64).astype(np.float32)
        y = rng.randint(0, 3, 10)
        params = fit_mahalanobis(jnp.asarray(z), jnp.asarray(y), 3)
        d = mahalanobis_score_from_features(
            jnp.asarray(rng.randn(5, 64).astype(np.float32)), params)
        assert bool(jnp.isfinite(d).all())
        assert float(jnp.min(d)) >= 0.0

    def test_pool_features(self):
        maps = jnp.arange(2 * 3 * 3 * 4, dtype=jnp.float32
                          ).reshape(2, 3, 3, 4)
        pooled = pool_features(maps)
        assert pooled.shape == (2, 4)
        np.testing.assert_allclose(np.asarray(pooled),
                                   np.asarray(maps).mean((1, 2)), rtol=1e-6)
        flat = pool_features(jnp.ones((2, 7)))
        assert flat.shape == (2, 7)


class TestDetection:
    def test_separates_adversarial(self, tiny_logits_fn, tiny_model):
        """PGD adversarials must score higher (farther from every class
        Gaussian) than the clean calibration set scores itself."""
        from image_recognition_adversarial_example_attack_tpu.attacks import (
            pgd_linf_attack,
        )

        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.uniform(0.2, 0.8, (24, 16, 16, 3)).astype(np.float32))
        y = jnp.argmax(tiny_logits_fn(x), -1)
        # features = logits of the tiny model (the 2D fallback path)
        params, thr = calibrate_mahalanobis(tiny_logits_fn, x, y, 8,
                                            quantile=0.9)
        x_adv = pgd_linf_attack(tiny_logits_fn, x, y, eps=0.2, alpha=0.04,
                                steps=20, key=jax.random.PRNGKey(0))
        s_clean = mahalanobis_score(tiny_logits_fn, x, params)
        s_adv = mahalanobis_score(tiny_logits_fn, x_adv, params)
        assert float(jnp.median(s_adv)) > float(jnp.median(s_clean))
        flags = is_adversarial_by_mahalanobis(tiny_logits_fn, x_adv, params,
                                              thr)
        assert int(jnp.sum(flags)) > 12  # majority flagged

    def test_calibrate_quantile_semantics(self, tiny_logits_fn):
        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.uniform(0.2, 0.8, (20, 16, 16, 3)).astype(np.float32))
        y = jnp.argmax(tiny_logits_fn(x), -1)
        params, thr = calibrate_mahalanobis(tiny_logits_fn, x, y, 8,
                                            quantile=0.5)
        s = mahalanobis_score(tiny_logits_fn, x, params)
        # threshold = median of the clean scores -> about half flagged
        frac = float(jnp.mean((s > thr).astype(jnp.float32)))
        assert 0.3 <= frac <= 0.7

    def test_defense_eval_cell_integration(self, tiny_logits_fn):
        """detector='mahalanobis' runs inside the fused attack->defend->
        detect cell program and produces coherent counters."""
        from image_recognition_adversarial_example_attack_tpu.eval.defense_eval import (
            DefenseEvalConfig,
            aggregate_stats,
            make_defense_eval_fn,
        )

        rng = np.random.RandomState(6)
        x = jnp.asarray(rng.uniform(0.2, 0.8, (8, 16, 16, 3)).astype(np.float32))
        y = jnp.argmax(tiny_logits_fn(x), -1)
        params, thr = calibrate_mahalanobis(tiny_logits_fn, x, y, 8)
        cfg = DefenseEvalConfig(
            attack_name="fgsm", eps=0.1, alpha=0.02, steps=2,
            detector="mahalanobis", detector_params=params)
        fn = make_defense_eval_fn(tiny_logits_fn, tiny_logits_fn, cfg)
        out = fn(x, y, jnp.float32(thr), jax.random.PRNGKey(0))
        stats = aggregate_stats(out)
        assert 0 <= stats["detector_flags_adv"] <= 8
        assert stats["count"] == 8

    def test_missing_params_rejected(self, tiny_logits_fn):
        from image_recognition_adversarial_example_attack_tpu.eval.defense_eval import (
            DefenseEvalConfig,
            make_defense_eval_fn,
        )

        cfg = DefenseEvalConfig(attack_name="fgsm", eps=0.1, alpha=0.02,
                                steps=2, detector="mahalanobis")
        fn = make_defense_eval_fn(tiny_logits_fn, tiny_logits_fn, cfg)
        x = jnp.zeros((2, 16, 16, 3))
        y = jnp.zeros((2,), jnp.int32)
        with pytest.raises(ValueError, match="detector_params"):
            fn(x, y, jnp.float32(1.0), jax.random.PRNGKey(0))
