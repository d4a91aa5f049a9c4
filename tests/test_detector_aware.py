"""Detector-aware adaptive attack (Carlini & Wagner 2017) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_recognition_adversarial_example_attack_tpu.attacks import (
    detector_aware_fgsm,
    detector_aware_pgd,
    pgd_linf_attack,
)
from image_recognition_adversarial_example_attack_tpu.core.constants import (
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from image_recognition_adversarial_example_attack_tpu.defenses.detector import (
    feature_score,
    make_features_fn,
)

EPS = 8 / 255
ALPHA = 2 / 255


def _toy_score(xx):
    # a smooth, differentiable stand-in detector: mean squared deviation
    # from mid-gray, scaled so typical values sit around the threshold
    return 10.0 * jnp.mean(jnp.square(xx - 0.5), axis=(1, 2, 3))


class TestDetectorAwarePGD:
    def test_lam_zero_is_plain_pgd_bitwise(self, tiny_logits_fn, image_batch, rng_key):
        x = jnp.asarray(image_batch)
        y = jnp.argmax(tiny_logits_fn(x), -1)
        a = detector_aware_pgd(
            tiny_logits_fn, _toy_score, x, y, eps=EPS, alpha=ALPHA, steps=5,
            key=rng_key, threshold=1.0, lam=0.0)
        b = pgd_linf_attack(
            tiny_logits_fn, x, y, eps=EPS, alpha=ALPHA, steps=5, key=rng_key)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_ball_and_range_invariants(self, tiny_logits_fn, image_batch, rng_key):
        x = jnp.asarray(image_batch)
        y = jnp.argmax(tiny_logits_fn(x), -1)
        x_adv = detector_aware_pgd(
            tiny_logits_fn, _toy_score, x, y, eps=EPS, alpha=ALPHA, steps=10,
            key=rng_key, threshold=0.1, lam=5.0)
        assert float(jnp.max(jnp.abs(x_adv - x))) <= EPS + 1e-6
        assert float(x_adv.min()) >= 0.0 and float(x_adv.max()) <= 1.0

    def test_penalty_lowers_detector_score(self, tiny_logits_fn, image_batch, rng_key):
        """With a hard score budget, the aware attack must end with a lower
        detector score than the oblivious one (that's its whole point)."""
        x = jnp.asarray(image_batch)
        y = jnp.argmax(tiny_logits_fn(x), -1)
        # threshold 0 + margin 1.0 => penalty active everywhere
        aware = detector_aware_pgd(
            tiny_logits_fn, _toy_score, x, y, eps=EPS, alpha=ALPHA, steps=20,
            key=rng_key, threshold=0.0, lam=100.0, margin=1.0)
        oblivious = pgd_linf_attack(
            tiny_logits_fn, x, y, eps=EPS, alpha=ALPHA, steps=20, key=rng_key)
        s_aware = float(jnp.mean(_toy_score(aware)))
        s_obl = float(jnp.mean(_toy_score(oblivious)))
        assert s_aware < s_obl

    def test_traced_threshold_one_program(self, tiny_logits_fn, image_batch, rng_key):
        """threshold is a runtime scalar: one jitted program serves any
        calibration; different thresholds give different iterates."""
        x = jnp.asarray(image_batch)
        y = jnp.argmax(tiny_logits_fn(x), -1)
        compiles = 0

        @jax.jit
        def run(thr):
            nonlocal compiles
            compiles += 1
            return detector_aware_pgd(
                tiny_logits_fn, _toy_score, x, y, eps=EPS, alpha=ALPHA,
                steps=5, key=rng_key, threshold=thr, lam=10.0)

        a = run(jnp.float32(0.0))
        b = run(jnp.float32(100.0))  # penalty never active
        assert compiles == 1  # traced once
        assert not np.array_equal(np.asarray(a), np.asarray(b))


class TestDetectorAwareFGSM:
    def test_single_step_in_ball(self, tiny_logits_fn, image_batch):
        x = jnp.asarray(image_batch)
        y = jnp.argmax(tiny_logits_fn(x), -1)
        x_adv = detector_aware_fgsm(
            tiny_logits_fn, _toy_score, x, y, eps=EPS, threshold=0.5, lam=1.0)
        assert float(jnp.max(jnp.abs(x_adv - x))) <= EPS + 1e-6
        assert float(x_adv.min()) >= 0.0 and float(x_adv.max()) <= 1.0


@pytest.mark.slow
class TestDefenseEvalIntegration:
    def test_detector_aware_cell_counters(self, tiny_resnet, rng_key):
        from image_recognition_adversarial_example_attack_tpu.eval.defense_eval import (
            STAT_KEYS,
            DefenseEvalConfig,
            make_defense_eval_fn,
        )

        model, variables = tiny_resnet
        ffn = make_features_fn(model, variables, IMAGENET_MEAN, IMAGENET_STD)
        lf = lambda xx: model.apply(variables, xx)  # noqa: E731
        x = jnp.asarray(np.random.RandomState(3).rand(4, 32, 32, 3), np.float32)
        y = jnp.argmax(lf(x), -1)
        cfg = DefenseEvalConfig(attack_name="pgd", eps=EPS, alpha=ALPHA,
                                steps=3, detector_aware=True,
                                detector_lam=2.0)
        out = make_defense_eval_fn(lf, ffn, cfg)(x, y, 1.0, rng_key)
        for k in STAT_KEYS:
            v = np.asarray(out[k])
            assert v.shape == (4,)
            assert set(np.unique(v)) <= {0, 1}
        assert float(jnp.max(jnp.abs(out["x_adv"] - x))) <= EPS + 1e-6

    def test_detector_aware_feature_score_drops(self, tiny_resnet, rng_key):
        """Against the REFERENCE feature-statistics detector, the aware
        attack's adv score must not exceed the oblivious attack's."""
        from image_recognition_adversarial_example_attack_tpu.eval.defense_eval import (
            DefenseEvalConfig,
            make_defense_eval_fn,
        )

        model, variables = tiny_resnet
        ffn = make_features_fn(model, variables, IMAGENET_MEAN, IMAGENET_STD)
        lf = lambda xx: model.apply(variables, xx)  # noqa: E731
        x = jnp.asarray(np.random.RandomState(4).rand(4, 32, 32, 3), np.float32)
        y = jnp.argmax(lf(x), -1)
        base = dict(attack_name="pgd", eps=EPS, alpha=ALPHA, steps=10)
        # threshold 0: the aware attack minimizes the score outright
        aware_cfg = DefenseEvalConfig(**base, detector_aware=True,
                                      detector_lam=50.0, detector_margin=1.0)
        obl_cfg = DefenseEvalConfig(**base)
        x_aware = make_defense_eval_fn(lf, ffn, aware_cfg)(x, y, 0.0, rng_key)["x_adv"]
        x_obl = make_defense_eval_fn(lf, ffn, obl_cfg)(x, y, 0.0, rng_key)["x_adv"]
        s_aware = float(jnp.mean(feature_score(ffn, x_aware)))
        s_obl = float(jnp.mean(feature_score(ffn, x_obl)))
        assert s_aware <= s_obl + 1e-6

    def test_non_gradient_attack_rejected(self, tiny_resnet, rng_key):
        from image_recognition_adversarial_example_attack_tpu.eval.defense_eval import (
            DefenseEvalConfig,
            make_defense_eval_fn,
        )

        model, variables = tiny_resnet
        ffn = make_features_fn(model, variables, IMAGENET_MEAN, IMAGENET_STD)
        lf = lambda xx: model.apply(variables, xx)  # noqa: E731
        x = jnp.zeros((2, 32, 32, 3), jnp.float32)
        y = jnp.zeros((2,), jnp.int32)
        cfg = DefenseEvalConfig(attack_name="cw", eps=EPS, alpha=ALPHA,
                                steps=2, cw_steps=2, detector_aware=True)
        with pytest.raises(ValueError, match="detector_aware"):
            make_defense_eval_fn(lf, ffn, cfg)(x, y, 1.0, rng_key)

    def test_cli_rejects_non_gradient_attacks(self):
        from image_recognition_adversarial_example_attack_tpu.cli.defense_experiments import (
            main,
        )

        # the gate fires before any image/model work, so no fixture needed
        with pytest.raises(SystemExit, match="detector_aware"):
            main(["--image", "does_not_matter.jpg",
                  "--attacks", "cw", "--detector_aware",
                  "--detector_threshold", "1.0"])
