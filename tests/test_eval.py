"""Evaluation-layer tests: defense-eval unit, transfer, trajectory, engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_recognition_adversarial_example_attack_tpu.attacks import AttackParams
from image_recognition_adversarial_example_attack_tpu.defenses.detector import (
    make_features_fn,
)
from image_recognition_adversarial_example_attack_tpu.core.constants import (
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from image_recognition_adversarial_example_attack_tpu.eval.defense_eval import (
    STAT_KEYS,
    DefenseEvalConfig,
    aggregate_stats,
    make_defense_eval_fn,
    summary_line,
)
from image_recognition_adversarial_example_attack_tpu.eval.trajectory import (
    fgsm_trajectory,
    pgd_trajectory,
)
from image_recognition_adversarial_example_attack_tpu.eval.transfer import (
    asr,
    transfer_attack_batch,
)


class TestDefenseEval:
    def test_counter_consistency(self, tiny_logits_fn, tiny_resnet, image_batch, rng_key):
        model, variables = tiny_resnet
        ffn = make_features_fn(model, variables, IMAGENET_MEAN, IMAGENET_STD)
        x = jnp.asarray(np.random.RandomState(1).rand(4, 32, 32, 3), np.float32)
        lf = lambda xx: model.apply(variables, xx)  # noqa: E731
        y = jnp.argmax(lf(x), -1)
        cfg = DefenseEvalConfig(attack_name="pgd", eps=8 / 255, alpha=2 / 255,
                                steps=3, cw_steps=2)
        fn = make_defense_eval_fn(lf, ffn, cfg)
        out = fn(x, y, 1.0, rng_key)

        for k in STAT_KEYS:
            v = np.asarray(out[k])
            assert v.shape == (4,)
            assert set(np.unique(v)) <= {0, 1}

        # y_true came from the clean prediction => clean_correct all 1
        np.testing.assert_array_equal(np.asarray(out["clean_correct"]), 1)
        # bypass requires attack success and no flag
        bypass = np.asarray(out["detector_attack_success"])
        succ = np.asarray(out["attack_success"])
        flag = np.asarray(out["detector_flags_adv"])
        np.testing.assert_array_equal(bypass, succ * (1 - flag))
        # x_adv within the eps ball
        linf = float(jnp.max(jnp.abs(out["x_adv"] - x)))
        assert linf <= 8 / 255 + 1e-6

    @pytest.mark.slow
    def test_dynamic_eps_matches_static_with_one_compile(
        self, tiny_logits_fn, tiny_resnet, image_batch, rng_key
    ):
        """The dynamic-eps program is bitwise-equal to per-eps static
        programs for every attack, and one compile serves the whole sweep."""
        from image_recognition_adversarial_example_attack_tpu.eval.defense_eval import (
            make_defense_eval_fn_dynamic_eps,
        )

        model, variables = tiny_resnet
        ffn = make_features_fn(model, variables, IMAGENET_MEAN, IMAGENET_STD)
        lf = lambda xx: model.apply(variables, xx)  # noqa: E731
        x = jnp.asarray(np.random.RandomState(2).rand(4, 32, 32, 3), np.float32)
        y = jnp.argmax(lf(x), -1)
        eps_list = [4 / 255, 8 / 255, 16 / 255]

        for attack in ("fgsm", "pgd", "mifgsm", "dim", "tim"):
            base = DefenseEvalConfig(attack_name=attack, eps=0.0,
                                     alpha=2 / 255, steps=2, cw_steps=2)
            dyn = make_defense_eval_fn_dynamic_eps(lf, ffn, base)
            for eps in eps_list:
                from dataclasses import replace

                static_fn = make_defense_eval_fn(lf, ffn, replace(base, eps=eps))
                want = static_fn(x, y, 1.0, rng_key)
                got = dyn(x, y, 1.0, rng_key, jnp.float32(eps))
                for k in (*STAT_KEYS, "x_adv"):
                    np.testing.assert_array_equal(
                        np.asarray(got[k]), np.asarray(want[k]),
                        err_msg=f"{attack} eps={eps} {k}")
            assert dyn._cache_size() == 1, attack  # one program for the sweep

    def test_aggregate_and_summary_format(self):
        per_sample = {k: jnp.asarray([1, 0, 1]) for k in STAT_KEYS}
        stats = aggregate_stats(per_sample)
        assert stats["count"] == 3 and stats["attack_success"] == 2
        line = summary_line("pgd", 8 / 255, stats)
        assert line == (
            "attack=pgd, eps=0.03137, attack_success=0.667, "
            "preproc_defense_acc=0.667, detector_clean_pass_rate=0.333, "
            "detector_adv_flag_rate=0.667, detector_attack_success=0.667"
        )

    def test_aggregate_trims_padding(self):
        per_sample = {k: jnp.asarray([1, 1, 1, 1]) for k in STAT_KEYS}
        stats = aggregate_stats(per_sample, n_valid=2)
        assert stats["count"] == 2 and stats["attack_success"] == 2


class TestTransfer:
    def test_conventions(self, tiny_logits_fn, image_batch, rng_key):
        x = jnp.asarray(image_batch)
        params = AttackParams(eps=8 / 255, alpha=2 / 255, steps=3)
        targets = {"self": tiny_logits_fn}
        for convention in ("source-label", "blackbox"):
            cell = transfer_attack_batch(tiny_logits_fn, targets, x, "pgd",
                                         params, rng_key, convention=convention)
            assert cell.x_adv.shape == x.shape
            assert set(np.unique(np.asarray(cell.source_success))) <= {0, 1}
            # target == source model: both conventions must agree here
            np.testing.assert_array_equal(
                np.asarray(cell.target_success["self"]),
                np.asarray(cell.source_success),
            )

    def test_invalid_convention(self, tiny_logits_fn, image_batch, rng_key):
        import pytest

        with pytest.raises(ValueError):
            transfer_attack_batch(tiny_logits_fn, {}, jnp.asarray(image_batch),
                                  "pgd", AttackParams(), rng_key, convention="bogus")

    def test_asr_helper(self):
        assert asr(jnp.asarray([1, 0, 1, 0])) == 0.5
        assert asr(jnp.asarray([1, 1, 1, 1]), n_valid=2) == 1.0


class TestTrajectory:
    def test_pgd_trajectory_shapes_and_consistency(self, tiny_logits_fn, image_batch, rng_key):
        x = jnp.asarray(image_batch)
        y = jnp.argmax(tiny_logits_fn(x), -1)
        steps = 5
        traj = pgd_trajectory(tiny_logits_fn, x, y, eps=8 / 255, alpha=2 / 255,
                              steps=steps, key=rng_key, track_classes=(0, 1))
        assert traj.probs.shape == (steps + 1, 2)
        assert traj.l2.shape == (steps + 1,)
        assert float(traj.l2[0]) <= float(traj.l2[-1]) + 1e-4  # grows (mostly)
        assert np.all(np.asarray(traj.probs) >= 0)
        # final iterate equals a pgd run with the same key
        from image_recognition_adversarial_example_attack_tpu.attacks.pgd import (
            pgd_linf_attack,
        )

        ref = pgd_linf_attack(tiny_logits_fn, x, y, eps=8 / 255, alpha=2 / 255,
                              steps=steps, key=rng_key)
        np.testing.assert_allclose(np.asarray(traj.x_adv), np.asarray(ref), atol=1e-6)

    def test_fgsm_trajectory(self, tiny_logits_fn, image_batch):
        x = jnp.asarray(image_batch)
        y = jnp.argmax(tiny_logits_fn(x), -1)
        traj = fgsm_trajectory(tiny_logits_fn, x, y, eps=8 / 255, track_classes=(0, 1))
        assert traj.probs.shape == (2, 2)
        assert float(traj.l2[0]) == 0.0
        assert float(traj.l2[1]) > 0.0


class TestRobustEval:
    @pytest.mark.slow
    def test_autoattack_lite(self, tiny_logits_fn, image_batch, rng_key):
        from image_recognition_adversarial_example_attack_tpu.eval.robust_eval import (
            autoattack_lite,
            robust_accuracy,
        )

        x = jnp.asarray(image_batch)
        y = jnp.argmax(tiny_logits_fn(x), -1)
        res = jax.jit(
            lambda x, y, k: autoattack_lite(tiny_logits_fn, x, y, eps=8 / 255,
                                            key=k, apgd_steps=10,
                                            square_steps=20, deepfool_steps=10)
        )(x, y, rng_key)

        # worst-case iterate stays in the ball and [0,1]
        assert float(jnp.max(jnp.abs(res.x_adv - x))) <= 8 / 255 + 1e-6
        assert float(res.x_adv.min()) >= 0.0 and float(res.x_adv.max()) <= 1.0
        # success mask is the union, and the returned iterate realizes it
        np.testing.assert_array_equal(
            np.asarray(res.success),
            np.asarray(res.success_apgd | res.success_square
                       | res.success_deepfool))
        # deepfool successes only count inside the eps ball, so the
        # worst-case iterate never leaves it (asserted above)
        pred = np.asarray(jnp.argmax(tiny_logits_fn(res.x_adv), -1))
        np.testing.assert_array_equal(pred != np.asarray(y),
                                      np.asarray(res.success))
        acc = robust_accuracy(res, clean_correct=jnp.ones_like(y, bool))
        assert 0.0 <= acc <= 1.0
        np.testing.assert_allclose(acc, 1.0 - np.asarray(res.success).mean(),
                                   atol=1e-6)
