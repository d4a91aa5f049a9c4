"""JSMA (L0 greedy saliency attack) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_recognition_adversarial_example_attack_tpu.attacks import (
    AttackParams,
    jsma_attack,
    run_attack,
)


def _l0(a, b):
    return np.asarray(jnp.sum(jnp.abs(a - b).reshape(a.shape[0], -1) > 1e-8,
                              axis=-1))


class TestJSMA:
    def test_l0_budget_and_range(self, tiny_logits_fn, image_batch):
        x = jnp.asarray(image_batch)
        y = jnp.argmax(tiny_logits_fn(x), -1)
        steps = 12
        x_adv = jsma_attack(tiny_logits_fn, x, y, steps=steps)
        changed = _l0(x_adv, x)
        assert (changed <= steps).all()
        assert float(x_adv.min()) >= 0.0 and float(x_adv.max()) <= 1.0

    def test_deterministic_no_key(self, tiny_logits_fn, image_batch):
        x = jnp.asarray(image_batch)
        y = jnp.argmax(tiny_logits_fn(x), -1)
        a = jsma_attack(tiny_logits_fn, x, y, steps=6)
        b = jsma_attack(tiny_logits_fn, x, y, steps=6)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_effectiveness_with_budget(self, tiny_logits_fn, image_batch):
        """Saturating a handful of high-saliency features must move at
        least one sample off its clean prediction on the tiny model."""
        x = jnp.asarray(image_batch)
        y = jnp.argmax(tiny_logits_fn(x), -1)
        x_adv = jsma_attack(tiny_logits_fn, x, y, steps=40)
        flipped = np.asarray(jnp.argmax(tiny_logits_fn(x_adv), -1) != y)
        assert flipped.any()
        # and it used strictly fewer features than an Linf attack touches
        assert (_l0(x_adv, x) <= 40).all()

    def test_already_on_target_freezes(self, tiny_logits_fn, image_batch):
        """y_target == clean prediction: every sample starts 'done', so
        the attack returns x unchanged (the freeze path)."""
        x = jnp.asarray(image_batch)
        y_pred = jnp.argmax(tiny_logits_fn(x), -1)
        x_adv = jsma_attack(tiny_logits_fn, x, y_pred, steps=8,
                            y_target=y_pred)
        np.testing.assert_array_equal(np.asarray(x_adv), np.asarray(x))

    def test_theta_controls_magnitude(self, tiny_logits_fn, image_batch):
        x = jnp.asarray(image_batch)
        y = jnp.argmax(tiny_logits_fn(x), -1)
        x_small = jsma_attack(tiny_logits_fn, x, y, steps=5, theta=0.1)
        delta = np.abs(np.asarray(x_small - x))
        assert delta.max() <= 0.1 + 1e-6

    def test_dispatch(self, tiny_logits_fn, image_batch, rng_key):
        x = jnp.asarray(image_batch)
        y = jnp.argmax(tiny_logits_fn(x), -1)
        params = AttackParams(jsma_steps=6, jsma_theta=1.0)
        x_adv = run_attack("jsma", tiny_logits_fn, x, y, params, rng_key)
        assert (_l0(x_adv, x) <= 6).all()
        assert float(x_adv.min()) >= 0.0 and float(x_adv.max()) <= 1.0

    def test_jittable_one_program(self, tiny_logits_fn, image_batch):
        x = jnp.asarray(image_batch)
        y = jnp.argmax(tiny_logits_fn(x), -1)
        fn = jax.jit(lambda xx, yy: jsma_attack(tiny_logits_fn, xx, yy,
                                                steps=4))
        np.testing.assert_array_equal(
            np.asarray(fn(x, y)),
            np.asarray(jsma_attack(tiny_logits_fn, x, y, steps=4)))


@pytest.mark.slow
def test_jsma_on_defense_grid(tiny_resnet, rng_key):
    """The L0 cell slots into the standard evaluation unit."""
    from image_recognition_adversarial_example_attack_tpu.core.constants import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )
    from image_recognition_adversarial_example_attack_tpu.defenses.detector import (
        make_features_fn,
    )
    from image_recognition_adversarial_example_attack_tpu.eval.defense_eval import (
        STAT_KEYS,
        DefenseEvalConfig,
        make_defense_eval_fn,
    )

    model, variables = tiny_resnet
    ffn = make_features_fn(model, variables, IMAGENET_MEAN, IMAGENET_STD)
    lf = lambda xx: model.apply(variables, xx)  # noqa: E731
    x = jnp.asarray(np.random.RandomState(7).rand(4, 32, 32, 3), np.float32)
    y = jnp.argmax(lf(x), -1)
    cfg = DefenseEvalConfig(attack_name="jsma", eps=8 / 255, alpha=2 / 255,
                            steps=2, jsma_steps=6)
    out = make_defense_eval_fn(lf, ffn, cfg)(x, y, 1.0, rng_key)
    for k in STAT_KEYS:
        v = np.asarray(out[k])
        assert v.shape == (4,) and set(np.unique(v)) <= {0, 1}
    assert (_l0(out["x_adv"], x) <= 6).all()
