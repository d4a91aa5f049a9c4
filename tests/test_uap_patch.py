"""Universal-perturbation trainer (attacks/uap.py) and adversarial patch
(attacks/patch.py) unit tests on the tiny deterministic model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_recognition_adversarial_example_attack_tpu.attacks import (
    apply_patch,
    apply_uap,
    patch_attack,
    patch_success_rate,
    sample_placements,
    uap_attack,
    uap_fooling_rate,
    universal_perturbation,
)


def _labels(logits_fn, x):
    return jnp.argmax(logits_fn(x), axis=-1)


@pytest.fixture(scope="module")
def uap_data():
    rng = np.random.RandomState(7)
    return jnp.asarray(rng.uniform(0.2, 0.8, (8, 16, 16, 3)).astype(np.float32))


class TestUAPTrainer:
    def test_invariants_and_fooling(self, tiny_logits_fn, uap_data, rng_key):
        x = uap_data
        y = _labels(tiny_logits_fn, x)
        res = uap_attack(tiny_logits_fn, x, y, eps=0.1, alpha=0.02,
                         epochs=20, key=rng_key)
        assert res.delta.shape == x.shape[1:]
        assert res.delta.dtype == x.dtype
        assert float(jnp.max(jnp.abs(res.delta))) <= 0.1 + 1e-6
        assert res.loss_per_epoch.shape == (20,)
        # ascent diagnostic improves over training
        assert float(res.loss_per_epoch[-1]) > float(res.loss_per_epoch[0])
        fooled = float(uap_fooling_rate(tiny_logits_fn, x, res.delta))
        assert fooled >= 0.5

    def test_minibatch_path_respects_ball(self, tiny_logits_fn, uap_data, rng_key):
        x = uap_data
        y = _labels(tiny_logits_fn, x)
        res = uap_attack(tiny_logits_fn, x, y, eps=0.05, epochs=4,
                         batch_size=3, key=rng_key)  # 8 // 3 = 2 batches, tail dropped
        assert float(jnp.max(jnp.abs(res.delta))) <= 0.05 + 1e-6

    @pytest.mark.slow
    def test_targeted_moves_predictions_to_target(self, tiny_logits_fn, uap_data, rng_key):
        x = uap_data
        y = _labels(tiny_logits_fn, x)
        # a universal delta must push ALL samples to ONE class — only
        # reachable for a class the model already ranks highly (the tiny
        # model is near-saturated on its top class)
        target = int(jnp.argsort(tiny_logits_fn(x).mean(0))[-2])
        res = uap_attack(tiny_logits_fn, x, y, eps=0.15, alpha=0.03,
                         epochs=30, key=rng_key, y_target=target)
        pred = _labels(tiny_logits_fn, apply_uap(x, res.delta))
        hit = float(jnp.mean((pred == target).astype(jnp.float32)))
        clean_hit = float(jnp.mean((y == target).astype(jnp.float32)))
        assert hit > clean_hit
        assert hit >= 0.5

    @pytest.mark.slow
    def test_deterministic_given_key(self, tiny_logits_fn, uap_data, rng_key):
        x = uap_data
        y = _labels(tiny_logits_fn, x)
        a = uap_attack(tiny_logits_fn, x, y, eps=0.05, epochs=3,
                       batch_size=4, key=rng_key)
        b = uap_attack(tiny_logits_fn, x, y, eps=0.05, epochs=3,
                       batch_size=4, key=rng_key)
        np.testing.assert_array_equal(np.asarray(a.delta), np.asarray(b.delta))

    def test_full_batch_delegate_matches_trainer(self, tiny_logits_fn, uap_data, rng_key):
        """eot.universal_perturbation is the epochs=steps one-batch case."""
        x = uap_data
        y = _labels(tiny_logits_fn, x)
        via_eot = universal_perturbation(tiny_logits_fn, x, y, eps=0.1,
                                         alpha=0.02, steps=5, key=rng_key)
        via_uap = uap_attack(tiny_logits_fn, x, y, eps=0.1, alpha=0.02,
                             epochs=5, key=rng_key, random_start=True).delta
        np.testing.assert_array_equal(np.asarray(via_eot), np.asarray(via_uap))

    def test_bad_batch_size_rejected(self, tiny_logits_fn, uap_data, rng_key):
        x = uap_data
        y = _labels(tiny_logits_fn, x)
        with pytest.raises(ValueError, match="batch_size"):
            uap_attack(tiny_logits_fn, x, y, eps=0.1, batch_size=9, key=rng_key)


class TestAdversarialPatch:
    def test_apply_patch_replaces_only_patch_region(self, image_batch):
        x = jnp.asarray(image_batch)
        patch = jnp.ones((4, 4, 3), x.dtype)
        rows = jnp.array([0, 2, 5, 12])
        cols = jnp.array([0, 3, 7, 12])
        rots = jnp.zeros((4,), jnp.int32)
        out = apply_patch(x, patch, rows=rows, cols=cols, rots=rots)
        for i in range(4):
            r, c = int(rows[i]), int(cols[i])
            np.testing.assert_array_equal(
                np.asarray(out[i, r:r + 4, c:c + 4]), np.ones((4, 4, 3), np.float32))
            mask = np.ones((16, 16), bool)
            mask[r:r + 4, c:c + 4] = False
            np.testing.assert_array_equal(
                np.asarray(out[i])[mask], np.asarray(x[i])[mask])

    def test_rotation_matches_rot90(self, image_batch):
        x = jnp.asarray(image_batch[:1])
        rng = np.random.RandomState(3)
        patch = jnp.asarray(rng.uniform(0, 1, (4, 4, 3)).astype(np.float32))
        for k in range(4):
            out = apply_patch(
                x, patch,
                rows=jnp.array([5]), cols=jnp.array([6]),
                rots=jnp.array([k], jnp.int32),
            )
            np.testing.assert_allclose(
                np.asarray(out[0, 5:9, 6:10]),
                np.asarray(jnp.rot90(patch, k)), atol=0)

    def test_sample_placements_in_bounds(self, rng_key):
        rows, cols, rots = sample_placements(rng_key, 64, (16, 16), 4)
        assert int(jnp.min(rows)) >= 0 and int(jnp.max(rows)) <= 12
        assert int(jnp.min(cols)) >= 0 and int(jnp.max(cols)) <= 12
        assert int(jnp.min(rots)) >= 0 and int(jnp.max(rots)) <= 3
        _, _, no_rot = sample_placements(rng_key, 64, (16, 16), 4,
                                         rotations=False)
        assert int(jnp.max(no_rot)) == 0

    @pytest.mark.slow
    def test_targeted_patch_trains_toward_target(self, tiny_logits_fn, uap_data, rng_key):
        x = uap_data
        y = _labels(tiny_logits_fn, x)
        # runner-up class: reachable for a universal patch (see UAP test)
        target = int(jnp.argsort(tiny_logits_fn(x).mean(0))[-2])
        res = patch_attack(tiny_logits_fn, x, y, patch_size=8, steps=120,
                           lr=0.05, key=rng_key, y_target=target)
        assert res.patch.shape == (8, 8, 3)
        assert float(jnp.min(res.patch)) >= 0.0
        assert float(jnp.max(res.patch)) <= 1.0
        assert res.loss_per_step.shape == (120,)
        # EOT objective improved over training
        assert float(res.loss_per_step[-1]) > float(res.loss_per_step[0])
        hit = float(patch_success_rate(
            tiny_logits_fn, x, res.patch,
            key=jax.random.fold_in(rng_key, 9), y_target=target))
        clean_hit = float(jnp.mean((y == target).astype(jnp.float32)))
        assert hit > clean_hit
        assert hit >= 0.5

    @pytest.mark.slow
    def test_untargeted_patch_and_success_rate(self, tiny_logits_fn, uap_data, rng_key):
        x = uap_data
        y = _labels(tiny_logits_fn, x)
        res = patch_attack(tiny_logits_fn, x, y, patch_size=8, steps=60,
                           lr=0.05, key=rng_key)
        fooled = float(patch_success_rate(
            tiny_logits_fn, x, res.patch,
            key=jax.random.fold_in(rng_key, 9), ys=y))
        assert 0.0 <= fooled <= 1.0

    @pytest.mark.slow
    def test_deterministic_given_key(self, tiny_logits_fn, image_batch, rng_key):
        x = jnp.asarray(image_batch)
        y = _labels(tiny_logits_fn, x)
        a = patch_attack(tiny_logits_fn, x, y, patch_size=4, steps=5,
                         key=rng_key, y_target=1)
        b = patch_attack(tiny_logits_fn, x, y, patch_size=4, steps=5,
                         key=rng_key, y_target=1)
        np.testing.assert_array_equal(np.asarray(a.patch), np.asarray(b.patch))

    def test_explicit_placement_api(self, image_batch):
        x = jnp.asarray(image_batch)
        patch = jnp.zeros((4, 4, 3))
        rows = cols = jnp.full((4,), 2, jnp.int32)
        # rots defaults to zeros when rotations=False
        out = apply_patch(x, patch, rows=rows, cols=cols, rotations=False)
        np.testing.assert_array_equal(
            np.asarray(out),
            np.asarray(apply_patch(x, patch, rows=rows, cols=cols,
                                   rots=jnp.zeros((4,), jnp.int32))))

    def test_errors(self, tiny_logits_fn, image_batch, rng_key):
        x = jnp.asarray(image_batch)
        y = _labels(tiny_logits_fn, x)
        with pytest.raises(ValueError, match="patch_size"):
            patch_attack(tiny_logits_fn, x, y, patch_size=17, key=rng_key)
        patch = jnp.zeros((4, 4, 3))
        with pytest.raises(ValueError, match="placements or a key"):
            apply_patch(x, patch)
        with pytest.raises(ValueError, match="together"):
            apply_patch(x, patch, rows=jnp.zeros((4,), jnp.int32))
        rows = cols = jnp.zeros((4,), jnp.int32)
        # rotations=True (default) needs explicit rots with explicit rows/cols
        with pytest.raises(ValueError, match="rots is required"):
            apply_patch(x, patch, rows=rows, cols=cols)
        # key alongside explicit placements is a caller bug, not a silent drop
        with pytest.raises(ValueError, match="not both"):
            apply_patch(x, patch, key=rng_key, rows=rows, cols=cols,
                        rots=rows)
