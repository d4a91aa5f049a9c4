"""Randomization defense (defenses/randomization.py): geometry, gradients,
EOT composition, and the oblivious-vs-defended effect on the tiny model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_recognition_adversarial_example_attack_tpu.defenses import (
    random_resize_pad,
    resize_pad,
    resize_pad_transform,
)


@pytest.fixture(scope="module")
def big_batch():
    rng = np.random.RandomState(11)
    return jnp.asarray(rng.uniform(0.2, 0.8, (16, 16, 16, 3)).astype(np.float32))


class TestResizePadGeometry:
    def test_scale_one_offset_zero_is_identity(self, image_batch):
        x = jnp.asarray(image_batch)
        b = x.shape[0]
        out = resize_pad(x, jnp.ones(b), jnp.zeros(b), jnp.zeros(b))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)

    def test_half_scale_pads_uncovered_canvas(self, image_batch):
        x = jnp.asarray(image_batch)
        b = x.shape[0]
        out = resize_pad(x, jnp.full(b, 0.5), jnp.zeros(b), jnp.zeros(b),
                         pad_value=0.25)
        got = np.asarray(out)
        # strictly uncovered area (one pixel past the image's soft edge)
        np.testing.assert_allclose(got[:, 9:, :, :], 0.25, atol=1e-5)
        np.testing.assert_allclose(got[:, :, 9:, :], 0.25, atol=1e-5)
        # covered area is a real downscale, not pad
        assert float(np.abs(got[:, :8, :8, :] - 0.25).max()) > 0.05

    def test_offset_moves_the_image(self, image_batch):
        x = jnp.asarray(image_batch)
        b = x.shape[0]
        out = resize_pad(x, jnp.full(b, 0.5), jnp.full(b, 8.0), jnp.full(b, 8.0),
                         pad_value=0.0)
        got = np.asarray(out)
        # now the TOP-LEFT is uncovered and the image lives bottom-right
        np.testing.assert_allclose(got[:, :7, :, :], 0.0, atol=1e-5)
        np.testing.assert_allclose(got[:, :, :7, :], 0.0, atol=1e-5)
        assert float(np.abs(got[:, 9:, 9:, :]).max()) > 0.05

    def test_range_and_shape_preserved(self, big_batch, rng_key):
        out = random_resize_pad(big_batch, rng_key)
        assert out.shape == big_batch.shape
        assert out.dtype == big_batch.dtype
        assert float(jnp.min(out)) >= 0.0 - 1e-5
        assert float(jnp.max(out)) <= 1.0 + 1e-5

    def test_deterministic_given_key_fresh_across_keys(self, big_batch, rng_key):
        a = random_resize_pad(big_batch, rng_key)
        b = random_resize_pad(big_batch, rng_key)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        c = random_resize_pad(big_batch, jax.random.fold_in(rng_key, 1))
        assert float(jnp.max(jnp.abs(a - c))) > 1e-3

    def test_jit_compatible_traced_key(self, big_batch, rng_key):
        f = jax.jit(lambda x, k: random_resize_pad(x, k))
        out = f(big_batch, rng_key)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(random_resize_pad(big_batch, rng_key)),
            atol=1e-6)

    def test_gradients_flow_through_defense(self, big_batch, rng_key):
        def loss(x):
            return jnp.sum(jnp.square(random_resize_pad(x, rng_key)))

        g = jax.grad(loss)(big_batch)
        assert float(jnp.max(jnp.abs(g))) > 0.0
        assert bool(jnp.all(jnp.isfinite(g)))


class TestRandomizationDefenseEffect:
    def test_eot_wrapper_composes(self, tiny_logits_fn, big_batch, rng_key):
        from image_recognition_adversarial_example_attack_tpu.attacks import (
            make_eot_logits_fn,
        )

        deployed = make_eot_logits_fn(
            tiny_logits_fn, rng_key, n_samples=1,
            transform=resize_pad_transform(min_scale=0.7))
        logp = deployed(big_batch)
        assert logp.shape == (16, 8)
        # log of a softmax average: normalized probabilities
        np.testing.assert_allclose(
            np.asarray(jnp.sum(jnp.exp(logp), axis=-1)), 1.0, atol=1e-4)

    @pytest.mark.slow
    def test_oblivious_attack_weakened_adaptive_restores(self, tiny_logits_fn, big_batch):
        """The headline claim of any randomization defense, end-to-end:
        PGD vs the PLAIN model transfers worse to the randomized model
        than it does to the plain model; EOT-adaptive PGD (attacking the
        defense's own expectation) recovers most of the gap."""
        from image_recognition_adversarial_example_attack_tpu.attacks import (
            make_eot_logits_fn,
            pgd_linf_attack,
        )

        x = big_batch
        y = jnp.argmax(tiny_logits_fn(x), -1)
        akey = jax.random.PRNGKey(0)

        # the deployed randomized classifier, averaged for a stable verdict
        deployed = make_eot_logits_fn(
            tiny_logits_fn, jax.random.PRNGKey(99), n_samples=32,
            transform=resize_pad_transform(min_scale=0.7))
        y_dep = jnp.argmax(deployed(x), -1)

        # oblivious: attack the plain model, deploy against the defense
        x_obl = pgd_linf_attack(tiny_logits_fn, x, y, eps=0.05, alpha=0.01,
                                steps=20, key=akey)
        fooled_plain = float(jnp.mean(jnp.argmax(tiny_logits_fn(x_obl), -1) != y))
        fooled_obl = float(jnp.mean(jnp.argmax(deployed(x_obl), -1) != y_dep))

        # adaptive: EOT over the defense's randomness inside the attack
        attacker_view = make_eot_logits_fn(
            tiny_logits_fn, jax.random.PRNGKey(7), n_samples=8,
            transform=resize_pad_transform(min_scale=0.7))
        x_ada = pgd_linf_attack(attacker_view, x, y_dep, eps=0.05, alpha=0.01,
                                steps=20, key=akey)
        fooled_ada = float(jnp.mean(jnp.argmax(deployed(x_ada), -1) != y_dep))

        assert fooled_obl < fooled_plain
        assert fooled_ada > fooled_obl
