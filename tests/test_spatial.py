"""Spatial attack (attacks/spatial.py): affine warp correctness (identity,
pure translation, 180-degree rotation, border fill), budget respect,
grid/random search composition, and dispatcher integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_recognition_adversarial_example_attack_tpu.attacks import (
    AttackParams,
    affine_warp,
    run_attack,
    spatial_attack,
)


@pytest.fixture(scope="module")
def image():
    rng = np.random.RandomState(21)
    return jnp.asarray(rng.uniform(0.1, 0.9, (2, 16, 16, 3)).astype(np.float32))


def _p(image, v):
    return jnp.full((image.shape[0],), v, dtype=image.dtype)


class TestAffineWarp:
    def test_identity(self, image):
        out = affine_warp(image, _p(image, 0.0), _p(image, 0.0), _p(image, 0.0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(image),
                                   atol=1e-6)

    def test_integer_translation(self, image):
        """tx=+2 moves content 2 columns right; vacated columns take fill."""
        out = affine_warp(image, _p(image, 0.0), _p(image, 2.0),
                          _p(image, 0.0))
        np.testing.assert_allclose(np.asarray(out[:, :, 2:]),
                                   np.asarray(image[:, :, :-2]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out[:, :, :2]), 0.0, atol=1e-6)

    def test_rotation_180(self, image):
        """A half turn about the center is an exact double flip (integer
        sample positions — bilinear introduces no blur)."""
        out = affine_warp(image, _p(image, 180.0), _p(image, 0.0),
                          _p(image, 0.0))
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(image[:, ::-1, ::-1]),
                                   atol=1e-5)

    def test_rotation_90_square(self, image):
        out = affine_warp(image, _p(image, 90.0), _p(image, 0.0),
                          _p(image, 0.0))
        # 90 deg on a square grid is a permutation of pixels: energy exact
        np.testing.assert_allclose(float(jnp.sum(out)),
                                   float(jnp.sum(image)), rtol=1e-5)

    def test_out_of_image_fills(self, image):
        out = affine_warp(image, _p(image, 0.0), _p(image, 100.0),
                          _p(image, 0.0), fill=0.25)
        np.testing.assert_allclose(np.asarray(out), 0.25, atol=1e-6)

    def test_per_sample_params(self, image):
        """Each batch entry gets its own transform."""
        angle = jnp.asarray([0.0, 180.0], dtype=image.dtype)
        z = _p(image, 0.0)
        out = affine_warp(image, angle, z, z)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(image[0]),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(out[1]),
                                   np.asarray(image[1, ::-1, ::-1]),
                                   atol=1e-5)

    def test_grad_wrt_image(self, image):
        g = jax.grad(lambda x: jnp.sum(affine_warp(
            x, _p(image, 10.0), _p(image, 1.5), _p(image, -0.5)) ** 2))(image)
        assert bool(jnp.isfinite(g).all())
        assert float(jnp.abs(g).max()) > 0.0


class TestAttack:
    def test_fools_tiny_model(self, tiny_logits_fn, rng_key):
        x = jnp.asarray(np.random.RandomState(5).uniform(
            0.2, 0.8, (4, 16, 16, 3)).astype(np.float32))
        y = jnp.argmax(tiny_logits_fn(x), -1)
        res = spatial_attack(tiny_logits_fn, x, y, candidates=20,
                             key=rng_key)
        assert res.x_adv.shape == x.shape
        assert float(jnp.min(res.x_adv)) >= 0.0
        assert float(jnp.max(res.x_adv)) <= 1.0
        pred = jnp.argmax(tiny_logits_fn(res.x_adv), -1)
        fooled = pred != y
        assert bool(jnp.all(~res.success | fooled))
        assert int(jnp.sum(res.success)) >= 2  # random-init net: easy marks

    def test_params_respect_budget(self, tiny_logits_fn, rng_key):
        x = jnp.asarray(np.random.RandomState(6).uniform(
            0.2, 0.8, (4, 16, 16, 3)).astype(np.float32))
        y = jnp.argmax(tiny_logits_fn(x), -1)
        res = spatial_attack(tiny_logits_fn, x, y, max_rot=15.0,
                             max_trans=0.125, candidates=8, key=rng_key)
        p = np.asarray(res.params)
        assert np.all(np.abs(p[:, 0]) <= 15.0 + 1e-5)
        assert np.all(np.abs(p[:, 1:]) <= 0.125 * 16 + 1e-5)

    def test_grid_only_needs_no_key(self, tiny_logits_fn):
        x = jnp.asarray(np.random.RandomState(7).uniform(
            0.2, 0.8, (2, 16, 16, 3)).astype(np.float32))
        y = jnp.argmax(tiny_logits_fn(x), -1)
        res = spatial_attack(tiny_logits_fn, x, y, candidates=0,
                             grid_rot=5, grid_trans=3)
        assert bool(jnp.isfinite(res.x_adv).all())
        # deterministic: a rerun is bitwise identical
        res2 = spatial_attack(tiny_logits_fn, x, y, candidates=0,
                              grid_rot=5, grid_trans=3)
        np.testing.assert_array_equal(np.asarray(res.x_adv),
                                      np.asarray(res2.x_adv))

    def test_identity_grid_cannot_fool_correct_model(self, tiny_logits_fn):
        """A 1x1 grid is the identity transform only: predictions match the
        clean ones, so success is everywhere False."""
        x = jnp.asarray(np.random.RandomState(8).uniform(
            0.2, 0.8, (4, 16, 16, 3)).astype(np.float32))
        y = jnp.argmax(tiny_logits_fn(x), -1)
        res = spatial_attack(tiny_logits_fn, x, y, candidates=0,
                             grid_rot=1, grid_trans=1)
        assert not bool(jnp.any(res.success))
        np.testing.assert_allclose(np.asarray(res.x_adv), np.asarray(x),
                                   atol=1e-5)

    def test_empty_search_raises(self, tiny_logits_fn):
        x = jnp.zeros((1, 16, 16, 3), jnp.float32)
        y = jnp.zeros((1,), jnp.int32)
        with pytest.raises(ValueError, match="empty spatial search"):
            spatial_attack(tiny_logits_fn, x, y, candidates=0)

    def test_one_sided_grid_raises(self, tiny_logits_fn, rng_key):
        """Setting only one of grid_rot/grid_trans must error loudly, not
        silently drop the grid and run a weaker random-only search."""
        x = jnp.zeros((1, 16, 16, 3), jnp.float32)
        y = jnp.zeros((1,), jnp.int32)
        with pytest.raises(ValueError, match="BOTH grid_rot and grid_trans"):
            spatial_attack(tiny_logits_fn, x, y, candidates=4,
                           grid_rot=5, key=rng_key)
        with pytest.raises(ValueError, match="BOTH grid_rot and grid_trans"):
            spatial_attack(tiny_logits_fn, x, y, candidates=0, grid_trans=3)

    def test_random_without_key_raises(self, tiny_logits_fn):
        x = jnp.zeros((1, 16, 16, 3), jnp.float32)
        y = jnp.zeros((1,), jnp.int32)
        with pytest.raises(ValueError, match="explicit key"):
            spatial_attack(tiny_logits_fn, x, y, candidates=4)

    def test_jits_as_one_program(self, tiny_logits_fn, rng_key):
        x = jnp.asarray(np.random.RandomState(9).uniform(
            0.2, 0.8, (2, 16, 16, 3)).astype(np.float32))
        y = jnp.argmax(tiny_logits_fn(x), -1)
        fn = jax.jit(lambda a, b, k: spatial_attack(
            tiny_logits_fn, a, b, candidates=4, grid_rot=3, grid_trans=3,
            key=k).x_adv)
        out = fn(x, y, rng_key)
        assert bool(jnp.isfinite(out).all())

    def test_dispatcher(self, tiny_logits_fn):
        x = jnp.asarray(np.random.RandomState(10).uniform(
            0.2, 0.8, (2, 16, 16, 3)).astype(np.float32))
        y = jnp.argmax(tiny_logits_fn(x), -1)
        params = AttackParams(spatial_candidates=4)
        out = run_attack("spatial", tiny_logits_fn, x, y, params)
        assert out.shape == x.shape
        assert bool(jnp.isfinite(out).all())

    def test_dispatcher_rejects_target(self, tiny_logits_fn):
        x = jnp.zeros((1, 16, 16, 3), jnp.float32)
        y = jnp.zeros((1,), jnp.int32)
        with pytest.raises(ValueError, match="untargeted"):
            run_attack("spatial", tiny_logits_fn, x, y, AttackParams(),
                       y_target=jnp.ones((1,), jnp.int32))
