"""Loss-landscape slice tests (eval/landscape.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from image_recognition_adversarial_example_attack_tpu.eval.landscape import (
    Plane,
    adversarial_plane,
    loss_landscape,
)


def _ce(logits_fn, x, y):
    logp = jax.nn.log_softmax(logits_fn(x[None]), -1)
    return float(-logp[0, y])


class TestAdversarialPlane:
    def test_orthonormal_basis_and_scale(self, rng_key):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.uniform(0.3, 0.7, (8, 8, 3)), jnp.float32)
        delta = jnp.asarray(rng.randn(8, 8, 3) * 0.01, jnp.float32)
        plane = adversarial_plane(x, x + delta, rng_key)
        assert np.isclose(float(jnp.linalg.norm(plane.d1)), 1.0, atol=1e-5)
        assert np.isclose(float(jnp.linalg.norm(plane.d2)), 1.0, atol=1e-5)
        assert abs(float(jnp.sum(plane.d1 * plane.d2))) < 1e-5
        assert np.isclose(plane.scale, float(jnp.linalg.norm(delta)),
                          rtol=1e-5)

    def test_unit_coordinate_reaches_adv(self, rng_key):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.uniform(0.3, 0.7, (8, 8, 3)), jnp.float32)
        x_adv = jnp.clip(x + jnp.asarray(rng.randn(8, 8, 3) * 0.02,
                                         jnp.float32), 0, 1)
        plane = adversarial_plane(x, x_adv, rng_key)
        recon = x + plane.scale * plane.d1
        np.testing.assert_allclose(np.asarray(recon), np.asarray(x_adv),
                                   atol=1e-5)


class TestLossLandscape:
    def test_center_and_endpoint_values(self, tiny_logits_fn, image_batch,
                                        rng_key):
        x = jnp.asarray(image_batch)[0]
        y = int(jnp.argmax(tiny_logits_fn(x[None]), -1)[0])
        rng = np.random.RandomState(2)
        x_adv = jnp.clip(x + jnp.asarray(rng.randn(*x.shape) * 0.02,
                                         jnp.float32), 0, 1)
        plane = adversarial_plane(x, x_adv, rng_key)
        # span=1, grid=3 -> coords [-1, 0, 1]: center is x, (1,0) is x_adv
        grid = np.asarray(loss_landscape(tiny_logits_fn, x,
                                         jnp.asarray(y), plane,
                                         span=1.0, grid=3))
        assert grid.shape == (3, 3)
        assert np.isclose(grid[1, 1], _ce(tiny_logits_fn, x, y), atol=1e-4)
        assert np.isclose(grid[2, 1], _ce(tiny_logits_fn, x_adv, y),
                          atol=1e-4)
        assert np.isfinite(grid).all()

    def test_jit_and_degenerate_plane(self, tiny_logits_fn, image_batch,
                                      rng_key):
        """Zero perturbation falls back to a valid plane; the whole thing
        jits with the Plane as a traced argument."""
        x = jnp.asarray(image_batch)[0]
        y = jnp.asarray(0)
        plane = adversarial_plane(x, x, rng_key)
        assert np.isfinite(np.asarray(plane.d2)).all()
        fn = jax.jit(lambda xx, yy, p: loss_landscape(
            tiny_logits_fn, xx, yy, p, span=1.0, grid=5))
        grid = np.asarray(fn(x, y, plane))
        assert grid.shape == (5, 5) and np.isfinite(grid).all()

    def test_clip_keeps_points_valid(self, tiny_logits_fn, rng_key):
        """A huge span drives plane points far outside [0,1]; the landscape
        must still evaluate on the clipped (feasible) box."""
        x = jnp.full((16, 16, 3), 0.5, jnp.float32)
        d1 = jnp.zeros((16, 16, 3), jnp.float32).at[0, 0, 0].set(1.0)
        d2 = jnp.zeros((16, 16, 3), jnp.float32).at[0, 0, 1].set(1.0)
        plane = Plane(d1=d1, d2=d2, scale=100.0)
        grid = np.asarray(loss_landscape(tiny_logits_fn, x, jnp.asarray(1),
                                         plane, span=1.0, grid=3))
        assert np.isfinite(grid).all()
