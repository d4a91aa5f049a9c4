"""SLIDE / PGD-L1 (Tramèr & Boneh 2019) and the Duchi L1-ball projection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_recognition_adversarial_example_attack_tpu.attacks import (
    AttackParams,
    pgd_l1_attack,
    project_l1_ball,
    run_attack,
)
from image_recognition_adversarial_example_attack_tpu.attacks.api import (
    cross_entropy_sum,
)

EPS_L1 = 4.0  # L1 radii are O(1..10), not O(8/255)


def _np_project_l1(v, eps):
    """Reference Duchi projection (numpy, per vector)."""
    if np.abs(v).sum() <= eps:
        return v
    u = np.sort(np.abs(v))[::-1]
    css = np.cumsum(u)
    rho = np.nonzero(u * np.arange(1, len(u) + 1) > (css - eps))[0][-1]
    theta = (css[rho] - eps) / (rho + 1.0)
    return np.sign(v) * np.maximum(np.abs(v) - theta, 0)


class TestProjection:
    def test_matches_reference_implementation(self):
        rng = np.random.RandomState(0)
        v = rng.randn(5, 4, 4, 3).astype(np.float32) * 3
        got = np.asarray(project_l1_ball(jnp.asarray(v), 2.5))
        for i in range(5):
            want = _np_project_l1(v[i].ravel(), 2.5)
            np.testing.assert_allclose(got[i].ravel(), want, atol=1e-5)
        # projected points live on (or inside) the ball
        assert (np.abs(got).reshape(5, -1).sum(-1) <= 2.5 + 1e-4).all()

    def test_inside_ball_unchanged(self):
        rng = np.random.RandomState(1)
        v = (rng.rand(3, 2, 2, 3).astype(np.float32) - 0.5) * 0.01
        got = np.asarray(project_l1_ball(jnp.asarray(v), 1.0))
        np.testing.assert_array_equal(got, v)

    def test_idempotent(self):
        rng = np.random.RandomState(2)
        v = jnp.asarray(rng.randn(4, 3, 3, 3).astype(np.float32))
        once = project_l1_ball(v, 1.5)
        twice = project_l1_ball(once, 1.5)
        np.testing.assert_allclose(np.asarray(once), np.asarray(twice),
                                   atol=1e-6)


class TestPGDL1:
    def test_ball_and_range_invariants(self, tiny_logits_fn, image_batch,
                                       rng_key):
        x = jnp.asarray(image_batch)
        y = jnp.argmax(tiny_logits_fn(x), -1)
        x_adv = pgd_l1_attack(tiny_logits_fn, x, y, eps=EPS_L1, alpha=0.5,
                              steps=10, key=rng_key)
        l1 = np.abs(np.asarray(x_adv - x)).reshape(x.shape[0], -1).sum(-1)
        assert (l1 <= EPS_L1 + 1e-4).all()
        assert float(x_adv.min()) >= 0.0 and float(x_adv.max()) <= 1.0

    def test_loss_increases(self, tiny_logits_fn, image_batch, rng_key):
        x = jnp.asarray(image_batch)
        y = jnp.argmax(tiny_logits_fn(x), -1)
        x_adv = pgd_l1_attack(tiny_logits_fn, x, y, eps=EPS_L1, alpha=0.5,
                              steps=10, key=rng_key)
        l0 = float(cross_entropy_sum(tiny_logits_fn(x), y))
        l1 = float(cross_entropy_sum(tiny_logits_fn(x_adv), y))
        assert l1 > l0

    def test_sparse_steps(self, tiny_logits_fn, image_batch, rng_key):
        """One step from a clean start touches ~sparsity*N features."""
        x = jnp.asarray(image_batch)
        y = jnp.argmax(tiny_logits_fn(x), -1)
        n = x[0].size
        x_adv = pgd_l1_attack(tiny_logits_fn, x, y, eps=EPS_L1, alpha=0.1,
                              steps=1, key=rng_key, sparsity=0.02,
                              random_start=False)
        changed = (np.abs(np.asarray(x_adv - x)).reshape(x.shape[0], -1)
                   > 1e-9).sum(-1)
        k = int(round(0.02 * n))
        # ties can add a few; clipping at the box can remove some
        assert (changed <= 3 * k).all() and (changed >= 1).all()

    def test_deterministic_given_key(self, tiny_logits_fn, image_batch,
                                     rng_key):
        x = jnp.asarray(image_batch)
        y = jnp.argmax(tiny_logits_fn(x), -1)
        kw = dict(eps=EPS_L1, alpha=0.5, steps=5, key=rng_key)
        a = pgd_l1_attack(tiny_logits_fn, x, y, **kw)
        b = pgd_l1_attack(tiny_logits_fn, x, y, **kw)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_dispatch_and_targeted(self, tiny_logits_fn, image_batch, rng_key):
        x = jnp.asarray(image_batch)
        y = jnp.argmax(tiny_logits_fn(x), -1)
        params = AttackParams(eps=EPS_L1, alpha=0.5, steps=5,
                              l1_sparsity=0.02)
        x_adv = run_attack("pgd_l1", tiny_logits_fn, x, y, params, rng_key)
        l1 = np.abs(np.asarray(x_adv - x)).reshape(x.shape[0], -1).sum(-1)
        assert (l1 <= EPS_L1 + 1e-4).all()
        # targeted mode DESCENDS the target's CE
        y_t = (y + 1) % tiny_logits_fn(x).shape[-1]
        x_t = run_attack("pgd_l1", tiny_logits_fn, x, y, params, rng_key,
                         y_target=y_t)
        before = float(cross_entropy_sum(tiny_logits_fn(x), y_t))
        after = float(cross_entropy_sum(tiny_logits_fn(x_t), y_t))
        assert after < before
