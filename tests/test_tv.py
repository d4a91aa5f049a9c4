"""TV-minimization defense (defenses/tv.py): operator adjointness, solver
convergence/optimality, denoising + inpainting behavior, differentiability,
EOT composition, and the defend_input chain hook."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_recognition_adversarial_example_attack_tpu.defenses import (
    total_variation,
    tv_minimize,
    tv_transform,
)
from image_recognition_adversarial_example_attack_tpu.defenses.preprocess import (
    DefenseConfig,
    defend_input,
)
from image_recognition_adversarial_example_attack_tpu.defenses.tv import (
    _divergence,
    _forward_diff,
    rof_energy,
)


@pytest.fixture(scope="module")
def piecewise():
    """Piecewise-constant [2,16,16,3] image (the signal TV preserves)."""
    x = np.full((2, 16, 16, 3), 0.3, np.float32)
    x[:, 4:12, 4:12, :] = 0.8
    return jnp.asarray(x)


@pytest.fixture(scope="module")
def noisy(piecewise):
    rng = np.random.RandomState(7)
    noise = rng.normal(0.0, 0.08, piecewise.shape).astype(np.float32)
    return jnp.clip(piecewise + noise, 0.0, 1.0)


class TestOperators:
    def test_divergence_is_negative_adjoint(self):
        """<D z, p> == -<z, div p> — the identity the primal-dual updates
        rely on (any mismatch silently breaks convergence, not shapes)."""
        rng = np.random.RandomState(0)
        z = jnp.asarray(rng.randn(2, 7, 9, 3).astype(np.float32))
        py = jnp.asarray(rng.randn(2, 7, 9, 3).astype(np.float32))
        px = jnp.asarray(rng.randn(2, 7, 9, 3).astype(np.float32))
        dy, dx = _forward_diff(z)
        lhs = float(jnp.sum(dy * py) + jnp.sum(dx * px))
        rhs = -float(jnp.sum(z * _divergence(py, px)))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-5)

    def test_tv_of_constant_is_zero(self):
        x = jnp.full((3, 8, 8, 3), 0.5)
        np.testing.assert_allclose(np.asarray(total_variation(x)), 0.0,
                                   atol=1e-3)

    def test_tv_scales_with_edge_height(self, piecewise):
        tv1 = float(total_variation(piecewise)[0])
        taller = jnp.where(piecewise > 0.5, 1.0, 0.0)
        tv2 = float(total_variation(taller)[0])
        assert tv2 > tv1 * 1.2


class TestSolver:
    def test_energy_decreases(self, noisy):
        z = tv_minimize(noisy, weight=0.05, steps=30)
        e_in = np.asarray(rof_energy(noisy, noisy, weight=0.05))
        e_out = np.asarray(rof_energy(z, noisy, weight=0.05))
        assert (e_out < e_in).all()

    def test_30_steps_near_converged(self, noisy):
        """The default budget sits close to the 300-step solution — the
        static step count is a converged solve, not an early stop."""
        e_30 = np.asarray(rof_energy(
            tv_minimize(noisy, weight=0.05, steps=30), noisy, weight=0.05))
        e_300 = np.asarray(rof_energy(
            tv_minimize(noisy, weight=0.05, steps=300), noisy, weight=0.05))
        assert (e_30 <= e_300 * 1.01 + 1e-4).all()

    def test_beats_projected_gradient_descent(self, noisy):
        """Primal-dual lands at-or-below a long smoothed-TV gradient
        descent from the same start — an independent optimality check."""
        w = 0.05

        def energy_smooth(z):
            dy, dx = _forward_diff(z)
            tv = jnp.sum(jnp.sqrt(dy * dy + dx * dx + 1e-12))
            return 0.5 * jnp.sum((z - noisy) ** 2) + w * tv

        g = jax.jit(jax.grad(energy_smooth))
        z = noisy
        for _ in range(400):
            z = jnp.clip(z - 0.2 * g(z), 0.0, 1.0)
        e_gd = float(jnp.sum(rof_energy(z, noisy, weight=w)))
        e_cp = float(jnp.sum(rof_energy(
            tv_minimize(noisy, weight=w, steps=60), noisy, weight=w)))
        assert e_cp <= e_gd * 1.005

    def test_denoises_toward_clean(self, piecewise, noisy):
        z = tv_minimize(noisy, weight=0.05, steps=30)
        err_before = float(jnp.mean((noisy - piecewise) ** 2))
        err_after = float(jnp.mean((z - piecewise) ** 2))
        assert err_after < err_before * 0.6

    def test_zero_weight_is_clipped_identity(self, noisy):
        z = tv_minimize(noisy, weight=0.0, steps=30)
        np.testing.assert_allclose(np.asarray(z), np.asarray(noisy),
                                   atol=1e-6)

    def test_mask_inpaints_dropped_block(self):
        x = jnp.full((1, 16, 16, 3), 0.6)
        mask = np.ones((1, 16, 16, 1), np.float32)
        mask[:, 6:10, 6:10, :] = 0.0
        # corrupt the dropped block: the data term never sees it, so the
        # TV prior must fill it from the surround
        x_corrupt = x.at[:, 6:10, 6:10, :].set(0.0)
        z = tv_minimize(x_corrupt, weight=0.05, steps=120,
                        mask=jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(z[:, 6:10, 6:10, :]), 0.6,
                                   atol=0.05)

    def test_range_shape_dtype(self, noisy):
        z = tv_minimize(noisy, steps=10)
        assert z.shape == noisy.shape and z.dtype == noisy.dtype
        assert float(jnp.min(z)) >= -1e-6 and float(jnp.max(z)) <= 1 + 1e-6
        zb = tv_minimize(noisy.astype(jnp.bfloat16), steps=10)
        assert zb.dtype == jnp.bfloat16
        assert bool(jnp.isfinite(zb.astype(jnp.float32)).all())

    def test_batch_entries_independent(self, noisy):
        both = tv_minimize(noisy, steps=20)
        solo = tv_minimize(noisy[:1], steps=20)
        np.testing.assert_allclose(np.asarray(both[:1]), np.asarray(solo),
                                   atol=1e-6)


class TestDifferentiability:
    def test_grad_flows_and_is_finite(self, noisy):
        def loss(x):
            return jnp.sum(tv_minimize(x, steps=15) ** 2)

        g = jax.grad(loss)(noisy)
        assert bool(jnp.isfinite(g).all())
        assert float(jnp.abs(g).max()) > 0.0

    def test_grad_finite_on_flat_regions(self):
        """TPU-caught regression: exactly-flat pixels make the dual norm
        sqrt(0), whose raw VJP is NaN — an adaptive PGD on a real image
        (saturated sky) returned all-NaN x_adv until the safe sqrt."""
        flat = jnp.full((2, 16, 16, 3), 0.5)

        def loss(x):
            return jnp.sum(tv_minimize(x, steps=10) ** 2)

        g = jax.grad(loss)(flat)
        assert bool(jnp.isfinite(g).all())

    def test_grad_inside_attack_scan(self, noisy):
        """The adaptive-attack shape: grad THROUGH the solver inside an
        outer lax.scan (the pattern that broke reduce_window's grad)."""

        def body(x, _):
            g = jax.grad(lambda xx: jnp.sum(tv_minimize(xx, steps=5)))(x)
            return jnp.clip(x + 0.01 * jnp.sign(g), 0.0, 1.0), None

        out, _ = jax.lax.scan(body, noisy, None, length=3)
        assert bool(jnp.isfinite(out).all())


class TestTransformAndChain:
    def test_transform_deterministic_per_key(self, noisy, rng_key):
        t = tv_transform(steps=10)
        a = t(rng_key, noisy)
        b = t(rng_key, noisy)
        c = t(jax.random.PRNGKey(1), noisy)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert float(jnp.abs(a - c).max()) > 1e-5

    def test_transform_composes_with_eot(self, tiny_logits_fn, rng_key):
        from image_recognition_adversarial_example_attack_tpu.attacks.eot import (
            make_eot_logits_fn,
        )

        x = jnp.asarray(np.random.RandomState(3).uniform(
            0.2, 0.8, (2, 16, 16, 3)).astype(np.float32))
        fn = make_eot_logits_fn(tiny_logits_fn, rng_key, n_samples=2,
                                transform=tv_transform(steps=5))
        logits = fn(x)
        assert logits.shape == (2, 8)
        assert bool(jnp.isfinite(logits).all())

    def test_defend_input_tv_arm(self, noisy):
        cfg_on = DefenseConfig(use_tv=True, tv_weight=0.05, tv_steps=15)
        cfg_off = DefenseConfig()
        d_on = jax.jit(defend_input, static_argnums=1)(noisy, cfg_on)
        d_off = jax.jit(defend_input, static_argnums=1)(noisy, cfg_off)
        assert float(jnp.abs(d_on - d_off).max()) > 1e-4
        # TV runs FIRST: the chain output equals smooth+quant of the recon
        manual = defend_input(tv_minimize(noisy, weight=0.05, steps=15),
                              DefenseConfig())
        np.testing.assert_allclose(np.asarray(d_on), np.asarray(manual),
                                   atol=1e-6)
