"""Boundary (attacks/boundary.py) and SimBA (attacks/simba.py): hard-label
walk invariants, probability-descent invariants, DCT basis orthonormality,
masking/freezing semantics, and dispatcher integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_recognition_adversarial_example_attack_tpu.attacks import (
    AttackParams,
    boundary_attack,
    run_attack,
    simba_attack,
)
from image_recognition_adversarial_example_attack_tpu.attacks.simba import (
    dct_basis_image,
)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(21)
    return jnp.asarray(rng.uniform(0.2, 0.8, (4, 16, 16, 3)).astype(np.float32))


def _adv_init(logits_fn, x, y):
    """Known-misclassified warm start (the tiny model's decision region
    swallows the pure-noise init distribution — same workaround as
    test_attacks.py::TestHSJA)."""
    from image_recognition_adversarial_example_attack_tpu.attacks import (
        pgd_linf_attack,
    )

    x_init = pgd_linf_attack(logits_fn, x, y, eps=0.15, alpha=0.03,
                             steps=20, key=jax.random.PRNGKey(1))
    assert bool(jnp.all(jnp.argmax(logits_fn(x_init), -1) != y))
    return x_init


class TestBoundary:
    def test_walk_converges_toward_x(self, tiny_logits_fn, batch, rng_key):
        """From a far misclassified init the walk must return a CLOSER
        adversarial point — that is the attack's entire job."""
        y = jnp.argmax(tiny_logits_fn(batch), -1)
        x_init = _adv_init(tiny_logits_fn, batch, y)
        d_init = jnp.sqrt(jnp.sum((x_init - batch) ** 2, axis=(1, 2, 3)))
        out = boundary_attack(tiny_logits_fn, batch, y, steps=200,
                              key=rng_key, x_init=x_init)
        d_out = jnp.sqrt(jnp.sum((out - batch) ** 2, axis=(1, 2, 3)))
        pred = jnp.argmax(tiny_logits_fn(out), -1)
        assert bool(jnp.all(pred != y))  # stays adversarial throughout
        assert float(jnp.max(d_out / d_init)) < 0.9
        assert float(jnp.mean(d_out / d_init)) < 0.7
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_returned_iterate_is_adversarial(self, tiny_logits_fn, batch,
                                             rng_key):
        """Best tracking must never hand back a non-adversarial iterate
        for a sample that was initialized."""
        y = jnp.argmax(tiny_logits_fn(batch), -1)
        x_init = _adv_init(tiny_logits_fn, batch, y)
        out = boundary_attack(tiny_logits_fn, batch, y, steps=40,
                              key=rng_key, x_init=x_init)
        pred = jnp.argmax(tiny_logits_fn(out), -1)
        assert bool(jnp.all(pred != y))

    def test_uninitialized_returns_input(self, tiny_logits_fn, batch,
                                         rng_key):
        """x_init that is NOT adversarial (and no noise budget rescue):
        the walk cannot start, the input comes back unchanged."""
        y = jnp.argmax(tiny_logits_fn(batch), -1)
        out = boundary_attack(tiny_logits_fn, batch, y, steps=10,
                              key=rng_key, x_init=batch)
        np.testing.assert_allclose(np.asarray(out), np.asarray(batch),
                                   atol=1e-6)

    def test_jits(self, tiny_logits_fn, batch, rng_key):
        y = jnp.argmax(tiny_logits_fn(batch), -1)
        x_init = _adv_init(tiny_logits_fn, batch, y)
        fn = jax.jit(lambda a, b, k, xi: boundary_attack(
            tiny_logits_fn, a, b, steps=4, key=k, x_init=xi))
        assert bool(jnp.isfinite(fn(batch, y, rng_key, x_init)).all())

    def test_dispatcher(self, tiny_logits_fn, batch, rng_key):
        y = jnp.argmax(tiny_logits_fn(batch), -1)
        params = AttackParams(boundary_steps=6)
        out = run_attack("boundary", tiny_logits_fn, batch, y, params,
                         key=rng_key)
        assert out.shape == batch.shape


class TestDCTBasis:
    def test_orthonormal(self):
        h = w = 8
        vecs = []
        for (u, v) in [(0, 0), (0, 1), (1, 0), (2, 3), (7, 7)]:
            q = dct_basis_image(jnp.int32(u), jnp.int32(v), h, w)
            vecs.append(np.asarray(q).ravel())
        for i, a in enumerate(vecs):
            np.testing.assert_allclose(a @ a, 1.0, rtol=1e-5)
            for b_ in vecs[i + 1:]:
                np.testing.assert_allclose(a @ b_, 0.0, atol=1e-5)

    def test_dc_is_constant(self):
        q = dct_basis_image(jnp.int32(0), jnp.int32(0), 4, 4)
        np.testing.assert_allclose(np.asarray(q), 0.25, atol=1e-6)


class TestSimBA:
    def test_probability_descends(self, tiny_logits_fn, batch, rng_key):
        """p_y(x_adv) <= p_y(x) per sample — every accepted step strictly
        lowers it and rejected steps change nothing."""
        y = jnp.argmax(tiny_logits_fn(batch), -1)
        out = simba_attack(tiny_logits_fn, batch, y, steps=100, eps=0.2,
                           key=rng_key)

        def py(a):
            p = jax.nn.softmax(tiny_logits_fn(a), -1)
            return jnp.take_along_axis(p, y[:, None], -1)[:, 0]

        assert bool(jnp.all(py(out) <= py(batch) + 1e-6))
        assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0

    def test_fools_some(self, tiny_logits_fn, batch, rng_key):
        y = jnp.argmax(tiny_logits_fn(batch), -1)
        out = simba_attack(tiny_logits_fn, batch, y, steps=400, eps=0.3,
                           key=rng_key)
        pred = jnp.argmax(tiny_logits_fn(out), -1)
        assert int(jnp.sum(pred != y)) >= 2

    def test_pixel_mode(self, tiny_logits_fn, batch, rng_key):
        y = jnp.argmax(tiny_logits_fn(batch), -1)
        out = simba_attack(tiny_logits_fn, batch, y, steps=50, eps=0.3,
                           mode="pixel", key=rng_key)
        # pixel mode touches isolated coordinates: the changed-pixel count
        # is bounded by the step count
        changed = jnp.sum(jnp.abs(out - batch) > 1e-6, axis=(1, 2, 3))
        assert int(jnp.max(changed)) <= 50

    def test_already_fooled_frozen(self, tiny_logits_fn, batch, rng_key):
        """Samples misclassified at entry spend no queries: returned as-is."""
        y_pred = jnp.argmax(tiny_logits_fn(batch), -1)
        y_wrong = (y_pred + 1) % 8  # every sample "already misclassified"
        out = simba_attack(tiny_logits_fn, batch, y_wrong, steps=40, eps=0.3,
                           key=rng_key)
        np.testing.assert_allclose(np.asarray(out), np.asarray(batch),
                                   atol=1e-6)

    def test_unknown_mode_rejected(self, tiny_logits_fn, batch, rng_key):
        y = jnp.argmax(tiny_logits_fn(batch), -1)
        with pytest.raises(ValueError):
            simba_attack(tiny_logits_fn, batch, y, steps=2, mode="wavelet",
                         key=rng_key)

    def test_dispatcher(self, tiny_logits_fn, batch, rng_key):
        y = jnp.argmax(tiny_logits_fn(batch), -1)
        params = AttackParams(simba_steps=10)
        out = run_attack("simba", tiny_logits_fn, batch, y, params,
                         key=rng_key)
        assert out.shape == batch.shape
