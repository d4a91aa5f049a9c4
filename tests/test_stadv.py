"""stAdv spatial attack (attacks/stadv.py): warp operator correctness,
flow-smoothness loss, attack success + geometric (non-Lp) character,
targeted mode, and dispatcher integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_recognition_adversarial_example_attack_tpu.attacks import (
    AttackParams,
    flow_smoothness,
    flow_warp,
    run_attack,
    stadv_attack,
)


@pytest.fixture(scope="module")
def image():
    rng = np.random.RandomState(11)
    return jnp.asarray(rng.uniform(0.1, 0.9, (2, 16, 16, 3)).astype(np.float32))


class TestFlowWarp:
    def test_zero_flow_is_identity(self, image):
        out = flow_warp(image, jnp.zeros(image.shape[:3] + (2,)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(image),
                                   atol=1e-6)

    def test_integer_flow_shifts(self, image):
        """flow = (+1, 0) everywhere samples the next row: out[i] = x[i+1]
        in the interior (border rows clamp)."""
        flow = jnp.zeros(image.shape[:3] + (2,)).at[..., 0].set(1.0)
        out = flow_warp(image, flow)
        np.testing.assert_allclose(np.asarray(out[:, :-1]),
                                   np.asarray(image[:, 1:]), atol=1e-6)

    def test_half_pixel_flow_averages(self, image):
        flow = jnp.zeros(image.shape[:3] + (2,)).at[..., 1].set(0.5)
        out = flow_warp(image, flow)
        expect = 0.5 * (image[:, :, :-1] + image[:, :, 1:])
        np.testing.assert_allclose(np.asarray(out[:, :, :-1]),
                                   np.asarray(expect), atol=1e-6)

    def test_border_clamps(self, image):
        """Huge flow saturates at the border instead of wrapping/NaN."""
        flow = jnp.full(image.shape[:3] + (2,), 100.0)
        out = flow_warp(image, flow)
        assert bool(jnp.isfinite(out).all())
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(jnp.broadcast_to(
                                       image[:, -1:, -1:, :], image.shape)),
                                   atol=1e-6)

    def test_grad_wrt_flow_and_image(self, image):
        flow = jnp.full(image.shape[:3] + (2,), 0.3)
        gf = jax.grad(lambda f: jnp.sum(flow_warp(image, f) ** 2))(flow)
        gx = jax.grad(lambda x: jnp.sum(flow_warp(x, flow) ** 2))(image)
        for g in (gf, gx):
            assert bool(jnp.isfinite(g).all())
            assert float(jnp.abs(g).max()) > 0.0


class TestSmoothness:
    def test_constant_flow_is_smooth(self):
        f = jnp.full((2, 8, 8, 2), 3.7)
        s = flow_smoothness(f)
        assert s.shape == (2,)
        np.testing.assert_allclose(np.asarray(s), 0.0, atol=1e-2)

    def test_discontinuity_costs(self):
        f = jnp.zeros((1, 8, 8, 2)).at[:, :4].set(2.0)
        smooth = float(flow_smoothness(jnp.zeros((1, 8, 8, 2)))[0])
        rough = float(flow_smoothness(f)[0])
        assert rough > smooth + 1.0


class TestAttack:
    def test_fools_tiny_model(self, tiny_logits_fn, rng_key):
        x = jnp.asarray(np.random.RandomState(5).uniform(
            0.2, 0.8, (4, 16, 16, 3)).astype(np.float32))
        y = jnp.argmax(tiny_logits_fn(x), -1)
        res = stadv_attack(tiny_logits_fn, x, y, steps=100, lr=0.05, tau=0.01)
        assert res.x_adv.shape == x.shape
        assert float(jnp.min(res.x_adv)) >= 0.0
        assert float(jnp.max(res.x_adv)) <= 1.0
        pred = jnp.argmax(tiny_logits_fn(res.x_adv), -1)
        fooled = pred != y
        # success flags must be consistent with the returned iterate
        assert bool(jnp.all(~res.success | fooled))
        assert int(jnp.sum(res.success)) >= 2  # random-init net: easy marks

    def test_perturbation_is_geometric(self, tiny_logits_fn):
        """Unfooled samples return a near-zero flow (best tracking keeps
        the clean image), and successful warps stay visually close: the
        mean absolute pixel change is small even where Linf is large."""
        x = jnp.asarray(np.random.RandomState(6).uniform(
            0.2, 0.8, (4, 16, 16, 3)).astype(np.float32))
        y = jnp.argmax(tiny_logits_fn(x), -1)
        res = stadv_attack(tiny_logits_fn, x, y, steps=60, lr=0.03, tau=0.05)
        l1 = jnp.mean(jnp.abs(res.x_adv - x), axis=(1, 2, 3))
        assert float(jnp.max(l1)) < 0.2

    def test_targeted_mode(self, tiny_logits_fn):
        x = jnp.asarray(np.random.RandomState(7).uniform(
            0.2, 0.8, (4, 16, 16, 3)).astype(np.float32))
        y = jnp.argmax(tiny_logits_fn(x), -1)
        y_t = (y + 3) % 8
        res = stadv_attack(tiny_logits_fn, x, y, steps=150, lr=0.05,
                           tau=0.005, y_target=y_t)
        pred = jnp.argmax(tiny_logits_fn(res.x_adv), -1)
        hit = pred == y_t
        assert bool(jnp.all(~res.success | hit))

    def test_jits_as_one_program(self, tiny_logits_fn):
        x = jnp.asarray(np.random.RandomState(8).uniform(
            0.2, 0.8, (2, 16, 16, 3)).astype(np.float32))
        y = jnp.argmax(tiny_logits_fn(x), -1)
        fn = jax.jit(lambda a, b: stadv_attack(
            tiny_logits_fn, a, b, steps=10).x_adv)
        out = fn(x, y)
        assert bool(jnp.isfinite(out).all())

    def test_dispatcher(self, tiny_logits_fn):
        x = jnp.asarray(np.random.RandomState(9).uniform(
            0.2, 0.8, (2, 16, 16, 3)).astype(np.float32))
        y = jnp.argmax(tiny_logits_fn(x), -1)
        params = AttackParams(stadv_steps=8, stadv_lr=0.03, stadv_tau=0.01)
        out = run_attack("stadv", tiny_logits_fn, x, y, params)
        assert out.shape == x.shape
        assert bool(jnp.isfinite(out).all())

    def test_batch_entries_independent(self, tiny_logits_fn):
        x = jnp.asarray(np.random.RandomState(10).uniform(
            0.2, 0.8, (4, 16, 16, 3)).astype(np.float32))
        y = jnp.argmax(tiny_logits_fn(x), -1)
        full = stadv_attack(tiny_logits_fn, x, y, steps=12).x_adv
        # tiny_logits_fn contains per-example ops only (conv/dense), so a
        # sub-batch run must reproduce the same leading rows
        half = stadv_attack(tiny_logits_fn, x[:2], y[:2], steps=12).x_adv
        np.testing.assert_allclose(np.asarray(full[:2]), np.asarray(half),
                                   atol=1e-5)
