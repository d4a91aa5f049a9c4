"""AutoAttack completion (VERDICT r2 next #3): DLR losses (torch parity),
APGD-DLR / APGD-T, FAB-T with its bisection projection, and the standard
ensemble composition in eval/robust_eval.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_recognition_adversarial_example_attack_tpu.attacks import (
    AttackParams,
    apgd_dlr_attack,
    apgd_targeted_attack,
    dlr_loss,
    dlr_loss_targeted,
    fab_targeted_attack,
    project_box_hyperplane,
    run_attack,
)


def _labels(lf, x):
    return jnp.argmax(lf(x), -1)


class TestDLRTorchParity:
    """The DLR formulas transcribed independently into torch (Croce & Hein
    2020, eqs. 6-7) must match our jnp implementation bitwise-ish."""

    def test_untargeted(self):
        import torch

        rng = np.random.RandomState(0)
        logits_np = rng.randn(16, 10).astype(np.float32)
        y_np = rng.randint(0, 10, size=16)

        t = torch.from_numpy(logits_np)
        y_t = torch.from_numpy(y_np)
        z_sorted, _ = t.sort(dim=1)
        z_y = t[torch.arange(16), y_t]
        ind = (z_sorted[:, -1] == z_y).float()
        want = -(z_y - z_sorted[:, -2] * ind - z_sorted[:, -1] * (1.0 - ind)) \
            / (z_sorted[:, -1] - z_sorted[:, -3] + 1e-12)

        got = dlr_loss(jnp.asarray(logits_np), jnp.asarray(y_np))
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-6)

    def test_targeted(self):
        import torch

        rng = np.random.RandomState(1)
        logits_np = rng.randn(16, 10).astype(np.float32)
        y_np = rng.randint(0, 10, size=16)
        t_np = (y_np + 3) % 10

        t = torch.from_numpy(logits_np)
        z_sorted, _ = t.sort(dim=1)
        z_y = t[torch.arange(16), torch.from_numpy(y_np)]
        z_t = t[torch.arange(16), torch.from_numpy(t_np)]
        want = -(z_y - z_t) / (z_sorted[:, -1]
                               - 0.5 * (z_sorted[:, -3] + z_sorted[:, -4])
                               + 1e-12)

        got = dlr_loss_targeted(jnp.asarray(logits_np), jnp.asarray(y_np),
                                jnp.asarray(t_np))
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-6)


class TestAPGDVariants:
    def test_apgd_dlr_ball_and_effectiveness(self, tiny_logits_fn,
                                             image_batch, rng_key):
        x = jnp.asarray(image_batch)
        y = _labels(tiny_logits_fn, x)
        eps = 8 / 255
        x_adv = apgd_dlr_attack(tiny_logits_fn, x, y, eps=eps, steps=10,
                                key=rng_key)
        assert float(jnp.max(jnp.abs(x_adv - x))) <= eps + 1e-6
        assert float(jnp.min(x_adv)) >= 0.0 and float(jnp.max(x_adv)) <= 1.0
        fooled = float(jnp.mean((_labels(tiny_logits_fn, x_adv) != y)))
        assert fooled >= 0.5  # easy model, 8/255

    def test_apgd_targeted_ball_success_consistency(self, tiny_logits_fn,
                                                    image_batch, rng_key):
        x = jnp.asarray(image_batch)
        y = _labels(tiny_logits_fn, x)
        eps = 8 / 255
        x_adv, success = apgd_targeted_attack(
            tiny_logits_fn, x, y, eps=eps, steps=5, n_targets=3, key=rng_key)
        assert float(jnp.max(jnp.abs(x_adv - x))) <= eps + 1e-6
        # success implies the RETURNED iterate misclassifies
        mis = np.asarray(_labels(tiny_logits_fn, x_adv) != y)
        succ = np.asarray(success)
        assert np.all(mis[succ]), "success flag without a fooling iterate"
        assert succ.mean() >= 0.5  # easy model

    def test_apgd_targeted_caps_targets_to_classes(self, tiny_logits_fn,
                                                   image_batch, rng_key):
        x = jnp.asarray(image_batch)
        y = _labels(tiny_logits_fn, x)
        # 8-class model: n_targets=50 must clamp to 7, not crash
        x_adv, success = apgd_targeted_attack(
            tiny_logits_fn, x, y, eps=8 / 255, steps=2, n_targets=50,
            key=rng_key)
        assert x_adv.shape == x.shape and success.shape == y.shape

    def test_dispatch(self, tiny_logits_fn, image_batch, rng_key):
        x = jnp.asarray(image_batch)
        y = _labels(tiny_logits_fn, x)
        p = AttackParams(steps=3, n_target_classes=2)
        for name in ("apgd_dlr", "apgd_t", "fab"):
            x_adv = run_attack(name, tiny_logits_fn, x, y, p, rng_key)
            assert x_adv.shape == x.shape
            with pytest.raises(ValueError):
                run_attack(name, tiny_logits_fn, x, y, p, rng_key,
                           y_target=(y + 1) % 8)


class TestFABProjection:
    def test_unclipped_case_matches_analytic_linf_projection(self):
        """Interior point, constraint reachable without touching the box:
        the minimal L-inf move onto {w.u + b = 0} is |w.z + b| / ||w||_1,
        achieved by moving every coordinate by that amount against
        sign(w).  The bisection must reproduce it."""
        rng = np.random.RandomState(0)
        z = jnp.full((4, 6), 0.5, jnp.float32)
        w = jnp.asarray(rng.randn(4, 6), jnp.float32)
        g_target = jnp.asarray([0.3, -0.2, 0.15, 0.05], jnp.float32)
        b = g_target - jnp.sum(w * z, axis=1)

        u = project_box_hyperplane(z, w, b)
        resid = np.asarray(jnp.sum(w * u, axis=1) + b)
        np.testing.assert_allclose(resid, 0.0, atol=1e-5)
        dist = np.asarray(jnp.max(jnp.abs(u - z), axis=1))
        want = np.abs(np.asarray(g_target)) / np.abs(np.asarray(w)).sum(1)
        np.testing.assert_allclose(dist, want, rtol=1e-4, atol=1e-6)

    def test_box_clipping_and_infeasible(self):
        # one coordinate, boundary far outside the box: the projection
        # saturates at the box face (closest attainable point)
        z = jnp.asarray([[0.9]], jnp.float32)
        w = jnp.asarray([[1.0]], jnp.float32)
        b = jnp.asarray([-5.0], jnp.float32)  # u = 5 unreachable in [0,1]
        u = np.asarray(project_box_hyperplane(z, w, b))
        np.testing.assert_allclose(u, [[1.0]], atol=1e-6)
        # feasible at the boundary of the box
        b2 = jnp.asarray([-1.0], jnp.float32)  # u = 1.0 exactly
        u2 = np.asarray(project_box_hyperplane(z, w, b2))
        np.testing.assert_allclose(u2, [[1.0]], atol=1e-6)

    def test_already_feasible_returns_z(self):
        z = jnp.asarray([[0.2, 0.8]], jnp.float32)
        w = jnp.asarray([[1.0, -1.0]], jnp.float32)
        b = jnp.asarray([0.6], jnp.float32)  # w.z + b = 0 already
        u = np.asarray(project_box_hyperplane(z, w, b))
        np.testing.assert_allclose(u, np.asarray(z), atol=1e-6)

    def test_image_shaped_batch(self):
        rng = np.random.RandomState(2)
        z = jnp.asarray(rng.uniform(0.3, 0.7, (3, 4, 4, 3)), jnp.float32)
        w = jnp.asarray(rng.randn(3, 4, 4, 3), jnp.float32)
        b = jnp.asarray([0.5, -0.5, 0.1], jnp.float32) - jnp.sum(
            w * z, axis=(1, 2, 3))
        u = project_box_hyperplane(z, w, b)
        assert u.shape == z.shape
        resid = np.asarray(jnp.sum(w * u, axis=(1, 2, 3)) + b)
        np.testing.assert_allclose(resid, 0.0, atol=1e-4)


class TestFABAttack:
    def test_finds_small_perturbations(self, tiny_logits_fn, image_batch,
                                       rng_key):
        x = jnp.asarray(image_batch)
        y = _labels(tiny_logits_fn, x)
        x_adv = fab_targeted_attack(tiny_logits_fn, x, y, eps=8 / 255,
                                    steps=10, n_targets=3, key=rng_key)
        assert float(jnp.min(x_adv)) >= 0.0 and float(jnp.max(x_adv)) <= 1.0
        mis = np.asarray(_labels(tiny_logits_fn, x_adv) != y)
        assert mis.mean() >= 0.5  # easy model: boundaries are close
        # minimal-norm character: the fooling iterates stay small
        dist = np.asarray(jnp.max(jnp.abs(x_adv - x), axis=(1, 2, 3)))
        assert np.all(dist[mis] < 0.25)

    def test_unfooled_samples_return_clean(self, image_batch, rng_key):
        """A constant model never misclassifies relative to itself — FAB
        must return the clean input, not garbage."""
        const = jnp.asarray(np.linspace(1.0, 0.1, 8), jnp.float32)

        def lf(x):
            return jnp.broadcast_to(const, (x.shape[0], 8))

        x = jnp.asarray(image_batch)
        y = _labels(lf, x)
        x_adv = fab_targeted_attack(lf, x, y, eps=8 / 255, steps=3,
                                    n_targets=2, key=rng_key)
        np.testing.assert_array_equal(np.asarray(x_adv), np.asarray(x))


class TestStandardEnsemble:
    @pytest.mark.slow
    def test_autoattack_composition(self, tiny_logits_fn, image_batch,
                                    rng_key):
        from image_recognition_adversarial_example_attack_tpu.eval.robust_eval import (
            autoattack,
        )

        x = jnp.asarray(image_batch)
        y = _labels(tiny_logits_fn, x)
        eps = 8 / 255
        res = jax.jit(lambda x, y, k: autoattack(
            tiny_logits_fn, x, y, eps=eps, key=k, apgd_steps=4,
            apgd_t_steps=3, apgd_t_targets=2, fab_steps=3, fab_targets=2,
            square_steps=5,
        ))(x, y, rng_key)

        succ = np.asarray(res.success)
        any_arm = np.asarray(res.success_apgd_ce | res.success_apgd_t
                             | res.success_fab | res.success_square)
        np.testing.assert_array_equal(succ, any_arm)
        # every successful sample's worst-case example actually fools
        mis = np.asarray(_labels(tiny_logits_fn, res.x_adv) != y)
        assert np.all(mis[succ])
        # FAB successes were counted in-ball only
        if np.asarray(res.success_fab).any():
            pass  # the in-ball mask is internal; composition-level check above

    @pytest.mark.slow
    def test_robust_cli_standard_protocol(self, tmp_path, capsys):
        import json

        from PIL import Image

        from image_recognition_adversarial_example_attack_tpu.cli.robust_eval import (
            main,
        )

        rng = np.random.RandomState(0)
        d = tmp_path / "imgs"
        d.mkdir()
        for i in range(3):
            Image.fromarray((rng.rand(48, 48, 3) * 255).astype(np.uint8)).save(
                d / f"i{i}.jpg")
        out = tmp_path / "aa.json"
        rc = main(["--image_dir", str(d), "--model", "resnet_tiny",
                   "--protocol", "standard", "--eps_list", "0.03137",
                   "--apgd_steps", "3", "--square_steps", "4",
                   "--fab_steps", "3", "--n_target_classes", "2",
                   "--output", str(out)])
        assert rc == 0
        text = capsys.readouterr().out
        assert "protocol=standard" in text and "robust_acc=" in text
        data = json.loads(out.read_text())
        assert data["protocol"] == "standard"
        row = data["results"][0]
        for arm in ("apgd_ce", "apgd_t", "fab", "square"):
            assert f"success_{arm}" in row
        assert 0.0 <= row["robust_accuracy"] <= 1.0


class TestReviewRegressions:
    """Round-3 code-review findings (fixed): FAB in-ball gating in grids,
    DLR class-count guards."""

    def test_run_attack_fab_respects_eps_ball(self, tiny_logits_fn,
                                              image_batch, rng_key):
        """Grid harnesses count plain misclassification per eps cell, so
        run_attack('fab') must never return an out-of-ball iterate — an
        out-of-ball FAB success does not count (AutoAttack convention)
        and the sample comes back clean."""
        x = jnp.asarray(image_batch)
        y = _labels(tiny_logits_fn, x)
        eps = 1e-4  # tiny budget: minimal-norm iterates will overshoot it
        p = AttackParams(eps=eps, steps=3, n_target_classes=2)
        x_adv = run_attack("fab", tiny_logits_fn, x, y, p, rng_key)
        assert float(jnp.max(jnp.abs(x_adv - x))) <= eps + 1e-6

    def test_dlr_class_count_guards(self):
        logits2 = jnp.zeros((4, 2))
        logits3 = jnp.zeros((4, 3))
        y = jnp.zeros((4,), jnp.int32)
        with pytest.raises(ValueError, match=">= 3 classes"):
            dlr_loss(logits2, y)
        with pytest.raises(ValueError, match=">= 4 classes"):
            dlr_loss_targeted(logits3, y, y + 1)
        # legal sizes still work
        assert dlr_loss(logits3, y).shape == (4,)
        assert dlr_loss_targeted(jnp.zeros((4, 4)), y, y + 1).shape == (4,)


class TestL2Protocol:
    """AutoAttack-L2 (beyond-reference round 3): APGD-L2 ball/step
    semantics, the L2 box-hyperplane projection, FAB-L2, and the
    ensemble/CLI norm plumbing."""

    def test_apgd_l2_ball_and_effectiveness(self, tiny_logits_fn,
                                            image_batch, rng_key):
        from image_recognition_adversarial_example_attack_tpu.attacks import (
            apgd_ce_attack,
        )

        x = jnp.asarray(image_batch)
        y = _labels(tiny_logits_fn, x)
        eps = 1.0  # L2 budget over 16x16x3
        x_adv = apgd_ce_attack(tiny_logits_fn, x, y, eps=eps, steps=10,
                               key=rng_key, norm="l2")
        d = jnp.sqrt(jnp.sum(jnp.square(x_adv - x), axis=(1, 2, 3)))
        assert float(jnp.max(d)) <= eps + 1e-4
        assert float(jnp.min(x_adv)) >= 0.0 and float(jnp.max(x_adv)) <= 1.0
        fooled = float(jnp.mean(_labels(tiny_logits_fn, x_adv) != y))
        assert fooled >= 0.5

    def test_l2_projection_unclipped_matches_analytic(self):
        """Interior case: min-L2 projection onto {w.u+b=0} is the
        orthogonal step z - g0*w/||w||^2, distance |g0|/||w||."""
        rng = np.random.RandomState(3)
        z = jnp.full((4, 6), 0.5, jnp.float32)
        w = jnp.asarray(rng.randn(4, 6) * 0.3, jnp.float32)
        g_target = jnp.asarray([0.2, -0.1, 0.05, 0.15], jnp.float32)
        b = g_target - jnp.sum(w * z, axis=1)
        u = project_box_hyperplane(z, w, b, norm="l2")
        resid = np.asarray(jnp.sum(w * u, axis=1) + b)
        np.testing.assert_allclose(resid, 0.0, atol=1e-5)
        want = np.asarray(z) - (np.asarray(g_target)[:, None]
                                * np.asarray(w)
                                / np.sum(np.asarray(w) ** 2, 1,
                                         keepdims=True))
        np.testing.assert_allclose(np.asarray(u), want, atol=1e-4)

    def test_fab_l2_finds_small_l2_perturbations(self, tiny_logits_fn,
                                                 image_batch, rng_key):
        x = jnp.asarray(image_batch)
        y = _labels(tiny_logits_fn, x)
        x_adv = fab_targeted_attack(tiny_logits_fn, x, y, eps=0.5, steps=10,
                                    n_targets=3, key=rng_key, norm="l2")
        assert float(jnp.min(x_adv)) >= 0.0 and float(jnp.max(x_adv)) <= 1.0
        mis = np.asarray(_labels(tiny_logits_fn, x_adv) != y)
        assert mis.mean() >= 0.5
        d = np.asarray(jnp.sqrt(jnp.sum(jnp.square(x_adv - x),
                                        axis=(1, 2, 3))))
        assert np.all(d[mis] < 3.0)  # small relative to the 27.7 diameter

    @pytest.mark.slow
    def test_autoattack_l2_composition(self, tiny_logits_fn, image_batch,
                                       rng_key):
        from image_recognition_adversarial_example_attack_tpu.eval.robust_eval import (
            autoattack,
        )

        x = jnp.asarray(image_batch)
        y = _labels(tiny_logits_fn, x)
        res = jax.jit(lambda x, y, k: autoattack(
            tiny_logits_fn, x, y, eps=1.0, key=k, apgd_steps=4,
            apgd_t_steps=3, apgd_t_targets=2, fab_steps=3, fab_targets=2,
            square_steps=5, norm="l2",
        ))(x, y, rng_key)
        succ = np.asarray(res.success)
        mis = np.asarray(_labels(tiny_logits_fn, res.x_adv) != y)
        assert np.all(mis[succ])
        # FAB successes counted in the L2 ball
        d = np.asarray(jnp.sqrt(jnp.sum(jnp.square(res.x_adv - x),
                                        axis=(1, 2, 3))))
        picked_fab = np.asarray(res.success_fab & ~res.success_apgd_ce
                                & ~res.success_apgd_t)
        assert np.all(d[picked_fab] <= 1.0 + 1e-4)

    @pytest.mark.slow
    def test_robust_cli_l2(self, tmp_path, capsys):
        import json

        from PIL import Image

        from image_recognition_adversarial_example_attack_tpu.cli.robust_eval import (
            main,
        )

        rng = np.random.RandomState(1)
        d = tmp_path / "imgs"
        d.mkdir()
        for i in range(3):
            Image.fromarray((rng.rand(48, 48, 3) * 255).astype(np.uint8)).save(
                d / f"i{i}.jpg")
        out = tmp_path / "aa_l2.json"
        rc = main(["--image_dir", str(d), "--model", "resnet_tiny",
                   "--protocol", "standard", "--norm", "l2",
                   "--eps_list", "2.0", "--apgd_steps", "3",
                   "--fab_steps", "3", "--n_target_classes", "2",
                   "--output", str(out)])
        assert rc == 0
        text = capsys.readouterr().out
        assert "norm=l2" in text
        data = json.loads(out.read_text())
        assert data["norm"] == "l2"
        assert 0 <= data["results"][0]["success_square"] <= 3


class TestSquareL2:
    def test_ball_range_and_never_worse(self, tiny_logits_fn, image_batch,
                                        rng_key):
        from image_recognition_adversarial_example_attack_tpu.attacks import (
            square_l2_attack,
        )
        from image_recognition_adversarial_example_attack_tpu.attacks.square import (
            _margin_loss,
        )

        x = jnp.asarray(image_batch)
        y = _labels(tiny_logits_fn, x)
        eps = 1.0
        x_adv = jax.jit(lambda x, y, k: square_l2_attack(
            tiny_logits_fn, x, y, eps=eps, steps=30, key=k))(x, y, rng_key)
        d = jnp.sqrt(jnp.sum(jnp.square(x_adv - x), axis=(1, 2, 3)))
        assert float(jnp.max(d)) <= eps + 1e-4
        assert float(jnp.min(x_adv)) >= 0.0 and float(jnp.max(x_adv)) <= 1.0
        # greedy accept: the returned iterate's margin never exceeds clean
        m_adv = np.asarray(_margin_loss(tiny_logits_fn(x_adv), y))
        m_clean = np.asarray(_margin_loss(tiny_logits_fn(x), y))
        assert np.all(m_adv <= m_clean + 1e-5)

    def test_deterministic_and_effective(self, tiny_logits_fn, image_batch,
                                         rng_key):
        from image_recognition_adversarial_example_attack_tpu.attacks import (
            square_l2_attack,
        )

        x = jnp.asarray(image_batch)
        y = _labels(tiny_logits_fn, x)
        from image_recognition_adversarial_example_attack_tpu.attacks.square import (
            _margin_loss,
        )

        f = jax.jit(lambda x, y, k: square_l2_attack(
            tiny_logits_fn, x, y, eps=2.0, steps=50, key=k))
        a = f(x, y, rng_key)
        b = f(x, y, rng_key)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # random search at a 50-query budget: assert strict PROGRESS on
        # every sample's margin (the same bar the L-inf Square tests set —
        # high fooling rates need orders more queries)
        m_adv = np.asarray(_margin_loss(tiny_logits_fn(a), y))
        m_clean = np.asarray(_margin_loss(tiny_logits_fn(x), y))
        assert np.all(m_adv < m_clean)

    def test_dispatch(self, tiny_logits_fn, image_batch, rng_key):
        x = jnp.asarray(image_batch)
        y = _labels(tiny_logits_fn, x)
        p = AttackParams(eps=1.0, square_steps=5)
        x_adv = run_attack("square_l2", tiny_logits_fn, x, y, p, rng_key)
        assert x_adv.shape == x.shape
        with pytest.raises(ValueError):
            run_attack("square_l2", tiny_logits_fn, x, y, p, rng_key,
                       y_target=(y + 1) % 8)


@pytest.mark.slow
def test_robust_cli_save_adv_dir(tmp_path, capsys):
    """--save_adv_dir exports per-sample worst-case examples, one subdir
    per eps; every saved PNG round-trips inside the L-inf ball."""
    import json as _json

    from PIL import Image

    from image_recognition_adversarial_example_attack_tpu.cli.robust_eval import (
        main,
    )

    rng = np.random.RandomState(2)
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(3):
        Image.fromarray((rng.rand(48, 48, 3) * 255).astype(np.uint8)).save(
            d / f"i{i}.jpg")
    adv_dir = tmp_path / "adv"
    rc = main(["--image_dir", str(d), "--model", "resnet_tiny",
               "--eps_list", "0.03137", "--apgd_steps", "2",
               "--square_steps", "2", "--deepfool_steps", "2",
               "--save_adv_dir", str(adv_dir),
               "--output", str(tmp_path / "r.json")])
    assert rc == 0
    capsys.readouterr()
    pngs = sorted((adv_dir / "eps_0.03137").glob("adv_*.png"))
    assert len(pngs) == 3
    # uint8 round-trip keeps the perturbation within eps + quantization
    from image_recognition_adversarial_example_attack_tpu.core.images import (
        load_image,
    )

    for p, src in zip(pngs, sorted(d.glob("*.jpg"))):
        # the PNG is already at pipeline size — read it raw (re-running
        # load_image would re-apply the 256->224 resize/crop)
        a = np.asarray(Image.open(p), np.float32) / 255.0
        c = np.asarray(load_image(src))[0]
        assert a.shape == c.shape
        assert np.abs(a - c).max() <= 0.03137 + 2 / 255


@pytest.mark.slow
class TestAutoAttackRand:
    """The randomized-defense protocol: EOT-APGD arms + Square on the
    expected classifier (Croce & Hein 2020, §5.3)."""

    def test_composition_and_ball(self, tiny_logits_fn, image_batch, rng_key):
        from image_recognition_adversarial_example_attack_tpu.attacks import (
            make_eot_logits_fn,
        )
        from image_recognition_adversarial_example_attack_tpu.eval.robust_eval import (
            autoattack_rand,
        )

        x = jnp.asarray(image_batch)
        y = _labels(tiny_logits_fn, x)
        eps = 8 / 255
        res = jax.jit(lambda x, y, k: autoattack_rand(
            tiny_logits_fn, x, y, eps=eps, key=k, eot_samples=4,
            sigma=0.05, apgd_steps=4, square_steps=5,
        ))(x, y, rng_key)

        succ = np.asarray(res.success)
        any_arm = np.asarray(res.success_apgd_ce | res.success_apgd_dlr
                             | res.success_square)
        np.testing.assert_array_equal(succ, any_arm)
        # the worst-case iterate stays in the eps ball
        assert float(jnp.max(jnp.abs(res.x_adv - x))) <= eps + 1e-6
        # success was judged on the expected classifier: recomputing the
        # eval wrapper (deterministic in key+input) must reproduce it —
        # the key schedule below mirrors autoattack_rand's split order
        k_wrap, k_ce, k_dlr, k_sq, k_eval = jax.random.split(rng_key, 5)
        eval_fn = make_eot_logits_fn(tiny_logits_fn, k_eval, n_samples=4,
                                     sigma=0.05)
        mis = np.asarray(jnp.argmax(eval_fn(res.x_adv), -1) != y)
        assert np.all(mis[succ])

    def test_deterministic_given_key(self, tiny_logits_fn, image_batch, rng_key):
        from image_recognition_adversarial_example_attack_tpu.eval.robust_eval import (
            autoattack_rand,
        )

        x = jnp.asarray(image_batch)
        y = _labels(tiny_logits_fn, x)
        run = jax.jit(lambda k: autoattack_rand(
            tiny_logits_fn, x, y, eps=8 / 255, key=k, eot_samples=2,
            sigma=0.1, apgd_steps=3, square_steps=3).x_adv)
        np.testing.assert_array_equal(np.asarray(run(rng_key)),
                                      np.asarray(run(rng_key)))

    @pytest.mark.slow
    def test_robust_cli_rand_protocol(self, tmp_path, capsys):
        import json

        from PIL import Image

        from image_recognition_adversarial_example_attack_tpu.cli.robust_eval import (
            main,
        )

        rng = np.random.RandomState(3)
        d = tmp_path / "imgs"
        d.mkdir()
        for i in range(2):
            Image.fromarray((rng.rand(48, 48, 3) * 255).astype(np.uint8)).save(
                d / f"i{i}.jpg")
        out = tmp_path / "rand.json"
        rc = main(["--image_dir", str(d), "--model", "resnet_tiny",
                   "--protocol", "rand", "--eps_list", "0.03137",
                   "--eot_samples", "2", "--eot_sigma", "0.05",
                   "--apgd_steps", "3", "--square_steps", "4",
                   "--output", str(out)])
        assert rc == 0
        text = capsys.readouterr().out
        assert "protocol=rand" in text and "robust_acc=" in text
        data = json.loads(out.read_text())
        assert data["protocol"] == "rand"
        assert data["eot_samples"] == 2
        row = data["results"][0]
        for arm in ("apgd_ce_eot", "apgd_dlr_eot", "square"):
            assert f"success_{arm}" in row
        assert 0.0 <= row["robust_accuracy"] <= 1.0
