"""Randomized smoothing (certified defense) + feature-squeezing detector.

Both are beyond-reference extensions (the reference's defense story is
empirical preprocessing + one feature-statistics detector,
defense_experiments.py:170-345); these tests pin the statistical behavior
on analytic classifiers where the smoothed ground truth is computable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_recognition_adversarial_example_attack_tpu.defenses import (
    ABSTAIN,
    SmoothedClassifier,
    SmoothingConfig,
    calibrate_squeezing_threshold,
    is_adversarial_by_squeezing,
    squeezing_score,
)
from image_recognition_adversarial_example_attack_tpu.defenses.smoothing import (
    _binom_p_lower,
    make_counts_fn,
)


def _mean_intensity_logits(scale=200.0):
    """Analytic binary classifier: class 0 iff mean intensity > 0.5.

    The smoothed classifier's behavior is exactly computable: Gaussian
    pixel noise leaves the mean's sign unchanged with probability
    Phi(margin * sqrt(npix) / sigma), so high-margin inputs certify and
    boundary inputs split 50/50.
    """

    def logits_fn(x):
        s = (jnp.mean(x, axis=(1, 2, 3)) - 0.5) * scale
        return jnp.stack([s, -s], axis=-1)

    return logits_fn


class TestCountsCore:
    def test_votes_sum_and_determinism(self):
        lf = _mean_intensity_logits()
        counts_fn = make_counts_fn(lf, chunk=8)
        x = jnp.full((3, 4, 4, 3), 0.7, jnp.float32)
        k = jax.random.PRNGKey(0)
        c1 = np.asarray(counts_fn(x, k, jnp.float32(0.25), 4))
        c2 = np.asarray(counts_fn(x, k, jnp.float32(0.25), 4))
        np.testing.assert_array_equal(c1, c2)
        assert c1.shape == (3, 2)
        np.testing.assert_array_equal(c1.sum(-1), 32)  # 4 chunks x 8

    def test_votes_follow_the_margin(self):
        """Far from the boundary all votes go to the true class; at the
        boundary they split roughly half/half."""
        lf = _mean_intensity_logits()
        counts_fn = make_counts_fn(lf, chunk=16)
        x = jnp.stack([
            jnp.full((4, 4, 3), 0.9, jnp.float32),   # strong class 0
            jnp.full((4, 4, 3), 0.1, jnp.float32),   # strong class 1
            jnp.full((4, 4, 3), 0.5, jnp.float32),   # exactly on boundary
        ])
        c = np.asarray(counts_fn(x, jax.random.PRNGKey(1), jnp.float32(0.25), 16))  # 256 votes
        assert c[0, 0] == 256 and c[1, 1] == 256
        assert 64 < c[2, 0] < 192  # ~Binomial(256, 0.5)


class TestClopperPearson:
    def test_bounds(self):
        assert _binom_p_lower(0, 100, 0.001) == 0.0
        p_all = _binom_p_lower(100, 100, 0.001)
        assert 0.9 < p_all < 1.0
        # monotone in successes
        ps = [_binom_p_lower(k, 100, 0.001) for k in (50, 70, 90, 100)]
        assert all(a < b for a, b in zip(ps, ps[1:]))
        # always below the empirical rate (it is a LOWER bound)
        assert _binom_p_lower(90, 100, 0.001) < 0.9


class TestSmoothedClassifier:
    def test_certifies_high_margin_inputs(self):
        lf = _mean_intensity_logits()
        sc = SmoothedClassifier(
            lf, SmoothingConfig(sigma=0.25, n0=16, n=256, chunk=16, alpha=0.001)
        )
        x = jnp.stack([
            jnp.full((4, 4, 3), 0.9, jnp.float32),
            jnp.full((4, 4, 3), 0.1, jnp.float32),
        ])
        classes, radii = sc.certify(x, jax.random.PRNGKey(0))
        np.testing.assert_array_equal(classes, [0, 1])
        assert np.all(radii > 0.3)  # every vote correct: R = sigma*Phi^-1(p_low)
        # radius never exceeds the all-votes-correct maximum
        from scipy.stats import norm
        r_max = 0.25 * norm.ppf(_binom_p_lower(256, 256, 0.001))
        assert np.all(radii <= r_max + 1e-9)

    def test_abstains_on_the_boundary(self):
        lf = _mean_intensity_logits()
        sc = SmoothedClassifier(
            lf, SmoothingConfig(sigma=0.25, n0=16, n=128, chunk=16, alpha=0.001)
        )
        x = jnp.full((1, 4, 4, 3), 0.5, jnp.float32)  # 50/50 vote split
        classes, radii = sc.certify(x, jax.random.PRNGKey(2))
        assert classes[0] == ABSTAIN and radii[0] == 0.0
        assert sc.predict(x, jax.random.PRNGKey(3))[0] == ABSTAIN

    def test_predict_decides_clear_cases(self):
        lf = _mean_intensity_logits()
        sc = SmoothedClassifier(
            lf, SmoothingConfig(sigma=0.1, n0=16, n=128, chunk=16, alpha=0.01)
        )
        x = jnp.stack([
            jnp.full((4, 4, 3), 0.8, jnp.float32),
            jnp.full((4, 4, 3), 0.2, jnp.float32),
        ])
        np.testing.assert_array_equal(
            sc.predict(x, jax.random.PRNGKey(4)), [0, 1]
        )

    def test_certification_is_sound_for_the_smoothed_classifier(self):
        """Inside the certified radius the SMOOTHED prediction cannot change:
        verify empirically by re-voting at the L2 boundary of the ball."""
        lf = _mean_intensity_logits()
        sc = SmoothedClassifier(
            lf, SmoothingConfig(sigma=0.25, n0=16, n=256, chunk=16, alpha=0.001)
        )
        x = jnp.full((1, 4, 4, 3), 0.8, jnp.float32)
        classes, radii = sc.certify(x, jax.random.PRNGKey(5))
        assert classes[0] == 0 and radii[0] > 0
        # worst-case direction for this classifier: uniform darkening
        npix = 4 * 4 * 3
        delta = 0.98 * float(radii[0]) / np.sqrt(npix)
        x_shift = x - delta
        got = sc.predict(x_shift, jax.random.PRNGKey(6))
        assert got[0] in (0, ABSTAIN)  # never the OTHER class inside the ball


class TestFeatureSqueezing:
    def test_checkerboard_perturbation_scores_higher(self, tiny_logits_fn, image_batch):
        """High-frequency (smoothing-destroyed) perturbations must move the
        prediction more than the clean input does."""
        x = jnp.asarray(image_batch)
        i, j = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
        checker = ((-1.0) ** (i + j))[None, :, :, None].astype(np.float32)
        x_pert = jnp.clip(x + 0.15 * checker, 0.0, 1.0)
        s_clean = np.asarray(squeezing_score(tiny_logits_fn, x))
        s_pert = np.asarray(squeezing_score(tiny_logits_fn, x_pert))
        assert np.all(s_pert > s_clean)
        assert np.all(s_clean >= 0.0) and np.all(s_pert <= 2.0)  # L1 of probs

    def test_calibration_and_flag_rule(self, tiny_logits_fn):
        rng = np.random.RandomState(3)
        x_clean = jnp.asarray(rng.uniform(0.2, 0.8, (40, 16, 16, 3)).astype(np.float32))
        thr = calibrate_squeezing_threshold(tiny_logits_fn, x_clean, quantile=0.95)
        flags = np.asarray(is_adversarial_by_squeezing(tiny_logits_fn, x_clean, thr))
        assert flags.mean() <= 0.10  # ~5% clean false positives by construction
        scores = np.asarray(squeezing_score(tiny_logits_fn, x_clean))
        np.testing.assert_array_equal(flags, scores > thr)

    def test_jits_as_one_program(self, tiny_logits_fn, image_batch):
        x = jnp.asarray(image_batch)
        eager = squeezing_score(tiny_logits_fn, x)
        jitted = jax.jit(lambda xx: squeezing_score(tiny_logits_fn, xx))(x)
        np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted),
                                   rtol=1e-6, atol=1e-6)


class TestCertifyCLI:
    @pytest.mark.slow
    def test_smoke(self, tmp_path, capsys):
        import json

        from PIL import Image

        from image_recognition_adversarial_example_attack_tpu.cli.certify import main

        d = tmp_path / "imgs"
        d.mkdir()
        rng = np.random.RandomState(0)
        for i in range(2):
            Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(
                d / f"img_{i}.jpg")
        out = tmp_path / "cert.json"
        rc = main(["--image_dir", str(d), "--model", "resnet_tiny",
                   "--sigma", "0.25", "--n0", "8", "--n", "32", "--chunk", "8",
                   "--output", str(out)])
        assert rc == 0
        text = capsys.readouterr().out
        assert "certified_radius=" in text
        data = json.loads(out.read_text())
        assert len(data["sweeps"]) == 1
        rows = data["sweeps"][0]["results"]
        assert len(rows) == 2
        for row in rows:
            assert row["certified_radius"] >= 0.0
            assert row["smoothed_prediction"] >= -1


class TestMaxBatchSlicing:
    def test_counts_shape_and_sums_across_slicing(self):
        """5 images through max_batch=2 (padded tail) must yield one count
        row per image, each summing to the full sample budget."""
        lf = _mean_intensity_logits()
        cfg = SmoothingConfig(sigma=0.25, n0=8, n=64, chunk=8, alpha=0.01,
                              max_batch=2)
        sc = SmoothedClassifier(lf, cfg)
        x = jnp.stack([jnp.full((4, 4, 3), v, jnp.float32)
                       for v in (0.9, 0.8, 0.7, 0.2, 0.1)])
        counts = sc._sample(x, jax.random.PRNGKey(0), cfg.n)
        assert counts.shape == (5, 2)
        np.testing.assert_array_equal(counts.sum(-1), 64)
        # high-margin rows still vote unanimously through the sliced path
        np.testing.assert_array_equal(np.argmax(counts, -1), [0, 0, 0, 1, 1])

    @pytest.mark.slow
    def test_certify_unaffected_by_slicing_for_clear_inputs(self):
        lf = _mean_intensity_logits()
        x = jnp.stack([jnp.full((4, 4, 3), 0.9, jnp.float32)] * 3)
        base = SmoothedClassifier(lf, SmoothingConfig(
            sigma=0.25, n0=8, n=128, chunk=16, alpha=0.001, max_batch=8))
        sliced = SmoothedClassifier(lf, SmoothingConfig(
            sigma=0.25, n0=8, n=128, chunk=16, alpha=0.001, max_batch=1))
        c1, r1 = base.certify(x, jax.random.PRNGKey(0))
        c2, r2 = sliced.certify(x, jax.random.PRNGKey(0))
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_allclose(r1, r2)  # all votes correct either way


class TestCertifyLabelsJson:
    @pytest.mark.slow
    def test_plot_scores_against_ground_truth(self, tmp_path, capsys):
        import json

        from PIL import Image

        from image_recognition_adversarial_example_attack_tpu.cli.certify import main

        d = tmp_path / "imgs"
        d.mkdir()
        rng = np.random.RandomState(0)
        for i in range(2):
            Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(
                d / f"img_{i}.jpg")
        lbl = tmp_path / "labels.json"
        lbl.write_text(json.dumps({"img_0.jpg": 0, "img_1.jpg": 1}))
        fig = tmp_path / "acc.png"
        rc = main(["--image_dir", str(d), "--model", "resnet_tiny",
                   "--n0", "8", "--n", "16", "--chunk", "8",
                   "--labels_json", str(lbl), "--plot", str(fig),
                   "--output", str(tmp_path / "c.json")])
        assert rc == 0
        assert fig.is_file()


class TestCertifiedSummaryColumn:
    """--certified on defense_experiments (VERDICT r3 #9): per-eps
    verified-accuracy rows on the same summary surface as the empirical
    grid, one-batch and streamed, with the fail-fast rail."""

    def _tree(self, tmp_path, n=6):
        from PIL import Image

        d = tmp_path / "imgs"
        d.mkdir()
        rng = np.random.RandomState(3)
        for i in range(n):
            Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)).save(
                d / f"im_{i}.jpg")
        return d

    @pytest.mark.slow
    def test_certified_rows_one_batch_and_streamed_agree(self, tmp_path,
                                                         capsys):
        import json

        from image_recognition_adversarial_example_attack_tpu.cli.defense_experiments import (
            main,
        )

        d = self._tree(tmp_path)
        rows = {}
        for mb, name in ((0, "one"), (4, "stream")):
            out = tmp_path / name
            rc = main(["--image_dir", str(d), "--model", "ibp_tiny",
                       "--attacks", "fgsm", "--eps_list", "0.004",
                       "--steps", "2", "--certified", "ibp",
                       "--max_batch", str(mb), "--viz_samples", "0",
                       "--output_dir", str(out)])
            assert rc == 0
            rows[name] = json.loads(
                (out / "certified_accuracy.json").read_text())["rows"]
        text = capsys.readouterr().out
        assert "certified(ibp), eps=0.00400:" in text
        for a, b in zip(rows["one"], rows["stream"]):
            # same deterministic interval forward, same labels -> equal
            assert a["count"] == b["count"] == 6
            assert a["verified_accuracy"] == pytest.approx(
                b["verified_accuracy"], abs=1e-9)
            assert a["clean_accuracy"] == pytest.approx(
                b["clean_accuracy"], abs=1e-9)
            assert 0.0 <= a["verified_accuracy"] <= a["clean_accuracy"] <= 1.0

    def test_certified_fails_fast_on_specless_model(self, tmp_path):
        from image_recognition_adversarial_example_attack_tpu.cli.defense_experiments import (
            main,
        )

        d = self._tree(tmp_path, n=2)
        with pytest.raises(SystemExit, match="spec-driven model"):
            main(["--image_dir", str(d), "--model", "resnet_tiny",
                  "--attacks", "fgsm", "--certified", "ibp",
                  "--viz_samples", "0", "--output_dir", str(tmp_path / "o")])
