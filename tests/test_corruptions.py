"""Common-corruption bank (eval/corruptions.py): shape/range/determinism
contracts, traced-severity single-program behavior, severity monotonicity,
streamed-vs-one-batch counter equality, and the CLI surface."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from image_recognition_adversarial_example_attack_tpu.eval.corruptions import (
    CORRUPTION_NAMES,
    DETERMINISTIC,
    apply_corruption,
    make_corruption_run,
    severity_row,
)


@pytest.fixture(scope="module")
def x_batch():
    rng = np.random.RandomState(3)
    # smooth gradient + low noise: natural-image-like, so blur family
    # distortion grows with severity (pure noise images saturate blurs)
    rr, cc = np.meshgrid(np.linspace(0, 1, 16), np.linspace(0, 1, 16),
                         indexing="ij")
    base = np.stack([rr, cc, 0.5 * (rr + cc)], -1)[None]
    x = 0.8 * base + 0.1 + 0.05 * rng.rand(2, 16, 16, 3)
    return jnp.asarray(np.clip(x, 0, 1), jnp.float32)


class TestBankContracts:
    @pytest.mark.slow
    def test_all_corruptions_shape_range_finite(self, x_batch, rng_key):
        for name in CORRUPTION_NAMES:
            out = np.asarray(apply_corruption(name, x_batch, 3, rng_key))
            assert out.shape == x_batch.shape, name
            assert out.dtype == np.float32, name
            assert np.isfinite(out).all(), name
            assert out.min() >= 0.0 and out.max() <= 1.0, name
            assert np.abs(out - np.asarray(x_batch)).max() > 0, name

    def test_same_key_is_deterministic(self, x_batch, rng_key):
        for name in CORRUPTION_NAMES:
            a = np.asarray(apply_corruption(name, x_batch, 4, rng_key))
            b = np.asarray(apply_corruption(name, x_batch, 4, rng_key))
            np.testing.assert_array_equal(a, b, err_msg=name)

    def test_deterministic_set_ignores_key(self, x_batch):
        k1, k2 = jax.random.PRNGKey(0), jax.random.PRNGKey(99)
        for name in sorted(DETERMINISTIC):
            a = np.asarray(apply_corruption(name, x_batch, 3, k1))
            b = np.asarray(apply_corruption(name, x_batch, 3, k2))
            np.testing.assert_array_equal(a, b, err_msg=name)
            # and a key is optional for these
            c = np.asarray(apply_corruption(name, x_batch, 3))
            np.testing.assert_array_equal(a, c, err_msg=name)

    def test_stochastic_set_requires_key(self, x_batch):
        name = next(n for n in CORRUPTION_NAMES if n not in DETERMINISTIC)
        with pytest.raises(ValueError, match="stochastic"):
            apply_corruption(name, x_batch, 3)

    def test_unknown_name_rejected(self, x_batch, rng_key):
        with pytest.raises(KeyError, match="unknown corruption"):
            apply_corruption("frost", x_batch, 3, rng_key)

    def test_severity_traced_one_program(self, x_batch, rng_key):
        """The whole severity sweep must reuse ONE compiled program (the
        dynamic-eps convention: severity is traced, not static)."""
        f = jax.jit(lambda x, s, k: apply_corruption("gaussian_noise",
                                                     x, s, k))
        outs = [np.asarray(f(x_batch, jnp.int32(s), rng_key))
                for s in (1, 3, 5)]
        assert f._cache_size() == 1
        assert not np.array_equal(outs[0], outs[2])

    def test_severity_row_static_equals_traced(self):
        row_s = np.asarray(severity_row("fog", 2))
        row_t = np.asarray(jax.jit(lambda s: severity_row("fog", s))(
            jnp.int32(2)))
        np.testing.assert_array_equal(row_s, row_t)

    def test_out_of_range_severity_clamps(self, x_batch, rng_key):
        lo = np.asarray(apply_corruption("contrast", x_batch, 0, rng_key))
        s1 = np.asarray(apply_corruption("contrast", x_batch, 1, rng_key))
        np.testing.assert_array_equal(lo, s1)

    def test_monotone_distortion(self, x_batch, rng_key):
        """L2 distortion grows with severity for the monotone families
        (fixed key; the saturate schedule is non-monotone by design)."""
        for name in ("gaussian_noise", "impulse_noise", "gaussian_blur",
                     "zoom_blur", "brightness", "defocus_blur",
                     "elastic_transform"):
            dists = []
            for s in (1, 2, 3, 4, 5):
                out = apply_corruption(name, x_batch, s, rng_key)
                dists.append(float(jnp.linalg.norm(out - x_batch)))
            assert all(b >= a * 0.999 for a, b in zip(dists, dists[1:])), \
                (name, dists)
        # pixelate: fractional block sizes alias on a 16px grid, so only
        # the endpoints are ordered
        d1 = float(jnp.linalg.norm(
            apply_corruption("pixelate", x_batch, 1, rng_key) - x_batch))
        d5 = float(jnp.linalg.norm(
            apply_corruption("pixelate", x_batch, 5, rng_key) - x_batch))
        assert d5 > d1


class TestSpecificSemantics:
    def test_pixelate_constant_blocks(self, x_batch):
        out = np.asarray(apply_corruption("pixelate", x_batch, 5))  # 4px
        blocks = out[0].reshape(4, 4, 4, 4, 3)
        np.testing.assert_array_equal(
            blocks, np.broadcast_to(blocks[:, :1, :, :1], blocks.shape))

    def test_contrast_shrinks_std(self, x_batch):
        out = apply_corruption("contrast", x_batch, 5)
        assert float(jnp.std(out)) < float(jnp.std(x_batch)) * 0.5

    def test_brightness_additive(self, x_batch):
        out = np.asarray(apply_corruption("brightness", x_batch, 2))
        np.testing.assert_allclose(
            out, np.clip(np.asarray(x_batch) + 0.2, 0, 1), atol=1e-6)

    def test_jpeg_traced_quality_matches_static_tables(self, x_batch):
        from image_recognition_adversarial_example_attack_tpu.defenses.jpeg_dct import (
            jpeg_dct_roundtrip,
        )

        static = np.asarray(jpeg_dct_roundtrip(x_batch, quality=40))
        traced = np.asarray(jax.jit(
            lambda x, q: jpeg_dct_roundtrip(x, quality=q))(
                x_batch, jnp.float32(40.0)))
        np.testing.assert_allclose(static, traced, atol=1e-5)

    def test_impulse_noise_sets_extremes(self, x_batch, rng_key):
        out = np.asarray(apply_corruption("impulse_noise", x_batch, 5,
                                          rng_key))
        frac_extreme = np.mean((out == 0.0) | (out == 1.0))
        assert 0.1 < frac_extreme < 0.45  # p=0.27 nominal

    def test_grayscale_batch_supported(self, rng_key):
        x1 = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 1),
                         jnp.float32)
        out = np.asarray(apply_corruption("snow", x1, 3, rng_key))
        assert out.shape == x1.shape and np.isfinite(out).all()

    def test_jpeg_requires_rgb(self, rng_key):
        x1 = jnp.zeros((1, 16, 16, 1), jnp.float32)
        with pytest.raises(ValueError, match="RGB"):
            apply_corruption("jpeg_compression", x1, 1, rng_key)


class TestEvalCell:
    def test_run_matches_manual(self, tiny_logits_fn, x_batch, rng_key):
        run = jax.jit(make_corruption_run(tiny_logits_fn, "contrast"))
        y = jnp.argmax(tiny_logits_fn(x_batch), -1)
        got = np.asarray(run(x_batch, y, jnp.int32(2), rng_key))
        xc = apply_corruption("contrast", x_batch, 2, rng_key)
        want = np.asarray(jnp.argmax(tiny_logits_fn(xc), -1) == y)
        np.testing.assert_array_equal(got, want)
        assert got.dtype == np.bool_ and got.shape == (2,)

    def test_streamed_equals_one_batch(self, tiny_logits_fn,
                                       tmp_path, rng_key):
        from image_recognition_adversarial_example_attack_tpu.core.images import (
            load_image_batch_tolerant,
        )
        from image_recognition_adversarial_example_attack_tpu.eval.streaming import (
            stream_correctness_cell,
        )

        rng = np.random.RandomState(11)
        paths = []
        for i in range(7):
            p = tmp_path / f"img_{i}.jpg"
            Image.fromarray((rng.rand(20, 20, 3) * 255).astype(np.uint8)
                            ).save(p)
            paths.append(p)
        pseudo_fn = jax.jit(
            lambda xx: jnp.argmax(tiny_logits_fn(xx), -1))
        run = jax.jit(make_corruption_run(tiny_logits_fn, "pixelate"))

        x_np, kept = load_image_batch_tolerant(paths, size=16)
        x = jnp.asarray(x_np)
        y = pseudo_fn(x)
        one = np.asarray(run(x, y, jnp.int32(4), rng_key))

        got = stream_correctness_cell(
            run, paths, rng_key, 4, chunk_size=3, size=16,
            pseudo_label_fn=pseudo_fn)
        np.testing.assert_array_equal(got["correct"], one)
        assert got["clean_correct"].all()

    def test_stream_resolved_labels_skips_pseudo(self, tiny_logits_fn,
                                                 tmp_path, rng_key):
        """Fully-resolved labels must skip the per-chunk clean forward
        (the prelude-pass optimization) and agree with the pseudo path."""
        from image_recognition_adversarial_example_attack_tpu.eval.streaming import (
            stream_correctness_cell,
        )

        rng = np.random.RandomState(2)
        paths = []
        for i in range(5):
            p = tmp_path / f"r_{i}.jpg"
            Image.fromarray((rng.rand(20, 20, 3) * 255).astype(np.uint8)
                            ).save(p)
            paths.append(p)
        calls = []

        def pseudo_fn(xx):
            calls.append(1)
            return jnp.argmax(tiny_logits_fn(xx), -1)

        run = jax.jit(make_corruption_run(tiny_logits_fn, "pixelate"))
        with_pseudo = stream_correctness_cell(
            run, paths, rng_key, 3, chunk_size=2, size=16,
            pseudo_label_fn=pseudo_fn)
        # resolved labels = the model's own clean predictions
        from image_recognition_adversarial_example_attack_tpu.core.images import (
            load_image_batch_tolerant,
        )

        x_np, _ = load_image_batch_tolerant(paths, size=16)
        labels = np.asarray(
            jnp.argmax(tiny_logits_fn(jnp.asarray(x_np)), -1))
        calls.clear()
        no_pseudo = stream_correctness_cell(
            run, paths, rng_key, 3, chunk_size=2, size=16, labels=labels)
        assert not calls  # pseudo_fn absent AND not needed
        assert "clean_correct" not in no_pseudo
        np.testing.assert_array_equal(no_pseudo["correct"],
                                      with_pseudo["correct"])

    def test_stream_requires_label_source(self, tiny_logits_fn, rng_key):
        from image_recognition_adversarial_example_attack_tpu.eval.streaming import (
            stream_correctness_cell,
        )

        run = jax.jit(make_corruption_run(tiny_logits_fn, "contrast"))
        with pytest.raises(ValueError, match="labels or pseudo_label_fn"):
            stream_correctness_cell(run, [], jax.random.PRNGKey(0), 1,
                                    chunk_size=2, size=16)
        with pytest.raises(ValueError, match="UNLABELED"):
            stream_correctness_cell(run, [], jax.random.PRNGKey(0), 1,
                                    chunk_size=2, size=16, labels=[-1, 2])

    def test_streamed_ground_truth_labels(self, tiny_logits_fn,
                                          tmp_path, rng_key):
        from image_recognition_adversarial_example_attack_tpu.eval.streaming import (
            stream_correctness_cell,
        )

        rng = np.random.RandomState(5)
        paths = []
        for i in range(4):
            p = tmp_path / f"g_{i}.jpg"
            Image.fromarray((rng.rand(20, 20, 3) * 255).astype(np.uint8)
                            ).save(p)
            paths.append(p)
        pseudo_fn = jax.jit(
            lambda xx: jnp.argmax(tiny_logits_fn(xx), -1))
        run = jax.jit(make_corruption_run(tiny_logits_fn, "contrast"))
        # labels: two ground-truth ids + two UNLABELED sentinels
        labels = [0, 1, -1, -1]
        got = stream_correctness_cell(
            run, paths, rng_key, 1, chunk_size=2, size=16,
            pseudo_label_fn=pseudo_fn, labels=labels)
        assert len(got["correct"]) == 4
        # sentinel rows use pseudo-labels -> clean_correct True there
        assert got["clean_correct"][2:].all()


class TestCLI:
    @pytest.mark.slow
    def test_corruption_eval_cli(self, tmp_path, capsys):
        from image_recognition_adversarial_example_attack_tpu.cli.corruption_eval import (
            main,
        )

        d = tmp_path / "imgs"
        d.mkdir()
        rng = np.random.RandomState(0)
        for i in range(3):
            Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)
                            ).save(d / f"img_{i}.jpg")
        out = tmp_path / "report.json"
        rc = main(["--image_dir", str(d), "--model", "resnet_tiny",
                   "--corruptions", "contrast", "brightness",
                   "--severities", "1", "5",
                   "--output", str(out)])
        assert rc == 0
        text = capsys.readouterr().out
        assert "mean corruption accuracy" in text
        report = json.loads(out.read_text())
        assert set(report["cells"]) == {"contrast", "brightness"}
        assert set(report["cells"]["contrast"]) == {"s1", "s5"}
        assert 0.0 <= report["mean_corruption_accuracy"] <= 1.0
        assert report["label_source"] == "pseudo"
        assert report["n_images"] == 3

    @pytest.mark.slow
    def test_cli_cell_keys_position_independent(self, tmp_path):
        """A narrowed re-run must reproduce the full run's cells: the
        per-cell key depends on the corruption NAME, not its position in
        --corruptions (the cell_key convention)."""
        from image_recognition_adversarial_example_attack_tpu.cli.corruption_eval import (
            main,
        )

        d = tmp_path / "imgs"
        d.mkdir()
        rng = np.random.RandomState(1)
        for i in range(3):
            Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)
                            ).save(d / f"img_{i}.jpg")
        accs = []
        for corruptions in (["gaussian_noise"],
                            ["contrast", "brightness", "gaussian_noise"]):
            out = tmp_path / f"rep_{len(corruptions)}.json"
            rc = main(["--image_dir", str(d), "--model", "resnet_tiny",
                       "--corruptions", *corruptions, "--severities", "3",
                       "--seed", "7", "--output", str(out)])
            assert rc == 0
            accs.append(json.loads(out.read_text())
                        ["cells"]["gaussian_noise"]["s3"])
        assert accs[0] == accs[1]

    @pytest.mark.slow
    def test_corruption_eval_cli_streaming(self, tmp_path, capsys):
        """Image sets beyond --max_batch stream through the prelude-pass
        path; the report matches the shape of the one-batch path."""
        from image_recognition_adversarial_example_attack_tpu.cli.corruption_eval import (
            main,
        )

        d = tmp_path / "imgs"
        d.mkdir()
        rng = np.random.RandomState(4)
        for i in range(5):
            Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)
                            ).save(d / f"img_{i}.jpg")
        out = tmp_path / "stream.json"
        rc = main(["--image_dir", str(d), "--model", "resnet_tiny",
                   "--corruptions", "contrast", "--severities", "2",
                   "--max_batch", "2", "--output", str(out)])
        assert rc == 0
        assert "Streaming evaluation" in capsys.readouterr().out
        report = json.loads(out.read_text())
        assert report["n_images"] == 5
        assert report["clean_accuracy"] == 1.0  # pseudo-labels by definition
        assert set(report["cells"]) == {"contrast"}

    def test_corruption_eval_cli_rejects_unknown(self, tmp_path):
        from image_recognition_adversarial_example_attack_tpu.cli.corruption_eval import (
            main,
        )

        d = tmp_path / "imgs"
        d.mkdir()
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(d / "a.jpg")
        with pytest.raises(SystemExit, match="unknown corruptions"):
            main(["--image_dir", str(d), "--corruptions", "frost"])
