"""Dataset-scale streaming evaluation (eval/streaming.py +
utils.pipeline.EvalBatchPipeline): chunked sweeps must run at constant
memory with counters identical to the one-batch path (VERDICT r2 next #1).
"""

import json
import tracemalloc

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from image_recognition_adversarial_example_attack_tpu.core.constants import (
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from image_recognition_adversarial_example_attack_tpu.defenses.detector import (
    make_features_fn,
)
from image_recognition_adversarial_example_attack_tpu.eval.defense_eval import (
    STAT_KEYS,
    DefenseEvalConfig,
    aggregate_stats,
    make_defense_eval_fn_dynamic_eps,
)
from image_recognition_adversarial_example_attack_tpu.eval.streaming import (
    round_up,
    stream_defense_cell,
)
from image_recognition_adversarial_example_attack_tpu.utils.pipeline import (
    EvalBatchPipeline,
)


@pytest.fixture(scope="module")
def eval_dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("evalds")
    rng = np.random.RandomState(7)
    paths = []
    for i in range(10):
        p = d / f"img_{i:02d}.jpg"
        Image.fromarray((rng.rand(40, 40, 3) * 255).astype(np.uint8)).save(p)
        paths.append(p)
    return paths


class TestEvalBatchPipeline:
    def test_order_tail_and_labels(self, eval_dataset):
        from image_recognition_adversarial_example_attack_tpu.core.images import (
            load_image_batch_tolerant,
        )

        paths = eval_dataset
        labels = list(range(100, 110))
        got = list(EvalBatchPipeline(paths, 4, labels=labels, size=32))
        assert [(s, nv) for s, _, _, nv in got] == [(0, 4), (1, 4), (2, 2)]
        x_all, _ = load_image_batch_tolerant(paths, size=32)
        flat_x = np.concatenate([x[:nv] for _, x, _, nv in got])
        np.testing.assert_array_equal(flat_x, x_all)  # ordered, exactly once
        flat_y = np.concatenate([y[:nv] for _, _, y, nv in got])
        assert flat_y.tolist() == labels
        # every chunk keeps the static shape (tail padded)
        for _, x, y, _ in got:
            assert x.shape == (4, 32, 32, 3) and y.shape == (4,)

    def test_no_labels_yields_none(self, eval_dataset):
        for _, _, y, _ in EvalBatchPipeline(eval_dataset, 5, size=32):
            assert y is None

    def test_decode_failure_shrinks_n_valid(self, eval_dataset, tmp_path):
        bad = tmp_path / "corrupt.jpg"
        bad.write_bytes(b"not a jpeg")
        paths = list(eval_dataset[:3]) + [bad] + list(eval_dataset[3:6])
        labels = [0, 1, 2, 99, 3, 4, 5]
        got = list(EvalBatchPipeline(paths, 4, labels=labels, size=32))
        # chunk 0 holds paths[0:4] with the corrupt one dropped
        s0, x0, y0, nv0 = got[0]
        assert nv0 == 3 and x0.shape[0] == 4
        assert y0[:3].tolist() == [0, 1, 2]  # label 99 dropped with its image
        s1, _, y1, nv1 = got[1]
        assert nv1 == 3 and y1[:3].tolist() == [3, 4, 5]

    def test_all_unreadable_chunk_dropped(self, eval_dataset, tmp_path):
        bad = tmp_path / "bad2.jpg"
        bad.write_bytes(b"nope")
        paths = [bad, bad] + list(eval_dataset[:2])
        got = list(EvalBatchPipeline(paths, 2, size=32))
        assert len(got) == 1 and got[0][3] == 2  # only the readable chunk

    def test_single_use_and_validation(self, eval_dataset):
        with pytest.raises(ValueError):
            EvalBatchPipeline([], 4)
        with pytest.raises(ValueError):
            EvalBatchPipeline(eval_dataset, 4, labels=[1, 2])
        pipe = EvalBatchPipeline(eval_dataset, 4, size=32)
        list(pipe)
        with pytest.raises(RuntimeError):
            next(iter(pipe))


def test_round_up():
    assert round_up(10, 4) == 12
    assert round_up(8, 4) == 8
    assert round_up(1, 1) == 1
    assert round_up(5, 0) == 5  # degenerate multiple clamps to 1


class TestStreamDefenseCell:
    @pytest.mark.parametrize("attack", [
        "fgsm", "cw"])  # whole test is slow-marked; no per-param mark needed
    @pytest.mark.slow
    def test_counters_identical_to_one_batch(self, tiny_resnet, eval_dataset,
                                             attack):
        """Deterministic attacks: streamed chunks through the SAME compiled
        program must reproduce the one-batch counters exactly."""
        from image_recognition_adversarial_example_attack_tpu.core.images import (
            load_image_batch_tolerant,
        )

        model, variables = tiny_resnet
        lf = lambda xx: model.apply(variables, xx)  # noqa: E731
        ffn = make_features_fn(model, variables, IMAGENET_MEAN, IMAGENET_STD)
        cfg = DefenseEvalConfig(attack_name=attack, eps=0.0, alpha=2 / 255,
                                steps=2, cw_steps=3)
        fn = make_defense_eval_fn_dynamic_eps(lf, ffn, cfg)
        pseudo_fn = jax.jit(lambda xx: jnp.argmax(lf(xx), -1))
        key = jax.random.PRNGKey(0)
        eps = jnp.float32(8 / 255)
        threshold = 2.0

        x_all, _ = load_image_batch_tolerant(eval_dataset, size=32)
        x = jnp.asarray(x_all)
        one = aggregate_stats(fn(x, pseudo_fn(x), threshold, key, eps),
                              n_valid=x_all.shape[0])

        streamed = stream_defense_cell(
            fn, eval_dataset, threshold, key, eps, chunk_size=4, size=32,
            pseudo_label_fn=pseudo_fn,
        )
        assert streamed == one  # all six counters + count

    def test_progress_callback(self, tiny_resnet, eval_dataset):
        model, variables = tiny_resnet
        lf = lambda xx: model.apply(variables, xx)  # noqa: E731
        ffn = make_features_fn(model, variables, IMAGENET_MEAN, IMAGENET_STD)
        cfg = DefenseEvalConfig(attack_name="fgsm", eps=0.0, alpha=2 / 255,
                                steps=1, cw_steps=1)
        fn = make_defense_eval_fn_dynamic_eps(lf, ffn, cfg)
        pseudo_fn = jax.jit(lambda xx: jnp.argmax(lf(xx), -1))
        seen = []
        stream_defense_cell(
            fn, eval_dataset, 2.0, jax.random.PRNGKey(0), jnp.float32(0.03),
            chunk_size=4, size=32, pseudo_label_fn=pseudo_fn,
            progress=lambda i, n: seen.append((i, n)),
        )
        assert seen == [(1, 3), (2, 3), (3, 3)]


class TestCLIAutoChunk:
    def _run_defense(self, image_dir, out_dir, max_batch, capsys):
        from image_recognition_adversarial_example_attack_tpu.cli.defense_experiments import (
            main,
        )

        rc = main(["--image_dir", str(image_dir), "--attacks", "fgsm",
                   "--eps_list", "0.03137", "--steps", "2",
                   "--model", "resnet_tiny", "--viz_samples", "0",
                   "--max_batch", str(max_batch),
                   "--detector_threshold", "2.0",
                   "--output_dir", str(out_dir)])
        assert rc == 0
        out = capsys.readouterr().out
        return [ln for ln in out.splitlines() if ln.startswith("attack=")]

    @pytest.mark.slow
    def test_defense_cli_streams_when_over_cap(self, eval_dataset, tmp_path,
                                               capsys):
        """--max_batch smaller than the image set => streamed chunks, with
        summary lines identical to the one-batch run (fgsm deterministic)."""
        image_dir = eval_dataset[0].parent
        lines_stream = self._run_defense(image_dir, tmp_path / "s", 4, capsys)
        lines_one = self._run_defense(image_dir, tmp_path / "o", 0, capsys)
        assert lines_stream and lines_stream == lines_one
        part = json.loads((tmp_path / "s" / "results_partial.json").read_text())
        assert all(v["count"] == 10 for v in part.values())

    @pytest.mark.slow
    def test_transfer_cli_streams(self, eval_dataset, tmp_path, capsys):
        from image_recognition_adversarial_example_attack_tpu.cli.transferability import (
            main,
        )

        image_dir = eval_dataset[0].parent
        args = ["--image_dir", str(image_dir),
                "--source_model", "resnet_tiny", "--target_models", "tiny",
                "--attacks", "fgsm", "--eps_list", "0.03137",
                "--steps", "2"]
        rc = main(args + ["--max_batch", "4",
                          "--output_dir", str(tmp_path / "ts")])
        assert rc == 0
        capsys.readouterr()
        rc = main(args + ["--max_batch", "0",
                          "--output_dir", str(tmp_path / "to")])
        assert rc == 0
        capsys.readouterr()
        streamed = json.loads((tmp_path / "ts" / "transfer_results.json").read_text())
        onebatch = json.loads((tmp_path / "to" / "transfer_results.json").read_text())
        assert streamed == onebatch  # per-sample successes, fgsm deterministic

    @pytest.mark.slow
    def test_robust_cli_streams(self, eval_dataset, tmp_path, capsys):
        from image_recognition_adversarial_example_attack_tpu.cli.robust_eval import (
            main,
        )

        image_dir = eval_dataset[0].parent
        out = tmp_path / "robust.json"
        rc = main(["--image_dir", str(image_dir), "--model", "resnet_tiny",
                   "--eps_list", "0.03137", "--apgd_steps", "2",
                   "--square_steps", "3", "--deepfool_steps", "2",
                   "--max_batch", "4", "--output", str(out)])
        assert rc == 0
        text = capsys.readouterr().out
        assert "Streaming evaluation" in text
        data = json.loads(out.read_text())
        assert data["results"][0]["count"] == 10
        assert 0.0 <= data["results"][0]["robust_accuracy"] <= 1.0


@pytest.mark.slow
def test_ten_thousand_images_constant_memory(tiny_resnet, tmp_path_factory):
    """The VERDICT r2 acceptance bar: a >=10k-image sweep runs at constant
    host memory with counters identical to the in-RAM evaluation.

    Memory: during streaming, peak traced allocation stays within a few
    chunks — far below the ~29 MB the full decoded dataset occupies (the
    one-batch path must hold all of it)."""
    d = tmp_path_factory.mktemp("bigds")
    rng = np.random.RandomState(0)
    n, side, chunk = 10_000, 16, 512
    # one shared pixel source; vary a stamp so images differ
    base = (rng.rand(side, side, 3) * 255).astype(np.uint8)
    paths = []
    for i in range(n):
        arr = base.copy()
        arr[0, 0] = (i % 251, (i * 7) % 251, (i * 13) % 251)
        p = d / f"i{i:05d}.jpg"
        Image.fromarray(arr).save(p, quality=50)
        paths.append(p)

    model, variables = tiny_resnet
    lf = lambda xx: model.apply(variables, xx)  # noqa: E731
    ffn = make_features_fn(model, variables, IMAGENET_MEAN, IMAGENET_STD)
    cfg = DefenseEvalConfig(attack_name="fgsm", eps=0.0, alpha=2 / 255,
                            steps=1, cw_steps=1)
    fn = make_defense_eval_fn_dynamic_eps(lf, ffn, cfg)
    pseudo_fn = jax.jit(lambda xx: jnp.argmax(lf(xx), -1))
    eps = jnp.float32(8 / 255)

    tracemalloc.start()
    streamed = stream_defense_cell(
        fn, paths, 2.0, jax.random.PRNGKey(0), eps, chunk_size=chunk,
        size=side, pseudo_label_fn=pseudo_fn,
    )
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert streamed["count"] == n

    full_bytes = n * side * side * 3 * 4  # what one resident batch costs
    chunk_bytes = chunk * side * side * 3 * 4
    assert peak < max(8 * chunk_bytes, full_bytes // 2), (
        f"peak {peak / 1e6:.1f} MB vs full dataset {full_bytes / 1e6:.1f} MB")

    # counters match the in-RAM path computed chunkwise (same program) —
    # prove correctness without materializing all 10k images at once
    from image_recognition_adversarial_example_attack_tpu.core.images import (
        load_image_batch_tolerant,
    )

    totals = {k: 0 for k in STAT_KEYS}
    for s in range(0, n, chunk):
        x_np, _ = load_image_batch_tolerant(paths[s:s + chunk], size=side)
        x = jnp.asarray(x_np)
        out = fn(x, pseudo_fn(x), 2.0, jax.random.PRNGKey(0), eps)
        got = jax.device_get({k: out[k] for k in STAT_KEYS})
        for k in STAT_KEYS:
            totals[k] += int(np.sum(got[k]))
    for k in STAT_KEYS:
        assert streamed[k] == totals[k]


@pytest.mark.slow
def test_blackbox_cli_streams(eval_dataset, capsys):
    """The fixed-trio harness also auto-chunks: streamed counts equal the
    one-batch run (fgsm deterministic)."""
    import re

    from image_recognition_adversarial_example_attack_tpu.cli.blackbox_transfer import (
        main,
    )

    image_dir = eval_dataset[0].parent
    base = ["--image_dir", str(image_dir), "--attacks", "fgsm",
            "--source", "resnet_tiny", "--targets", "tiny",
            "--steps", "2", "--visualize_n", "0"]
    rc = main(base + ["--max_batch", "4"])
    assert rc == 0
    out_stream = capsys.readouterr().out
    assert "Streaming evaluation" in out_stream
    rc = main(base + ["--max_batch", "0"])
    assert rc == 0
    out_one = capsys.readouterr().out
    row = re.compile(r"FGSM\t\d+\.\d%")
    assert row.search(out_stream).group() == row.search(out_one).group()


@pytest.mark.slow
def test_streaming_clis_reject_all_unreadable(tmp_path):
    """Review regression: an all-corrupt image set in streaming mode must
    exit with the same clear 'no loadable images' error as the one-batch
    path, not KeyError/UnboundLocalError."""
    d = tmp_path / "corrupt"
    d.mkdir()
    for i in range(6):
        (d / f"bad_{i}.jpg").write_bytes(b"not a jpeg")

    from image_recognition_adversarial_example_attack_tpu.cli.blackbox_transfer import (
        main as bb_main,
    )
    from image_recognition_adversarial_example_attack_tpu.cli.robust_eval import (
        main as re_main,
    )

    with pytest.raises(SystemExit, match="no loadable images"):
        re_main(["--image_dir", str(d), "--model", "resnet_tiny",
                 "--eps_list", "0.03", "--apgd_steps", "1",
                 "--square_steps", "1", "--deepfool_steps", "1",
                 "--max_batch", "2"])
    with pytest.raises(SystemExit, match="no loadable images"):
        bb_main(["--image_dir", str(d), "--attacks", "fgsm",
                 "--source", "resnet_tiny", "--targets", "tiny",
                 "--steps", "1", "--visualize_n", "0", "--max_batch", "2"])


@pytest.mark.slow
def test_defense_cli_labels_json(eval_dataset, tmp_path, capsys):
    """--labels_json on the defense grid: ground truth drives
    clean_correct; streamed and one-batch paths agree (fgsm
    deterministic); partial files fall back to pseudo-labels."""
    from image_recognition_adversarial_example_attack_tpu.cli.defense_experiments import (
        main,
    )

    image_dir = eval_dataset[0].parent
    # label half the images with a guaranteed-wrong IN-RANGE class
    # (pseudo+1 mod classes), leave the rest to the pseudo-label fallback
    from image_recognition_adversarial_example_attack_tpu.attacks import (
        make_logits_fn,
    )
    from image_recognition_adversarial_example_attack_tpu.core.images import (
        load_image_batch,
    )
    from image_recognition_adversarial_example_attack_tpu.models.zoo import (
        load_model,
    )

    b = load_model("resnet_tiny")
    lf = make_logits_fn(b.module, b.variables, b.mean, b.std)
    preds = np.asarray(jax.jit(lambda x: jnp.argmax(lf(x), -1))(
        jnp.asarray(load_image_batch(eval_dataset[:5]))))
    lbl = tmp_path / "labels.json"
    lbl.write_text(json.dumps(
        {eval_dataset[i].name: int((preds[i] + 1) % 10) for i in range(5)}))

    outs = []
    for mb in (4, 0):
        rc = main(["--image_dir", str(image_dir), "--attacks", "fgsm",
                   "--eps_list", "0.03137", "--steps", "2",
                   "--model", "resnet_tiny", "--viz_samples", "0",
                   "--max_batch", str(mb), "--labels_json", str(lbl),
                   "--detector_threshold", "2.0",
                   "--output_dir", str(tmp_path / f"o{mb}")])
        assert rc == 0
        outs.append(capsys.readouterr().out)
    rows = [sorted(ln for ln in o.splitlines() if ln.startswith("attack="))
            for o in outs]
    assert rows[0] and rows[0] == rows[1]
    assert "clean accuracy vs ground truth" in outs[1]
    # 5 images labeled class 999 (tiny model can't predict it) -> at most
    # 5 of 10 clean-correct; results_partial carries the counter
    part = json.loads((tmp_path / "o0" / "results_partial.json").read_text())
    cell = next(iter(part.values()))
    assert cell["clean_correct"] == 5  # the 5 mislabeled images miss


def test_stream_defense_cell_rejects_sentinel_without_pseudo(tiny_resnet,
                                                             eval_dataset):
    """Review-r3c regression: -1 sentinel labels without a pseudo_label_fn
    must raise instead of silently evaluating against class -1."""
    model, variables = tiny_resnet
    lf = lambda xx: model.apply(variables, xx)  # noqa: E731
    ffn = make_features_fn(model, variables, IMAGENET_MEAN, IMAGENET_STD)
    cfg = DefenseEvalConfig(attack_name="fgsm", eps=0.0, alpha=2 / 255,
                            steps=1, cw_steps=1)
    fn = make_defense_eval_fn_dynamic_eps(lf, ffn, cfg)
    labels = [-1] + [0] * (len(eval_dataset) - 1)
    with pytest.raises(ValueError, match="UNLABELED"):
        stream_defense_cell(fn, eval_dataset, 2.0, jax.random.PRNGKey(0),
                            jnp.float32(0.03), chunk_size=4, size=32,
                            labels=labels, pseudo_label_fn=None)


@pytest.mark.slow
def test_defense_cli_resume_rejects_label_mismatch(eval_dataset, tmp_path,
                                                   capsys):
    """Review-r3c regression: --resume must not reuse cells computed under
    a different label source (counter semantics differ)."""
    from image_recognition_adversarial_example_attack_tpu.cli.defense_experiments import (
        main,
    )

    image_dir = eval_dataset[0].parent
    out = tmp_path / "res"
    base = ["--image_dir", str(image_dir), "--attacks", "fgsm",
            "--eps_list", "0.03137", "--steps", "1",
            "--model", "resnet_tiny", "--viz_samples", "0",
            "--detector_threshold", "2.0", "--output_dir", str(out)]
    assert main(base) == 0
    capsys.readouterr()
    # same cells, now with ground-truth labels: must RECOMPUTE
    lbl = tmp_path / "labels.json"
    lbl.write_text(json.dumps({eval_dataset[0].name: 3}))
    assert main(base + ["--resume", "--labels_json", str(lbl)]) == 0
    text = capsys.readouterr().out
    assert "(resumed from partial results)" not in text
    # and with the SAME label source (the run-2 cells) it does resume
    assert main(base + ["--resume", "--labels_json", str(lbl)]) == 0
    assert "(resumed from partial results)" in capsys.readouterr().out


@pytest.mark.slow
def test_labels_json_out_of_range_rejected(eval_dataset, tmp_path):
    """Review-r3d regression: out-of-range class ids silently corrupted
    every counter (one_hot of an invalid id is all-zeros); the CLIs now
    fail loud."""
    from image_recognition_adversarial_example_attack_tpu.cli.defense_experiments import (
        main as def_main,
    )
    from image_recognition_adversarial_example_attack_tpu.cli.robust_eval import (
        main as rob_main,
    )

    image_dir = eval_dataset[0].parent
    lbl = tmp_path / "labels.json"
    lbl.write_text(json.dumps({eval_dataset[0].name: 999}))
    with pytest.raises(SystemExit, match="out-of-range"):
        def_main(["--image_dir", str(image_dir), "--attacks", "fgsm",
                  "--eps_list", "0.03", "--steps", "1",
                  "--model", "resnet_tiny", "--viz_samples", "0",
                  "--detector_threshold", "2.0",
                  "--labels_json", str(lbl),
                  "--output_dir", str(tmp_path / "o")])
    with pytest.raises(SystemExit, match="out-of-range"):
        rob_main(["--image_dir", str(image_dir), "--model", "resnet_tiny",
                  "--eps_list", "0.03", "--apgd_steps", "1",
                  "--square_steps", "1", "--deepfool_steps", "1",
                  "--labels_json", str(lbl),
                  "--output", str(tmp_path / "r.json")])


class TestStreamableDecompositions:
    """The per-sample decompositions the round-4 streamed CLIs rely on
    (VERDICT r3 next #3) reproduce the one-batch scalar statistics."""

    def test_ece_from_conf_correct_matches_full(self):
        from image_recognition_adversarial_example_attack_tpu.eval.metrics import (
            ece_from_conf_correct,
            expected_calibration_error,
        )

        rng = np.random.RandomState(3)
        logits = jnp.asarray(rng.randn(64, 10).astype(np.float32))
        probs = jax.nn.softmax(logits, -1)
        labels = jnp.asarray(rng.randint(0, 10, 64))
        full = float(expected_calibration_error(probs, labels))
        conf = jnp.max(probs, -1)
        correct = (jnp.argmax(probs, -1) == labels).astype(jnp.float32)
        # whole-vector call is exact; concatenated chunk vectors too
        assert float(ece_from_conf_correct(conf, correct)) == pytest.approx(
            full, abs=1e-7)
        cat_c = jnp.concatenate([conf[:20], conf[20:50], conf[50:]])
        cat_k = jnp.concatenate([correct[:20], correct[20:50], correct[50:]])
        assert float(ece_from_conf_correct(cat_c, cat_k)) == pytest.approx(
            full, abs=1e-7)

    def test_ssim_per_sample_mean_matches_global(self):
        from image_recognition_adversarial_example_attack_tpu.eval.metrics import (
            ssim,
            ssim_per_sample,
        )

        rng = np.random.RandomState(4)
        a = jnp.asarray(rng.rand(6, 24, 24, 3).astype(np.float32))
        b = jnp.clip(a + 0.05 * jnp.asarray(
            rng.randn(6, 24, 24, 3).astype(np.float32)), 0, 1)
        per = ssim_per_sample(a, b)
        assert per.shape == (6,)
        assert float(jnp.mean(per)) == pytest.approx(float(ssim(a, b)),
                                                     abs=1e-5)

    def test_stream_query_curve_hist_decomposition(self, eval_dataset):
        """Chunked ever-count/first-step reductions over a deterministic
        fake history == the one-batch numpy reductions on the full
        history (the exact statistics assemble_curve consumes)."""
        from image_recognition_adversarial_example_attack_tpu.core.images import (
            load_image_batch_tolerant,
        )
        from image_recognition_adversarial_example_attack_tpu.eval.streaming import (
            stream_query_curve_hist,
        )

        steps = 7

        def run_fn(x, y, key):  # key-free: per-sample brightness staircase
            m = jnp.mean(x, axis=(1, 2, 3))                       # [B]
            thresh = jnp.linspace(0.9, 0.1, steps)[:, None]       # [S,1]
            return x, m[None, :] > thresh                         # [S,B]

        pseudo_fn = lambda xx: jnp.zeros(xx.shape[0], jnp.int32)  # noqa: E731
        got = stream_query_curve_hist(
            run_fn, steps, eval_dataset, jax.random.PRNGKey(0),
            chunk_size=4, size=32, pseudo_label_fn=pseudo_fn)

        x_all, _ = load_image_batch_tolerant(eval_dataset, size=32)
        _, hist = run_fn(jnp.asarray(x_all), None, None)
        hist = np.asarray(hist)
        ever = np.maximum.accumulate(hist, axis=0)
        np.testing.assert_array_equal(got["ever_count"], ever.sum(axis=1))
        np.testing.assert_array_equal(
            got["first"], np.where(ever.any(axis=0), ever.argmax(axis=0), -1))
        assert got["count"] == len(eval_dataset)


@pytest.mark.slow
def test_attack_suite_cli_streams(eval_dataset, tmp_path, capsys):
    """Suite table rows from the streamed path match the one-batch path
    for a deterministic attack (fgsm) — same compiled program, metrics
    re-formed from per-sample vectors."""
    from image_recognition_adversarial_example_attack_tpu.cli.attack_suite import (
        main,
    )

    image_dir = eval_dataset[0].parent
    outs = {}
    for mb in (4, 0):
        out = tmp_path / f"suite_{mb}.json"
        rc = main(["--image_dir", str(image_dir), "--model", "resnet_tiny",
                   "--attacks", "fgsm", "--steps", "2",
                   "--max_batch", str(mb), "--output", str(out)])
        assert rc == 0
        outs[mb] = json.loads(out.read_text())
    text_seen = capsys.readouterr().out
    assert "STREAMED in fixed chunks of 4" in text_seen
    assert outs[4]["streamed"] is True and outs[4]["count"] == 10
    row_s = outs[4]["results"][0]
    row_o = outs[0]["results"][0]
    for k in ("asr", "linf", "l2_mean", "changed_pct", "ssim", "psnr",
              "ece"):
        assert row_s[k] == pytest.approx(row_o[k], abs=1e-4), k
    assert outs[4]["ece_clean"] == pytest.approx(outs[0]["ece_clean"],
                                                 abs=1e-4)


@pytest.mark.slow
def test_query_curves_cli_streams(eval_dataset, tmp_path, capsys):
    from image_recognition_adversarial_example_attack_tpu.cli.query_curves import (
        main,
    )

    image_dir = eval_dataset[0].parent
    out = tmp_path / "curves.json"
    rc = main(["--image_dir", str(image_dir), "--model", "resnet_tiny",
               "--attacks", "square", "--max_queries", "20",
               "--checkpoints", "10", "20", "--max_batch", "4",
               "--output", str(out)])
    assert rc == 0
    assert "STREAMED in fixed chunks of 4" in capsys.readouterr().out
    data = json.loads(out.read_text())
    assert data["streamed"] is True and data["count"] == 10
    c = data["curves"][0]
    assert len(c["queries"]) == len(c["asr"]) == 18  # (20 - 2 init) / 1
    assert all(0.0 <= a <= 1.0 for a in c["asr"])
    assert all(a <= b + 1e-9 for a, b in zip(c["asr"], c["asr"][1:]))


@pytest.mark.slow
def test_detector_eval_cli_streams(eval_dataset, tmp_path, capsys):
    """Streamed ROC cells equal the one-batch cells for the parameter-free
    detectors under a deterministic attack: same per-sample scores, same
    full-set threshold quantiles, same rank arithmetic."""
    from image_recognition_adversarial_example_attack_tpu.cli.detector_eval import (
        main,
    )

    image_dir = eval_dataset[0].parent
    outs = {}
    for mb in (4, 0):
        out = tmp_path / f"det_{mb}.json"
        rc = main(["--image_dir", str(image_dir), "--model", "resnet_tiny",
                   "--attacks", "fgsm", "--steps", "2",
                   "--detectors", "feature", "squeezing",
                   "--max_batch", str(mb), "--output_json", str(out)])
        assert rc == 0
        outs[mb] = {(r["detector"], r["attack"]): r
                    for r in json.loads(out.read_text())}
    assert "STREAMING fixed chunks" in capsys.readouterr().out
    assert outs[4].keys() == outs[0].keys()
    for cell, r_s in outs[4].items():
        r_o = outs[0][cell]
        for k in ("auc", "tpr_at_threshold", "fpr_at_threshold",
                  "tpr_at_fpr05"):
            assert r_s[k] == pytest.approx(r_o[k], abs=1e-6), (cell, k)


@pytest.mark.slow
def test_detector_eval_cli_streams_mahalanobis(eval_dataset, tmp_path,
                                               capsys):
    """Mahalanobis in streamed mode: Gaussians fit on the first chunk,
    threshold from the full-set quantile — runs end to end with sane ROC
    output (fit set differs from the one-batch path by design)."""
    from image_recognition_adversarial_example_attack_tpu.cli.detector_eval import (
        main,
    )

    image_dir = eval_dataset[0].parent
    out = tmp_path / "det_m.json"
    rc = main(["--image_dir", str(image_dir), "--model", "resnet_tiny",
               "--attacks", "fgsm", "--steps", "2",
               "--detectors", "mahalanobis",
               "--max_batch", "4", "--output_json", str(out)])
    assert rc == 0
    capsys.readouterr()
    rows = json.loads(out.read_text())
    assert len(rows) == 1
    assert 0.0 <= rows[0]["auc"] <= 1.0
    assert 0.0 <= rows[0]["tpr_at_fpr05"] <= 1.0


@pytest.mark.slow
def test_defense_cli_resume_rejects_config_change(eval_dataset, tmp_path,
                                                  capsys):
    """Review-r3d regression: --resume must not reuse cells computed under
    a different --adaptive (or any other semantics-defining) config."""
    from image_recognition_adversarial_example_attack_tpu.cli.defense_experiments import (
        main,
    )

    image_dir = eval_dataset[0].parent
    out = tmp_path / "res"
    base = ["--image_dir", str(image_dir), "--attacks", "pgd",
            "--eps_list", "0.03137", "--steps", "1",
            "--model", "resnet_tiny", "--viz_samples", "0",
            "--detector_threshold", "2.0", "--output_dir", str(out)]
    assert main(base) == 0
    capsys.readouterr()
    # same cells, now adaptive: must RECOMPUTE (oblivious numbers would
    # otherwise be reported under the ADAPTIVE header)
    assert main(base + ["--resume", "--adaptive"]) == 0
    assert "(resumed from partial results)" not in capsys.readouterr().out
    # identical config resumes
    assert main(base + ["--resume", "--adaptive"]) == 0
    assert "(resumed from partial results)" in capsys.readouterr().out


class TestCleanForwardCache:
    """clean_cache on the streamed harnesses: the per-chunk clean forward
    runs once for a whole attack/eps loop, not once per attack (round-4
    review — stream_suite_attack had the cache, the other three didn't)."""

    def test_query_curve_hist_cache_skips_pseudo_pass(self, eval_dataset):
        from image_recognition_adversarial_example_attack_tpu.eval.streaming import (
            stream_query_curve_hist,
        )

        calls = []

        def pseudo_fn(x):
            calls.append(x.shape[0])
            return jnp.zeros((x.shape[0],), jnp.int32)

        def run_fn(x, y, key):
            hist = jnp.ones((3, x.shape[0]), jnp.int32)
            return x, hist

        cache = {}
        a = stream_query_curve_hist(run_fn, 3, eval_dataset,
                                    jax.random.PRNGKey(0), chunk_size=4,
                                    size=32, pseudo_label_fn=pseudo_fn,
                                    clean_cache=cache)
        assert len(calls) == 3  # 10 images / chunk 4 -> 3 chunks
        b = stream_query_curve_hist(run_fn, 3, eval_dataset,
                                    jax.random.PRNGKey(1), chunk_size=4,
                                    size=32, pseudo_label_fn=pseudo_fn,
                                    clean_cache=cache)
        assert len(calls) == 3  # second attack: zero new pseudo passes
        np.testing.assert_array_equal(a["ever_count"], b["ever_count"])

    def test_detector_scores_cache_halves_pred_calls(self, eval_dataset):
        from image_recognition_adversarial_example_attack_tpu.eval.streaming import (
            stream_detector_scores,
        )

        calls = []

        def pred_fn(x):
            calls.append(1)
            return jnp.zeros((x.shape[0],), jnp.int32)

        score_fns = {"s": lambda x: jnp.mean(x, axis=(1, 2, 3))}
        atk = lambda x, y, k: x
        cache = {}
        got1 = stream_detector_scores(atk, score_fns, pred_fn, eval_dataset,
                                      jax.random.PRNGKey(0), chunk_size=4,
                                      size=32, clean_cache=cache)
        n1 = len(calls)  # clean + adv per chunk = 6
        got2 = stream_detector_scores(atk, score_fns, pred_fn, eval_dataset,
                                      jax.random.PRNGKey(0), chunk_size=4,
                                      size=32, clean_cache=cache)
        assert n1 == 6 and len(calls) == 9  # warm cache: adv-only (3)
        np.testing.assert_array_equal(got1["adv"]["s"], got2["adv"]["s"])

    def test_defense_cell_cache_skips_pseudo_pass(self, eval_dataset):
        from image_recognition_adversarial_example_attack_tpu.eval.defense_eval import (
            STAT_KEYS,
        )
        from image_recognition_adversarial_example_attack_tpu.eval.streaming import (
            stream_defense_cell,
        )

        calls = []

        def pseudo_fn(x):
            calls.append(x.shape[0])
            return jnp.zeros((x.shape[0],), jnp.int32)

        def eval_fn(x, y, threshold, key, eps):
            return {k: jnp.ones((x.shape[0],), jnp.int32)
                    for k in STAT_KEYS}

        cache = {}
        a = stream_defense_cell(eval_fn, eval_dataset, 2.0,
                                jax.random.PRNGKey(0), jnp.float32(0.03),
                                chunk_size=4, size=32,
                                pseudo_label_fn=pseudo_fn,
                                clean_cache=cache)
        assert len(calls) == 3  # 10 images / chunk 4 -> 3 chunks
        b = stream_defense_cell(eval_fn, eval_dataset, 2.0,
                                jax.random.PRNGKey(1), jnp.float32(0.06),
                                chunk_size=4, size=32,
                                pseudo_label_fn=pseudo_fn,
                                clean_cache=cache)
        assert len(calls) == 3  # second grid cell: zero new clean passes
        assert a == b

    def test_defense_cell_fully_labeled_skips_clean_forward(
            self, eval_dataset):
        from image_recognition_adversarial_example_attack_tpu.eval.defense_eval import (
            STAT_KEYS,
        )
        from image_recognition_adversarial_example_attack_tpu.eval.streaming import (
            stream_defense_cell,
        )

        def pseudo_fn(x):  # pragma: no cover - must never run
            raise AssertionError("clean forward ran on fully-labeled data")

        def eval_fn(x, y, threshold, key, eps):
            return {k: jnp.ones((x.shape[0],), jnp.int32)
                    for k in STAT_KEYS}

        out = stream_defense_cell(eval_fn, eval_dataset, 2.0,
                                  jax.random.PRNGKey(0), jnp.float32(0.03),
                                  chunk_size=4, size=32,
                                  pseudo_label_fn=pseudo_fn,
                                  labels=[i % 3 for i in range(10)],
                                  clean_cache={})
        assert out["count"] == 10

    def test_cache_rejects_mismatched_chunking(self, eval_dataset):
        """A clean_cache built under one (paths, chunk_size, size) raises
        on reuse with a different chunking instead of silently serving
        stale per-chunk pseudo-labels (advisor r4)."""
        from image_recognition_adversarial_example_attack_tpu.eval.defense_eval import (
            STAT_KEYS,
        )
        from image_recognition_adversarial_example_attack_tpu.eval.streaming import (
            stream_defense_cell,
        )

        def pseudo_fn(x):
            return jnp.zeros((x.shape[0],), jnp.int32)

        def eval_fn(x, y, threshold, key, eps):
            return {k: jnp.ones((x.shape[0],), jnp.int32)
                    for k in STAT_KEYS}

        cache = {}
        stream_defense_cell(eval_fn, eval_dataset, 2.0,
                            jax.random.PRNGKey(0), jnp.float32(0.03),
                            chunk_size=4, size=32,
                            pseudo_label_fn=pseudo_fn, clean_cache=cache)
        with pytest.raises(ValueError, match="pass a fresh dict"):
            stream_defense_cell(eval_fn, eval_dataset, 2.0,
                                jax.random.PRNGKey(0), jnp.float32(0.03),
                                chunk_size=5, size=32,
                                pseudo_label_fn=pseudo_fn, clean_cache=cache)
        with pytest.raises(ValueError, match="pass a fresh dict"):
            stream_defense_cell(eval_fn, eval_dataset[:7], 2.0,
                                jax.random.PRNGKey(0), jnp.float32(0.03),
                                chunk_size=4, size=32,
                                pseudo_label_fn=pseudo_fn, clean_cache=cache)
        # same length, same chunking, DIFFERENT path order: per-chunk
        # pseudo-labels would be applied to the wrong images — must also
        # raise (r5 review: the sig originally keyed on len() only)
        with pytest.raises(ValueError, match="pass a fresh dict"):
            stream_defense_cell(eval_fn, list(reversed(eval_dataset)), 2.0,
                                jax.random.PRNGKey(0), jnp.float32(0.03),
                                chunk_size=4, size=32,
                                pseudo_label_fn=pseudo_fn, clean_cache=cache)


class TestUint8TransferPlacer:
    """ADV_TPU_TRANSFER_UINT8: uint8 host->device transfer with on-device
    float conversion (the serve-measured 2.4x trick, applied to eval
    chunk placement).  Off by default; results land on the 1/255 grid."""

    def test_default_placer_is_exact(self):
        from image_recognition_adversarial_example_attack_tpu.eval.streaming import (
            make_placer,
        )

        x = np.random.RandomState(0).rand(4, 8, 8, 3).astype(np.float32)
        got = make_placer()(x)
        assert got.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(got), x)

    def test_uint8_placer_quantizes_to_grid(self):
        from image_recognition_adversarial_example_attack_tpu.eval.streaming import (
            make_placer,
        )

        x = np.random.RandomState(1).rand(4, 8, 8, 3).astype(np.float32)
        got = np.asarray(make_placer(transfer_uint8=True)(x))
        assert got.dtype == np.float32
        assert np.max(np.abs(got - x)) <= 0.5 / 255 + 1e-7
        # exactly on the 1/255 grid
        np.testing.assert_allclose(got * 255.0, np.round(got * 255.0),
                                   atol=1e-4)
        assert got.min() >= 0.0 and got.max() <= 1.0

    def test_env_toggle(self, monkeypatch):
        from image_recognition_adversarial_example_attack_tpu.eval.streaming import (
            make_placer,
        )

        x = np.full((2, 4, 4, 3), 0.34567, np.float32)
        monkeypatch.setenv("ADV_TPU_TRANSFER_UINT8", "1")
        on = np.asarray(make_placer()(x))
        monkeypatch.setenv("ADV_TPU_TRANSFER_UINT8", "0")
        off = np.asarray(make_placer()(x))
        assert not np.array_equal(on, off)
        np.testing.assert_array_equal(off, x)

    def test_env_toggle_is_a_whitelist(self, monkeypatch):
        """'false'/'off'/'no' must NOT silently enable the lossy path
        (round-4 review: anything != ''/'0' used to switch it on)."""
        from image_recognition_adversarial_example_attack_tpu.eval.streaming import (
            make_placer,
        )

        x = np.full((2, 4, 4, 3), 0.34567, np.float32)
        for v in ("false", "off", "no", "FALSE"):
            monkeypatch.setenv("ADV_TPU_TRANSFER_UINT8", v)
            np.testing.assert_array_equal(np.asarray(make_placer()(x)), x)
        for v in ("1", "on", "true", "True"):
            monkeypatch.setenv("ADV_TPU_TRANSFER_UINT8", v)
            assert not np.array_equal(np.asarray(make_placer()(x)), x)

    def test_uint8_placer_keeps_mesh_sharding(self, monkeypatch):
        from jax.sharding import PartitionSpec as P

        from image_recognition_adversarial_example_attack_tpu.eval.streaming import (
            make_placer,
        )
        from image_recognition_adversarial_example_attack_tpu.parallel.mesh import (
            make_mesh,
        )

        mesh = make_mesh(n_data=4, n_model=2)
        x = np.random.RandomState(2).rand(8, 8, 8, 3).astype(np.float32)
        got = make_placer(mesh, transfer_uint8=True)(x)
        assert got.dtype == jnp.float32
        # the device-side convert must preserve the data sharding
        assert got.sharding.spec == P("data")
        assert np.max(np.abs(np.asarray(got) - x)) <= 0.5 / 255 + 1e-7
