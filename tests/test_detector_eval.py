"""Detector ROC harness (eval/detector_eval.py + cli/detector_eval.py):
AUC/TPR arithmetic against closed-form cases, the stacked-scoring cell,
and the CLI round trip."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_recognition_adversarial_example_attack_tpu.eval.detector_eval import (
    evaluate_detector_cell,
    roc_auc,
    summary_table,
    tpr_at_fpr,
)


class TestROCMath:
    def test_perfect_separation(self):
        assert roc_auc(np.r_[0.0, 1.0, 2.0], np.r_[3.0, 4.0]) == 1.0
        assert roc_auc(np.r_[3.0, 4.0], np.r_[0.0, 1.0]) == 0.0

    def test_random_scores_near_half(self):
        rng = np.random.RandomState(0)
        a = rng.randn(2000)
        b = rng.randn(2000)
        assert abs(roc_auc(a, b) - 0.5) < 0.05

    def test_ties_count_half(self):
        # all scores identical: AUC must be exactly 0.5
        assert roc_auc(np.ones(10), np.ones(7)) == 0.5

    def test_matches_sklearn_formula_on_known_case(self):
        """Hand-computed: neg=[1,2], pos=[2,3] -> pairs (1,2)+,(1,3)+,
        (2,2)=tie half,(2,3)+ => 3.5/4."""
        assert roc_auc(np.r_[1.0, 2.0], np.r_[2.0, 3.0]) == pytest.approx(
            3.5 / 4)

    def test_empty_rejected(self):
        with pytest.raises(ValueError):
            roc_auc(np.r_[1.0], np.asarray([]))

    def test_tpr_at_fpr_semantics(self):
        """Clean = 0..99; at 5% FPR the threshold is the 95th clean value,
        so positives must exceed ~94 to count."""
        neg = np.arange(100, dtype=np.float64)
        pos = np.full(50, 97.5)
        assert tpr_at_fpr(neg, pos, 0.05) == 1.0
        pos_low = np.full(50, 50.0)
        assert tpr_at_fpr(neg, pos_low, 0.05) == 0.0
        # and the threshold actually bounds the FPR
        thr_idx = int(np.ceil(0.95 * 100)) - 1
        assert np.mean(neg > neg[thr_idx]) <= 0.05


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("det_imgs")
    rng = np.random.RandomState(0)
    for i in range(3):
        arr = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"img_{i}.jpg")
    return d


class TestCellAndCLI:
    def test_cell_stacked_scoring(self):
        """The cell scores clean+adv in one call and computes coherent
        numbers for a score function with known separation."""
        x = jnp.zeros((8, 4, 4, 3))
        x_adv = jnp.ones((8, 4, 4, 3))

        def score_fn(xx):
            return jnp.mean(xx, axis=(1, 2, 3))  # clean->0, adv->1

        r = evaluate_detector_cell(score_fn, x, x_adv, threshold=0.5,
                                   detector="toy", attack="fgsm")
        assert r.auc == 1.0
        assert r.tpr_at_threshold == 1.0
        assert r.fpr_at_threshold == 0.0
        assert r.tpr_at_fpr05 == 1.0
        table = summary_table([r])
        assert "toy" in table and "fgsm" in table

    @pytest.mark.slow
    def test_cli_round_trip(self, image_dir, tmp_path, capsys):
        from image_recognition_adversarial_example_attack_tpu.cli.detector_eval import (
            main,
        )

        out = tmp_path / "det.json"
        rc = main(["--image_dir", str(image_dir), "--attacks", "fgsm",
                   "--eps", "0.1", "--model", "resnet_tiny",
                   "--detectors", "feature", "mahalanobis",
                   "--output_json", str(out)])
        assert rc == 0
        txt = capsys.readouterr().out
        assert "DETECTOR COMPARISON" in txt
        data = json.loads(out.read_text())
        assert len(data) == 2
        for row in data:
            assert 0.0 <= row["auc"] <= 1.0
            assert row["attack"] == "fgsm"

    @pytest.mark.slow
    def test_streamed_calibration_skips_corrupt_first_chunk(self, tmp_path,
                                                            capsys):
        """Streamed mode with the FIRST chunk entirely unreadable: the
        Mahalanobis/clean calibration set scans forward to the first
        decodable chunk instead of crashing (round-4 review — the
        tolerant loader raises ValueError on an all-corrupt batch)."""
        from PIL import Image as PILImage

        from image_recognition_adversarial_example_attack_tpu.cli.detector_eval import (
            main,
        )

        d = tmp_path / "imgs"
        d.mkdir()
        rng = np.random.RandomState(3)
        for i in range(4):  # '_' sorts before letters: these lead
            (d / f"_bad_{i}.jpg").write_text("not an image")
        for i in range(6):
            PILImage.fromarray(
                (rng.rand(40, 40, 3) * 255).astype(np.uint8)
            ).save(d / f"img_{i}.jpg")
        out = tmp_path / "det.json"
        rc = main(["--image_dir", str(d), "--attacks", "fgsm",
                   "--eps", "0.1", "--steps", "2", "--model", "resnet_tiny",
                   "--detectors", "feature", "mahalanobis",
                   "--max_batch", "4", "--output_json", str(out)])
        assert rc == 0
        txt = capsys.readouterr().out
        assert "STREAMING fixed chunks" in txt
        data = json.loads(out.read_text())
        assert {r["detector"] for r in data} == {"feature", "mahalanobis"}
        for row in data:
            assert 0.0 <= row["auc"] <= 1.0

    @pytest.mark.slow
    def test_streamed_calibration_chunk_is_last_chunk(self, tmp_path,
                                                      capsys):
        """Round-4 review F1: when the first DECODABLE chunk is also the
        LAST chunk (every earlier file corrupt), nothing remains to
        stream — the empty-tail guard must score the calibration chunk
        instead of crashing on EvalBatchPipeline([])."""
        from PIL import Image as PILImage

        from image_recognition_adversarial_example_attack_tpu.cli.detector_eval import (
            main,
        )

        d = tmp_path / "imgs"
        d.mkdir()
        rng = np.random.RandomState(5)
        for i in range(4):  # '_' sorts before letters: these lead
            (d / f"_bad_{i}.jpg").write_text("not an image")
        for i in range(4):  # exactly one decodable chunk, and it's last
            PILImage.fromarray(
                (rng.rand(40, 40, 3) * 255).astype(np.uint8)
            ).save(d / f"img_{i}.jpg")
        out = tmp_path / "det.json"
        rc = main(["--image_dir", str(d), "--attacks", "fgsm",
                   "--eps", "0.1", "--steps", "2", "--model", "resnet_tiny",
                   "--detectors", "feature",
                   "--max_batch", "4", "--output_json", str(out)])
        assert rc == 0
        data = json.loads(out.read_text())
        assert {r["detector"] for r in data} == {"feature"}
        for row in data:
            assert 0.0 <= row["auc"] <= 1.0
