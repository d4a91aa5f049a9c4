"""CLI smoke tests: every surface runs end-to-end with tiny models on CPU.

These call each CLI's ``main(argv)`` in-process (same argparse path as the
root shims) against generated images, asserting output artifacts and
console formats — the reference's golden-transcript style of verification
(SURVEY.md §4) at miniature scale.
"""

import json
import re
from pathlib import Path

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    for i in range(3):
        arr = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"img_{i}.jpg")
    return d


@pytest.mark.slow
def test_classify_cli(image_dir, capsys):
    from image_recognition_adversarial_example_attack_tpu.cli.classify import main

    adv_path = image_dir / "out" / "adv.png"
    rc = main([str(image_dir / "img_0.jpg"), "--attack", "pgd", "--steps", "2",
               "--model", "resnet_tiny", "--save_adv", str(adv_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Clean:" in out and "Adversarial (pgd):" in out
    assert re.search(r"Top 1: .* \(class \d+\), prob = 0\.\d{4}", out)
    assert adv_path.is_file()


@pytest.mark.slow
def test_classify_cli_directory_mode(image_dir, capsys):
    from image_recognition_adversarial_example_attack_tpu.cli.classify import main

    rc = main([str(image_dir), "--model", "resnet_tiny"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("Image: ") == 3


@pytest.mark.slow
def test_defense_experiments_cli(image_dir, tmp_path, capsys):
    from image_recognition_adversarial_example_attack_tpu.cli.defense_experiments import main

    out_dir = tmp_path / "defres"
    rc = main(["--image_dir", str(image_dir), "--attacks", "fgsm", "pgd",
               "--eps_list", "0.03137", "--steps", "2", "--cw_steps", "4",
               "--model", "resnet_tiny", "--viz_samples", "2",
               "--output_dir", str(out_dir)])
    assert rc == 0
    out = capsys.readouterr().out
    # the exact 6-field summary-line format (reference README.md:48-55)
    assert re.search(
        r"attack=fgsm, eps=0\.03137, attack_success=\d\.\d{3}, "
        r"preproc_defense_acc=\d\.\d{3}, detector_clean_pass_rate=\d\.\d{3}, "
        r"detector_adv_flag_rate=\d\.\d{3}, detector_attack_success=\d\.\d{3}",
        out,
    )
    assert (out_dir / "results_partial.json").is_file()
    assert (out_dir / "defense_results_attack_trend.png").is_file()
    assert (out_dir / "defense_results_defense_matrix.png").is_file()
    assert (out_dir / "attack_samples.png").is_file()

    # resume path: second run must reuse the finished cells
    rc = main(["--image_dir", str(image_dir), "--attacks", "fgsm",
               "--eps_list", "0.03137", "--steps", "2",
               "--model", "resnet_tiny", "--viz_samples", "0",
               "--output_dir", str(out_dir), "--resume"])
    assert rc == 0
    assert "(resumed from partial results)" in capsys.readouterr().out

    # grid-position independence: a FRESH run of a narrower grid must
    # reproduce the cells the wide grid computed — this is what makes
    # resuming them under the scoped fingerprint sound (common.cell_key
    # derives each cell's PRNG key from the cell id, not the walk order)
    fresh_dir = tmp_path / "defres_fresh"
    rc = main(["--image_dir", str(image_dir), "--attacks", "pgd",
               "--eps_list", "0.03137", "--steps", "2",
               "--model", "resnet_tiny", "--viz_samples", "0",
               "--output_dir", str(fresh_dir)])
    assert rc == 0
    capsys.readouterr()
    wide = json.loads((out_dir / "results_partial.json").read_text())
    narrow = json.loads((fresh_dir / "results_partial.json").read_text())
    assert narrow["pgd:0.031370"] == wide["pgd:0.031370"]


@pytest.mark.slow
def test_blackbox_transfer_cli(image_dir, capsys):
    from image_recognition_adversarial_example_attack_tpu.cli.blackbox_transfer import main

    rc = main(["--image_dir", str(image_dir), "--attacks", "fgsm",
               "--source", "resnet_tiny", "--targets", "tiny",
               "--visualize_n", "1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Attack/Model\ttiny" in out
    assert re.search(r"FGSM\t\d+\.\d%", out)


@pytest.mark.slow
def test_transferability_cli(image_dir, tmp_path, capsys):
    from image_recognition_adversarial_example_attack_tpu.cli.transferability import main

    out_dir = tmp_path / "transres"
    rc = main(["--source_model", "resnet_tiny", "--target_models", "tiny",
               "--image_dir", str(image_dir), "--attacks", "pgd",
               "--eps_list", "0.03137", "--steps", "2",
               "--output_dir", str(out_dir)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "TRANSFERABILITY SUMMARY" in out
    data = json.loads((out_dir / "transfer_results.json").read_text())
    assert "pgd" in data and "0.03137" in str(data["pgd"].keys()) or data["pgd"]
    assert (out_dir / "transfer_heatmap_pgd.png").is_file()


@pytest.mark.slow
def test_visualize_cli(image_dir, tmp_path, capsys):
    from image_recognition_adversarial_example_attack_tpu.cli.visualize import main

    out_dir = tmp_path / "vizres"
    rc = main(["--image", str(image_dir / "img_0.jpg"), "--model", "resnet_tiny",
               "--steps", "3", "--cw_steps", "4", "--save_images", "--gradcam",
               "--landscape", "--landscape_grid", "5",
               "--output_dir", str(out_dir)])
    assert rc == 0
    for f in ("attack_comparison.png", "attack_trajectory.png",
              "perturbation_analysis.png", "attack_report.json",
              "gradcam_attack.png", "loss_landscape.png"):
        assert (out_dir / f).is_file(), f
    report = json.loads((out_dir / "attack_report.json").read_text())
    # the reference crashed on a pred_adj typo here; assert the fixed schema
    for attack in ("fgsm", "pgd", "cw"):
        assert "predicted_class" in report["attacks"][attack]
        assert "metrics" in report["attacks"][attack]
        assert 0.0 <= report["attacks"][attack]["gradcam_iou"] <= 1.0
    assert (out_dir / "adversarial_images" / "adv_cw.png").is_file()


@pytest.mark.slow
def test_dataset_check_cli(image_dir, capsys):
    from image_recognition_adversarial_example_attack_tpu.cli.dataset_check import main

    rc = main(["--test_dir", str(image_dir), "--model", "resnet_tiny"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Total images: 3" in out
    assert "Low-confidence ratio" in out


@pytest.mark.slow
def test_defense_experiments_jpeg_and_robust(image_dir, tmp_path, capsys):
    """--use_jpeg routes through the io_callback path; --model_type robust
    falls back to random init (no weights here) with identity normalization."""
    import pytest

    from image_recognition_adversarial_example_attack_tpu.cli.defense_experiments import main

    out_dir = tmp_path / "jpegres"
    with pytest.warns(UserWarning, match="no weights found"):
        rc = main(["--image_dir", str(image_dir), "--attacks", "fgsm",
                   "--eps_list", "0.03137", "--steps", "2",
                   "--model_type", "robust", "--use_jpeg", "--jpeg_quality", "60",
                   "--viz_samples", "0", "--output_dir", str(out_dir)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "attack=fgsm" in out


@pytest.mark.slow
def test_defense_experiments_tv_arm(image_dir, tmp_path, capsys):
    """--use_tv prepends the TV-minimization reconstruction to the cell
    program; the knobs reach DefenseConfig and the summary still prints."""
    from image_recognition_adversarial_example_attack_tpu.cli.defense_experiments import main

    rc = main(["--image_dir", str(image_dir), "--attacks", "fgsm",
               "--eps_list", "0.03137", "--steps", "2", "--model", "resnet_tiny",
               "--use_tv", "--tv_steps", "5", "--tv_weight", "0.05",
               "--viz_samples", "0", "--output_dir", str(tmp_path / "tvres")])
    assert rc == 0
    assert "attack=fgsm" in capsys.readouterr().out


@pytest.mark.slow
def test_defense_experiments_mahalanobis_detector(image_dir, tmp_path, capsys):
    """--detector mahalanobis fits the Gaussian state on the calibration
    images and flags inside the fused cell program."""
    from image_recognition_adversarial_example_attack_tpu.cli.defense_experiments import main

    rc = main(["--image_dir", str(image_dir), "--attacks", "fgsm",
               "--eps_list", "0.03137", "--steps", "2", "--model", "resnet_tiny",
               "--detector", "mahalanobis",
               "--viz_samples", "0", "--output_dir", str(tmp_path / "mahal")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Fitting Mahalanobis detector" in out
    assert "attack=fgsm" in out


def test_cell_rng_id_eps_free_for_eps_independent():
    """RNG-consuming eps-independent attacks (boundary/simba) must draw
    from an eps-FREE cell id, or the one cached cell could never agree
    with a fresh run of a different eps subset."""
    from image_recognition_adversarial_example_attack_tpu.cli.common import (
        EPS_INDEPENDENT_ATTACKS,
        cell_rng_id,
    )

    for name in EPS_INDEPENDENT_ATTACKS:
        assert cell_rng_id(name, 0.01) == cell_rng_id(name, 0.1)
    assert cell_rng_id("pgd", 0.01) != cell_rng_id("pgd", 0.1)
    assert cell_rng_id("pgd", 0.01) != cell_rng_id("fgsm", 0.01)


@pytest.mark.slow
def test_classify_targeted_cw(image_dir, capsys):
    from image_recognition_adversarial_example_attack_tpu.cli.classify import main

    rc = main([str(image_dir / "img_0.jpg"), "--attack", "cw", "--cw_steps", "5",
               "--target", "3", "--model", "resnet_tiny"])
    assert rc == 0
    assert "Adversarial (cw):" in capsys.readouterr().out


@pytest.mark.slow
def test_defense_experiments_calibrate_dir_and_threshold(image_dir, tmp_path, capsys):
    """--calibrate_dir calibrates on a separate directory; --detector_threshold
    bypasses calibration entirely."""
    from image_recognition_adversarial_example_attack_tpu.cli.defense_experiments import main

    rc = main(["--image_dir", str(image_dir), "--attacks", "fgsm",
               "--eps_list", "0.03137", "--steps", "2", "--model", "resnet_tiny",
               "--calibrate_dir", str(image_dir), "--calibrate_n", "2",
               "--viz_samples", "0", "--output_dir", str(tmp_path / "c1")])
    assert rc == 0
    assert "Using calibrated threshold:" in capsys.readouterr().out

    rc = main(["--image_dir", str(image_dir), "--attacks", "fgsm",
               "--eps_list", "0.03137", "--steps", "2", "--model", "resnet_tiny",
               "--detector_threshold", "2.5",
               "--viz_samples", "0", "--output_dir", str(tmp_path / "c2")])
    assert rc == 0
    assert "Using specified threshold: 2.5000" in capsys.readouterr().out


@pytest.mark.slow
def test_defense_experiments_mifgsm_grid(image_dir, tmp_path, capsys):
    """The beyond-reference attack flows through the full defense grid."""
    from image_recognition_adversarial_example_attack_tpu.cli.defense_experiments import main

    rc = main(["--image_dir", str(image_dir), "--attacks", "mifgsm",
               "--eps_list", "0.03137", "--steps", "2", "--model", "resnet_tiny",
               "--viz_samples", "0", "--output_dir", str(tmp_path / "mif")])
    assert rc == 0
    assert "attack=mifgsm" in capsys.readouterr().out


@pytest.mark.slow
def test_classify_skips_corrupt_image(image_dir, tmp_path, capsys):
    """Directory mode survives an unreadable file (the reference crashes)."""
    import shutil

    from image_recognition_adversarial_example_attack_tpu.cli.classify import main

    d = tmp_path / "mixed"
    d.mkdir()
    shutil.copy(image_dir / "img_0.jpg", d / "good.jpg")
    (d / "corrupt.jpg").write_bytes(b"not a jpeg at all")
    rc = main([str(d), "--model", "resnet_tiny"])
    assert rc == 0
    cap = capsys.readouterr()
    # diagnostics go to stderr (stdout may be a data/protocol stream)
    assert "WARNING: skipping unreadable image" in cap.err
    assert cap.out.count("Image: ") == 1


@pytest.mark.slow
def test_adversarial_train_cli(tmp_path, capsys):
    """PGD-AT fine-tuning CLI: trains on a subdir-per-class dataset and
    saves a zoo-loadable msgpack checkpoint."""
    from image_recognition_adversarial_example_attack_tpu.cli.adversarial_train import (
        main,
    )

    rng = np.random.RandomState(0)
    for name, base in (("class_a", 0.25), ("class_b", 0.75)):
        d = tmp_path / "data" / name
        d.mkdir(parents=True)
        for i in range(4):
            arr = np.clip(base + rng.uniform(-0.08, 0.08, (32, 32, 3)), 0, 1)
            Image.fromarray((arr * 255).astype(np.uint8)).save(d / f"im{i}.jpg")

    out = tmp_path / "at.msgpack"
    rc = main(["--data_dir", str(tmp_path / "data"), "--model", "resnet_tiny",
               "--epochs", "2", "--batch_size", "4", "--lr", "5e-3",
               "--attack_steps", "2", "--out", str(out)])
    assert rc == 0
    assert out.is_file()
    text = capsys.readouterr().out
    assert "Dataset: 8 images, 2 classes" in text
    assert "Saved adversarially fine-tuned checkpoint" in text

    from image_recognition_adversarial_example_attack_tpu.models.zoo import load_model

    bundle = load_model("resnet_tiny", weights=out)
    assert bundle.source == "cache"


@pytest.mark.slow
def test_adversarial_train_cli_grad_accum_clamp(tmp_path, capsys):
    """--grad_accum larger than the batch: the CLI must clamp it, re-jit the
    step under the clamped config, and still train + save (this is the only
    place the clamp/re-jit path runs).  --grad_accum 0 is rejected at parse
    time rather than silently clamped."""
    from image_recognition_adversarial_example_attack_tpu.cli.adversarial_train import (
        main,
    )

    rng = np.random.RandomState(1)
    for name, base in (("class_a", 0.25), ("class_b", 0.75)):
        d = tmp_path / "data" / name
        d.mkdir(parents=True)
        for i in range(3):
            arr = np.clip(base + rng.uniform(-0.08, 0.08, (32, 32, 3)), 0, 1)
            Image.fromarray((arr * 255).astype(np.uint8)).save(d / f"im{i}.jpg")

    out = tmp_path / "clamp.msgpack"
    rc = main(["--data_dir", str(tmp_path / "data"), "--model", "resnet_tiny",
               "--epochs", "1", "--batch_size", "4", "--attack_steps", "1",
               "--grad_accum", "8", "--out", str(out)])
    assert rc == 0
    text = capsys.readouterr().out
    assert "grad_accum clamped to 4 (batch is only 4)" in text
    assert out.is_file()

    with pytest.raises(SystemExit):
        main(["--data_dir", str(tmp_path / "data"), "--model", "resnet_tiny",
              "--grad_accum", "0", "--out", str(out)])
    assert "positive integer" in capsys.readouterr().err


@pytest.mark.slow
def test_defense_experiments_new_attacks_and_squeezing_detector(image_dir, tmp_path, capsys):
    """The extended attack family (deepfool/nes) + the squeezing detector
    run through the full grid harness with the same summary-line format."""
    from image_recognition_adversarial_example_attack_tpu.cli.defense_experiments import main

    out_dir = tmp_path / "defres_ext"
    rc = main(["--image_dir", str(image_dir), "--attacks", "deepfool", "nes",
               "--eps_list", "0.03137", "--steps", "2", "--est_samples", "2",
               "--deepfool_steps", "3", "--model", "resnet_tiny",
               "--detector", "squeezing", "--viz_samples", "0",
               "--output_dir", str(out_dir)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Calibrating squeezing detector" in out
    for name in ("deepfool", "nes"):
        assert re.search(
            rf"attack={name}, eps=0\.03137, attack_success=\d\.\d{{3}}, "
            rf"preproc_defense_acc=\d\.\d{{3}}, detector_clean_pass_rate=\d\.\d{{3}}, "
            rf"detector_adv_flag_rate=\d\.\d{{3}}, detector_attack_success=\d\.\d{{3}}",
            out,
        )


@pytest.mark.slow
def test_certify_cli_sigma_sweep_and_plot(image_dir, capsys, tmp_path):
    from image_recognition_adversarial_example_attack_tpu.cli.certify import main

    out = tmp_path / "cert.json"
    fig = tmp_path / "cert_acc.png"
    rc = main(["--image", str(image_dir / "img_0.jpg"), "--model", "resnet_tiny",
               "--n0", "8", "--n", "16", "--chunk", "8",
               "--sigmas", "0.12", "0.25", "--plot", str(fig),
               "--output", str(out)])
    assert rc == 0
    text = capsys.readouterr().out
    assert text.count("certified_radius=") == 2  # one line per sigma
    assert out.is_file() and fig.is_file()
    data = json.loads(out.read_text())
    assert [s["sigma"] for s in data["sweeps"]] == [0.12, 0.25]


@pytest.mark.slow
def test_robust_eval_cli(image_dir, tmp_path, capsys):
    from image_recognition_adversarial_example_attack_tpu.cli.robust_eval import main

    out = tmp_path / "robust.json"
    fig = tmp_path / "robust_acc.png"
    rc = main(["--image_dir", str(image_dir), "--model", "resnet_tiny",
               "--eps_list", "0.01569", "0.03137", "--apgd_steps", "3",
               "--square_steps", "5", "--deepfool_steps", "3",
               "--plot", str(fig), "--output", str(out)])
    assert rc == 0
    text = capsys.readouterr().out
    assert text.count("robust_acc=") == 2
    data = json.loads(out.read_text())
    assert len(data["results"]) == 2
    for row in data["results"]:
        assert 0.0 <= row["robust_accuracy"] <= 1.0
        assert row["count"] == 3
    assert fig.is_file()


@pytest.mark.slow
def test_serve_cli_file_mode(image_dir, tmp_path):
    """Serving surface: warm compile once, then one JSON line per request
    with per-request error isolation and detector/defense fields."""
    import subprocess
    import sys as _sys

    req = tmp_path / "requests.txt"
    req.write_text(f"{image_dir / 'img_0.jpg'}\n{image_dir / 'img_1.jpg'}\n"
                   f"{tmp_path / 'missing.jpg'}\n")
    env = {"ADV_TPU_PLATFORM": "cpu", "PATH": "/usr/bin:/bin",
           "HOME": "/root"}
    proc = subprocess.run(
        [_sys.executable, "-m",
         "image_recognition_adversarial_example_attack_tpu.cli.serve",
         "--model", "resnet_tiny", "--batch", "2", "--defend",
         "--detector", "squeezing", "--detector_threshold", "0.5",
         "--input", str(req)],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(Path(__file__).resolve().parent.parent),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [json.loads(ln) for ln in proc.stdout.splitlines()]
    assert lines[0]["ready"] is True and lines[0]["batch"] == 2
    ok = [ln for ln in lines[1:] if "error" not in ln]
    bad = [ln for ln in lines[1:] if "error" in ln]
    assert len(ok) == 2 and len(bad) == 1
    for ln in ok:
        assert 0.0 <= ln["prob"] <= 1.0 and len(ln["topk"]) == 5
        assert "defended_top1" in ln and "detector_flag" in ln
        assert ln["latency_ms"] > 0
    assert "missing.jpg" in bad[0]["path"]


@pytest.mark.slow
def test_serve_cli_sharded_virtual_mesh(image_dir, tmp_path):
    """--sharded on an 8-virtual-device CPU mesh: batch rounds up to the
    device count and the JSON protocol stays clean."""
    import subprocess
    import sys as _sys

    req = tmp_path / "requests.txt"
    req.write_text(f"{image_dir / 'img_0.jpg'}\n{image_dir / 'img_1.jpg'}\n")
    env = {"ADV_TPU_PLATFORM": "cpu", "PATH": "/usr/bin:/bin", "HOME": "/root",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    proc = subprocess.run(
        [_sys.executable, "-m",
         "image_recognition_adversarial_example_attack_tpu.cli.serve",
         "--model", "resnet_tiny", "--batch", "6", "--sharded",
         "--input", str(req)],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(Path(__file__).resolve().parent.parent),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [json.loads(ln) for ln in proc.stdout.splitlines()]
    assert lines[0]["sharded"] is True
    assert lines[0]["devices"] == 8
    assert lines[0]["batch"] == 8  # rounded up from 6
    assert len(lines) == 3 and all("top1" in ln for ln in lines[1:])


@pytest.mark.slow
def test_serve_cli_overlap_stream_equivalent(image_dir, tmp_path):
    """--overlap (double-buffered drain/decode/transfer pipeline, VERDICT
    r4 #4) serves a bursty stdin stream with the SAME responses, order and
    error isolation as the sequential path."""
    import subprocess
    import sys as _sys

    reqs = "".join(
        f"{image_dir / f'img_{i % 3}.jpg'}\n" for i in range(7)
    ) + f"{tmp_path / 'missing.jpg'}\n"
    env = {"ADV_TPU_PLATFORM": "cpu", "PATH": "/usr/bin:/bin",
           "HOME": "/root"}
    outs = {}
    for mode in ("seq", "overlap"):
        cmd = [_sys.executable, "-m",
               "image_recognition_adversarial_example_attack_tpu.cli.serve",
               "--model", "resnet_tiny", "--batch", "4", "--max_wait_ms", "50"]
        if mode == "overlap":
            cmd.append("--overlap")
        proc = subprocess.run(
            cmd, input=reqs, capture_output=True, text=True, timeout=600,
            env=env, cwd=str(Path(__file__).resolve().parent.parent),
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        lines = [json.loads(ln) for ln in proc.stdout.splitlines()]
        assert lines[0]["ready"] is True
        outs[mode] = lines[1:]
    assert len(outs["seq"]) == len(outs["overlap"]) == 8
    for a, b in zip(outs["seq"], outs["overlap"]):
        assert a["path"] == b["path"]  # response order preserved
        if "error" in a:
            assert "error" in b
        else:
            assert a["top1"] == b["top1"]
            assert a["topk"] == b["topk"]
            assert b["latency_ms"] > 0 and b["batch_size"] == 4


def test_serve_overlap_producer_error_propagates(image_dir, tmp_path,
                                                 monkeypatch, capsys):
    """A producer-thread exception in --overlap mode must reach the
    consumer and terminate the service (not hang q.get() forever — the
    sequential path surfaces the same error inline)."""
    import threading

    from image_recognition_adversarial_example_attack_tpu.cli import serve

    def boom(paths, size):
        raise RuntimeError("decode thread died")

    monkeypatch.setattr(serve, "_decode_drain", boom)
    reqfile = tmp_path / "reqs.txt"
    reqfile.write_text(f"{image_dir / 'img_0.jpg'}\n")

    holder: dict = {}

    def run():
        try:
            serve.main(["--model", "resnet_tiny", "--batch", "2",
                        "--overlap", "--input", str(reqfile)])
        except BaseException as e:  # noqa: BLE001 — recording for assert
            holder["exc"] = e

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=300.0)
    assert not t.is_alive(), "--overlap hung after producer death"
    assert isinstance(holder.get("exc"), RuntimeError)
    assert "decode thread died" in str(holder["exc"])


def test_labels_json_resolution(tmp_path):
    """resolve_labels: path match, basename match, partial fallback."""
    import numpy as np

    from image_recognition_adversarial_example_attack_tpu.cli.common import (
        resolve_labels,
    )

    paths = [tmp_path / "a.jpg", tmp_path / "b.jpg", tmp_path / "c.jpg"]
    pseudo = np.asarray([10, 11, 12], np.int64)
    lbl = tmp_path / "labels.json"
    lbl.write_text(json.dumps({str(paths[0]): 1, "b.jpg": 2}))
    out = resolve_labels(str(lbl), paths, pseudo)
    assert out.tolist() == [1, 2, 12]  # path, basename, pseudo fallback
    # no file -> pseudo untouched
    assert resolve_labels(None, paths, pseudo).tolist() == [10, 11, 12]


@pytest.mark.slow
def test_robust_eval_cli_with_ground_truth_labels(image_dir, tmp_path, capsys):
    """Ground-truth labels change clean_correct and therefore the robust
    accuracy denominator (the standard protocol's clean-correct subset)."""
    from image_recognition_adversarial_example_attack_tpu.cli.robust_eval import main

    # intentionally wrong IN-RANGE labels (pseudo+1 mod classes): clean
    # accuracy vs ground truth exactly 0 (out-of-range ids are rejected)
    import jax
    import jax.numpy as jnp

    from image_recognition_adversarial_example_attack_tpu.attacks import (
        make_logits_fn,
    )
    from image_recognition_adversarial_example_attack_tpu.core.images import (
        list_images,
        load_image_batch,
    )
    from image_recognition_adversarial_example_attack_tpu.models.zoo import (
        load_model,
    )

    paths = list_images(image_dir)
    b = load_model("resnet_tiny")
    lf = make_logits_fn(b.module, b.variables, b.mean, b.std)
    preds = np.asarray(jax.jit(lambda x: jnp.argmax(lf(x), -1))(
        jnp.asarray(load_image_batch(paths))))
    lbl = tmp_path / "labels.json"
    lbl.write_text(json.dumps(
        {p.name: int((preds[i] + 1) % 10) for i, p in enumerate(paths)}))
    out = tmp_path / "robust_gt.json"
    rc = main(["--image_dir", str(image_dir), "--model", "resnet_tiny",
               "--eps_list", "0.03137", "--apgd_steps", "2",
               "--square_steps", "3", "--deepfool_steps", "2",
               "--labels_json", str(lbl), "--output", str(out)])
    assert rc == 0
    text = capsys.readouterr().out
    assert "clean accuracy vs ground truth: 0.000" in text


def test_serve_linestream_sees_buffered_burst():
    """ADVICE r2 (medium): a burst of lines already delivered by the OS
    must drain as ONE micro-batch, not batch-of-1 per wait window.  The
    os.read-based _LineStream makes buffered lines visible instantly."""
    import os as _os
    import time as _time

    from image_recognition_adversarial_example_attack_tpu.cli.serve import (
        _LineStream,
        _drain_requests,
    )

    r, w = _os.pipe()
    try:
        _os.write(w, b"a.jpg\nb.jpg\nc.jpg\nd.jpg\n")
        reader = _LineStream(r)
        t0 = _time.monotonic()
        got = _drain_requests(reader, batch=8, max_wait_s=0.05)
        dt = _time.monotonic() - t0
        assert got == ["a.jpg", "b.jpg", "c.jpg", "d.jpg"]
        assert dt < 1.0  # buffered lines come without stalling per line
        # partial line stays buffered until its newline (or EOF) arrives
        _os.write(w, b"e.jp")
        assert reader.readline(0.05) is None and not reader.eof
        _os.write(w, b"g\n")
        _os.close(w)
        assert reader.readline(1.0) == "e.jpg"
        assert reader.readline(1.0) is None and reader.eof
    finally:
        _os.close(r)


@pytest.mark.slow
def test_serve_cli_sigterm_drain(image_dir):
    """SIGTERM while idle: the service emits a shutdown line and exits 0
    (graceful drain, VERDICT r2 next #7)."""
    import signal as _signal
    import subprocess
    import sys as _sys
    import time as _time

    env = {"ADV_TPU_PLATFORM": "cpu", "PATH": "/usr/bin:/bin", "HOME": "/root"}
    proc = subprocess.Popen(
        [_sys.executable, "-m",
         "image_recognition_adversarial_example_attack_tpu.cli.serve",
         "--model", "resnet_tiny", "--batch", "2"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, env=env,
        cwd=str(Path(__file__).resolve().parent.parent),
    )
    try:
        ready = json.loads(proc.stdout.readline())
        assert ready["ready"] is True
        # one request round-trips before the signal
        proc.stdin.write(f"{image_dir / 'img_0.jpg'}\n")
        proc.stdin.flush()
        resp = json.loads(proc.stdout.readline())
        assert resp["top1"] >= 0 and resp["latency_ms"] > 0
        assert resp["batch_size"] == 2  # compiled batch, not request count
        assert resp["request_count"] == 1
        assert "decode_ms" in resp
        proc.send_signal(_signal.SIGTERM)
        out, err = proc.communicate(timeout=60)
        assert proc.returncode == 0, err[-2000:]
        last = json.loads(out.splitlines()[-1])
        assert last == {"shutdown": True, "signal": int(_signal.SIGTERM)}
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()


def test_config_fingerprint_scopes_to_the_cell_attack():
    """--resume gate: a cell's fingerprint covers exactly the knobs its
    attack's program reads (cli/common.py:ATTACK_KNOB_ARGS), so editing an
    unrelated attack's budget or shrinking --attacks keeps finished cells
    resumable, while shared-semantics args still invalidate everything."""
    from argparse import Namespace

    from image_recognition_adversarial_example_attack_tpu.cli.common import (
        config_fingerprint)

    base = dict(image_dir="imgs", attacks=["fgsm", "pgd"], eps_list=[0.03137],
                steps=2, alpha=0.01, cw_c=1.0, cw_kappa=0.0, cw_steps=4,
                cw_lr=0.01, square_steps=16, model="resnet_tiny", seed=0,
                detector="feature", adaptive=False, labels_json=None,
                output_dir="o1", resume=False, viz_samples=2,
                profile_dir=None)
    a = Namespace(**base)
    b = Namespace(**{**base, "cw_steps": 100, "attacks": ["fgsm"],
                     "viz_samples": 0, "output_dir": "o2", "resume": True})

    # fgsm cell survives cw-budget / grid-shape / output-location changes
    assert (config_fingerprint(a, attack_name="fgsm")
            == config_fingerprint(b, attack_name="fgsm"))
    # the cw cell itself must NOT survive a cw_steps change
    assert (config_fingerprint(a, attack_name="cw")
            != config_fingerprint(b, attack_name="cw"))
    # pgd reads steps/alpha: an alpha change invalidates pgd, not fgsm
    c = Namespace(**{**base, "alpha": 0.02})
    assert (config_fingerprint(a, attack_name="pgd")
            != config_fingerprint(c, attack_name="pgd"))
    assert (config_fingerprint(a, attack_name="fgsm")
            == config_fingerprint(c, attack_name="fgsm"))
    # shared semantics (detector choice) invalidate every cell
    d = Namespace(**{**base, "detector": "squeezing"})
    for name in ("fgsm", "pgd", "cw"):
        assert (config_fingerprint(a, attack_name=name)
                != config_fingerprint(d, attack_name=name))
    # unknown attack names keep every knob (safe default)
    e = Namespace(**{**base, "cw_steps": 100})
    assert (config_fingerprint(a, attack_name="someday_attack")
            != config_fingerprint(e, attack_name="someday_attack"))


@pytest.mark.slow
def test_uap_cli_both_modes(image_dir, tmp_path, capsys):
    from image_recognition_adversarial_example_attack_tpu.cli.uap import main

    stem = tmp_path / "uap_art"
    rc = main(["--image_dir", str(image_dir), "--model", "resnet_tiny",
               "--eps", "0.05", "--epochs", "2", "--output", str(stem)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "UAP trained" in out and "fooling rate" in out
    delta = np.load(stem.with_suffix(".npy"))
    assert delta.shape == (224, 224, 3)  # CLI loads at the 224 convention
    assert np.abs(delta).max() <= 0.05 + 1e-6
    meta = json.loads(stem.with_suffix(".json").read_text())
    assert meta["mode"] == "uap" and len(meta["per_image"]) == 3
    assert stem.with_suffix(".png").is_file()

    stem2 = tmp_path / "patch_art"
    adv_dir = tmp_path / "patched"
    rc = main(["--image_dir", str(image_dir), "--model", "resnet_tiny",
               "--mode", "patch", "--patch_size", "16", "--steps", "3",
               "--target", "1", "--output", str(stem2),
               "--save_adv_dir", str(adv_dir)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Patch trained" in out and "targeted success rate" in out
    patch = np.load(stem2.with_suffix(".npy"))
    assert patch.shape == (16, 16, 3)
    assert patch.min() >= 0.0 and patch.max() <= 1.0
    assert len(list(adv_dir.glob("*_adv.png"))) == 3


def test_cli_model_programs_take_weights_as_runtime_args():
    """Relay-413 regression (r5 reference replay): the axon remote-compile
    endpoint serializes closure-captured weights into the compile payload
    even when device-resident, and rejects bodies past ~0.5 GB — so every
    multi-model CLI program must receive its weights as EXPLICIT jit
    arguments (HLO parameters), never as embedded constants."""
    import argparse
    import re as _re

    import jax
    import jax.numpy as jnp

    from image_recognition_adversarial_example_attack_tpu.cli.common import (
        VarBoundJit, load_bundle, make_fns_explicit)

    ns = argparse.Namespace(model="resnet_tiny", model_dtype="float32",
                            weights=None, int8=False)
    bundle = load_bundle(ns)
    lof, _ = make_fns_explicit(bundle)
    prog = VarBoundJit(lambda v, x: jnp.argmax(lof(v, x), -1),
                       bundle.variables)
    x = jnp.zeros((2, bundle.input_size, bundle.input_size, 3))

    def big_const_elems(text):
        total = 0
        for m in _re.finditer(r"stablehlo\.constant\s+dense<[^:]*:\s*"
                              r"tensor<([0-9x]+)x?f32>", text):
            dims = [int(d) for d in m.group(1).split("x") if d]
            n = 1
            for d in dims:
                n *= d
            total = max(total, n)
        return total

    # explicit style: no weight tensor may be inlined as a constant
    explicit_text = prog._jit.lower(bundle.variables, x).as_text()
    assert big_const_elems(explicit_text) < 10_000, (
        "weights leaked into the compile payload as constants")

    # control — the counter is not blind: the closure style DOES inline
    # them (lower() inlines closure consts; the relay behaves likewise
    # for execution-path compiles)
    closure = jax.jit(lambda xx: jnp.argmax(lof(bundle.variables, xx), -1))
    closure_text = closure.lower(x).as_text()
    assert big_const_elems(closure_text) >= 10_000, (
        "control failed: closure constants not visible to the check")
