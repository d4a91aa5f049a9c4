"""ImageNet-val ground-truth data plane (--imagenet_val_dir).

VERDICT r3 next #6: ground truth at dataset scale as one flag, mirroring
--cifar10_dir, on robust_eval / defense_experiments / corruption_eval.
Tests run on synthesized trees (no real ImageNet in the container):
both on-disk layouts (torchvision class subfolders; flat + val_map.txt),
the materialized-labels bridge into the existing labels_json machinery,
CLI wiring with real-label accuracy semantics, and the fail-fast rails.
"""

import json

import numpy as np
import pytest
from PIL import Image

from image_recognition_adversarial_example_attack_tpu.core.datasets import (
    list_imagenet_val,
)


def _write_img(path, seed, size=40):
    rng = np.random.RandomState(seed)
    Image.fromarray((rng.rand(size, size, 3) * 255).astype(np.uint8)).save(path)


@pytest.fixture()
def subfolder_tree(tmp_path):
    """torchvision ImageFolder layout: 3 WNID-style class folders."""
    root = tmp_path / "val"
    wnids = ["n01440764", "n01443537", "n01484850"]  # sorted already
    k = 0
    for c in wnids:
        (root / c).mkdir(parents=True)
        for j in range(3):
            _write_img(root / c / f"ILSVRC2012_val_{k:08d}.jpg", seed=k)
            k += 1
    return root, wnids


@pytest.fixture()
def flat_tree(tmp_path):
    """Flat layout + val_map.txt '<filename> <class_index>' lines."""
    root = tmp_path / "valflat"
    root.mkdir()
    lines = []
    for i in range(6):
        name = f"img_{i:03d}.jpg"
        _write_img(root / name, seed=100 + i)
        lines.append(f"{name} {i % 4}")
    (root / "val_map.txt").write_text("\n".join(lines) + "\n")
    return root


class TestListImagenetVal:
    def test_subfolder_layout(self, subfolder_tree):
        root, wnids = subfolder_tree
        paths, labels, classes = list_imagenet_val(root)
        assert classes == wnids
        assert len(paths) == 9
        # class index = sorted-folder position (torchvision convention)
        assert labels.tolist() == [0, 0, 0, 1, 1, 1, 2, 2, 2]
        assert [p.parent.name for p in paths] == [
            wnids[i] for i in labels.tolist()]

    def test_flat_val_map_layout(self, flat_tree):
        paths, labels, classes = list_imagenet_val(flat_tree)
        assert classes is None
        assert len(paths) == 6
        assert labels.tolist() == [i % 4 for i in range(6)]
        # val_map.txt itself is not an image path
        assert all(p.suffix == ".jpg" for p in paths)

    def test_flat_missing_entry_is_an_error(self, flat_tree):
        _write_img(flat_tree / "unlabeled.jpg", seed=999)
        with pytest.raises(ValueError, match="no entry for 1 image"):
            list_imagenet_val(flat_tree)

    def test_tiny_imagenet_extra_columns_ignored(self, tmp_path):
        root = tmp_path / "tiv"
        root.mkdir()
        _write_img(root / "a.jpg", seed=1)
        (root / "val_annotations.txt").write_text("a.jpg 7 0 0 62 62\n")
        paths, labels, _ = list_imagenet_val(root)
        assert labels.tolist() == [7]

    def test_tiny_imagenet_wnid_labels(self, tmp_path):
        """The REAL tiny-imagenet annotation format has a WNID string in
        column 2 ('val_0.JPEG n03444034 0 32 44 62'), not an int — labels
        map through the sorted unique-name convention (round-4 review:
        int(parts[1]) used to crash on this advertised layout)."""
        root = tmp_path / "tinw"
        (root / "images").mkdir(parents=True)
        wnids = ["n03444034", "n01443537", "n03444034", "n09246464"]
        lines = []
        for i, w in enumerate(wnids):
            _write_img(root / "images" / f"val_{i}.jpg", seed=70 + i)
            lines.append(f"val_{i}.jpg\t{w}\t0\t32\t44\t62")
        (root / "val_annotations.txt").write_text("\n".join(lines))
        paths, labels, classes = list_imagenet_val(root)
        assert classes == sorted(set(wnids))  # n01..., n034..., n092...
        assert labels.tolist() == [1, 0, 1, 2]

    def test_mixed_int_and_wnid_labels_rejected(self, tmp_path):
        root = tmp_path / "tmix"
        root.mkdir()
        _write_img(root / "a.jpg", seed=1)
        _write_img(root / "b.jpg", seed=2)
        (root / "val_map.txt").write_text("a.jpg 7\nb.jpg n01443537\n")
        with pytest.raises(ValueError, match="mix integer class indices"):
            list_imagenet_val(root)

    def test_tiny_imagenet_images_subdir_layout(self, tmp_path):
        """The REAL tiny-imagenet val tree: val/images/*.JPEG +
        val/val_annotations.txt.  The round-4 review bug: subfolder
        detection used to win, silently labeling everything 0 from a
        single 'images' pseudo-class — the annotation file must take
        precedence and the images/ subdir must be scanned."""
        root = tmp_path / "tinv"
        (root / "images").mkdir(parents=True)
        for i in range(4):
            _write_img(root / "images" / f"val_{i}.jpg", seed=50 + i)
        (root / "val_annotations.txt").write_text("\n".join(
            f"val_{i}.jpg {i + 3} 0 0 62 62" for i in range(4)))
        paths, labels, classes = list_imagenet_val(root)
        assert classes is None          # NOT the subfolder layout
        assert labels.tolist() == [3, 4, 5, 6]
        assert all(p.parent.name == "images" for p in paths)

    def test_empty_dir_fails_fast(self, tmp_path):
        d = tmp_path / "empty"
        d.mkdir()
        with pytest.raises(FileNotFoundError, match="neither class"):
            list_imagenet_val(d)
        with pytest.raises(FileNotFoundError, match="not found"):
            list_imagenet_val(tmp_path / "nope")


class TestImagenetValInputs:
    def test_materialized_labels_json_roundtrip(self, subfolder_tree):
        from image_recognition_adversarial_example_attack_tpu.cli.common import (
            imagenet_val_inputs,
            resolve_labels,
        )

        root, _ = subfolder_tree
        paths, labels_json = imagenet_val_inputs(str(root))
        table = json.loads(open(labels_json).read())
        assert len(table) == 9
        # the existing labels machinery resolves every path (no pseudo
        # fallback) — full coverage is the whole point
        pseudo = np.full(len(paths), -1, np.int64)
        got = resolve_labels(labels_json, paths, pseudo)
        assert (got >= 0).all()
        assert got.tolist() == [0, 0, 0, 1, 1, 1, 2, 2, 2]

    def test_content_addressed_and_stable(self, subfolder_tree):
        from image_recognition_adversarial_example_attack_tpu.cli.common import (
            imagenet_val_inputs,
        )

        root, _ = subfolder_tree
        _, j1 = imagenet_val_inputs(str(root))
        _, j2 = imagenet_val_inputs(str(root))
        assert j1 == j2  # same content -> same file (resume digests stable)

    def test_conflicting_flags_fail_fast(self, subfolder_tree):
        import argparse

        from image_recognition_adversarial_example_attack_tpu.cli.common import (
            apply_imagenet_val,
        )

        root, _ = subfolder_tree
        ns = argparse.Namespace(imagenet_val_dir=str(root),
                                labels_json="x.json", cifar10_dir=None,
                                image_dir=None)
        with pytest.raises(SystemExit, match="drop --labels_json"):
            apply_imagenet_val(ns)
        ns = argparse.Namespace(imagenet_val_dir=str(root), labels_json=None,
                                cifar10_dir="/tmp/c", image_dir=None)
        with pytest.raises(SystemExit, match="at most one"):
            apply_imagenet_val(ns)
        ns = argparse.Namespace(imagenet_val_dir=str(root), labels_json=None,
                                cifar10_dir=None, image_dir="/tmp/d")
        with pytest.raises(SystemExit, match="replaces --image_dir"):
            apply_imagenet_val(ns)
        ns = argparse.Namespace(imagenet_val_dir=None, labels_json=None,
                                cifar10_dir=None, image_dir=None)
        assert apply_imagenet_val(ns) is None

    def test_cifar_branch_rejects_imagenet_val(self, subfolder_tree):
        """Round-4 review F2: the CLIs that also have --cifar10_dir take
        the CIFAR branch first, so the conflict must be rejected BEFORE
        branching — not silently resolved in CIFAR's favor."""
        from image_recognition_adversarial_example_attack_tpu.cli.defense_experiments import (
            main as defense_main,
        )
        from image_recognition_adversarial_example_attack_tpu.cli.robust_eval import (
            main as robust_main,
        )

        root, _ = subfolder_tree
        for main in (robust_main, defense_main):
            with pytest.raises(SystemExit, match="at most one"):
                main(["--cifar10_dir", "/tmp/nonexistent-cifar",
                      "--imagenet_val_dir", str(root)])


@pytest.mark.slow
def test_robust_eval_cli_imagenet_val(subfolder_tree, tmp_path, capsys):
    """robust_eval on a synthesized val tree: real labels drive clean
    accuracy (not 1.0-by-construction pseudo-labels) and the report says
    ground_truth."""
    from image_recognition_adversarial_example_attack_tpu.cli.robust_eval import (
        main,
    )

    root, _ = subfolder_tree
    out = tmp_path / "r.json"
    rc = main(["--imagenet_val_dir", str(root), "--model", "resnet_tiny",
               "--protocol", "lite", "--eps_list", "0.03",
               "--apgd_steps", "2", "--square_steps", "3",
               "--deepfool_steps", "2", "--output", str(out)])
    assert rc == 0
    text = capsys.readouterr().out
    assert "ImageNet-val ground truth: 9 images" in text
    # random-init tiny model vs 3 synthetic classes: clean accuracy is a
    # REAL measurement now, not the pseudo-label tautology
    assert "clean accuracy vs ground truth:" in text
    data = json.loads(out.read_text())
    row = data["results"][0]
    assert row["count"] == 9
    assert 0.0 <= row["robust_accuracy"] <= 1.0


@pytest.mark.slow
def test_corruption_eval_cli_imagenet_val(subfolder_tree, tmp_path, capsys):
    from image_recognition_adversarial_example_attack_tpu.cli.corruption_eval import (
        main,
    )

    root, _ = subfolder_tree
    out = tmp_path / "c.json"
    rc = main(["--imagenet_val_dir", str(root), "--model", "resnet_tiny",
               "--corruptions", "gaussian_noise", "--severities", "1",
               "--output", str(out)])
    assert rc == 0
    data = json.loads(out.read_text())
    assert data["label_source"] == "ground_truth"


@pytest.mark.slow
def test_defense_cli_imagenet_val(subfolder_tree, tmp_path, capsys):
    from image_recognition_adversarial_example_attack_tpu.cli.defense_experiments import (
        main,
    )

    root, _ = subfolder_tree
    rc = main(["--imagenet_val_dir", str(root), "--model", "resnet_tiny",
               "--attacks", "fgsm", "--eps_list", "0.03", "--steps", "2",
               "--output_dir", str(tmp_path)])
    assert rc == 0
    text = capsys.readouterr().out
    assert "ImageNet-val ground truth: 9 images" in text


@pytest.mark.slow
def test_attack_suite_cli_imagenet_val_streamed(subfolder_tree, tmp_path,
                                                capsys):
    """--imagenet_val_dir on the suite table, streamed: ground-truth
    labels flow through the UNLABELED-sentinel chunk path, ECE becomes a
    true calibration number (not the pseudo-label degenerate)."""
    from image_recognition_adversarial_example_attack_tpu.cli.attack_suite import (
        main,
    )

    root, _ = subfolder_tree
    out = tmp_path / "s.json"
    rc = main(["--imagenet_val_dir", str(root), "--model", "resnet_tiny",
               "--attacks", "fgsm", "--steps", "2", "--max_batch", "4",
               "--output", str(out)])
    assert rc == 0
    text = capsys.readouterr().out
    assert "ImageNet-val ground truth: 9 images" in text
    # the pseudo-label ECE caveat must NOT print in ground-truth mode
    assert "labels are the model's own pseudo-labels" not in text
    data = json.loads(out.read_text())
    assert data["labels"] == "ground-truth"
    assert data["count"] == 9 and data["streamed"] is True


@pytest.mark.slow
def test_query_curves_cli_imagenet_val(subfolder_tree, tmp_path, capsys):
    from image_recognition_adversarial_example_attack_tpu.cli.query_curves import (
        main,
    )

    root, _ = subfolder_tree
    out = tmp_path / "q.json"
    rc = main(["--imagenet_val_dir", str(root), "--model", "resnet_tiny",
               "--attacks", "square", "--max_queries", "10",
               "--checkpoints", "10", "--max_batch", "0",
               "--output", str(out)])
    assert rc == 0
    data = json.loads(out.read_text())
    assert data["labels"] == "ground-truth"


@pytest.mark.slow
def test_certify_cli_imagenet_val(subfolder_tree, tmp_path):
    from image_recognition_adversarial_example_attack_tpu.cli.certify import (
        main,
    )

    root, _ = subfolder_tree
    out = tmp_path / "c.json"
    rc = main(["--imagenet_val_dir", str(root), "--model", "resnet_tiny",
               "--n0", "8", "--n", "16", "--chunk", "8",
               "--output", str(out)])
    assert rc == 0
    data = json.loads(out.read_text())
    assert len(data["sweeps"][0]["results"]) == 9
