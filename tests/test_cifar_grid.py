"""defense_experiments --cifar10_dir: the full grid harness on CIFAR-10
with real labels (attack + defense + detector, exact summary-line format)."""

import pickle

import numpy as np
import pytest


def _write_test_batch(root, n=10, seed=0):
    d = root / "cifar-10-batches-py"
    d.mkdir()
    rng = np.random.RandomState(seed)
    rows = rng.randint(0, 256, (n, 3072)).astype(np.uint8)
    with open(d / "test_batch", "wb") as f:
        pickle.dump({b"data": rows,
                     b"labels": rng.randint(0, 10, (n,)).tolist()}, f)


@pytest.mark.slow
def test_cifar_grid_end_to_end(tmp_path, capsys):
    from image_recognition_adversarial_example_attack_tpu.cli.defense_experiments import (
        main,
    )

    _write_test_batch(tmp_path)
    out = tmp_path / "grid"
    rc = main([
        "--cifar10_dir", str(tmp_path), "--model", "wrn_tiny",
        "--attacks", "fgsm", "--eps_list", "0.03137", "--steps", "2",
        "--output_dir", str(out), "--viz_samples", "0",
    ])
    assert rc == 0
    text = capsys.readouterr().out
    assert "clean accuracy vs CIFAR-10 test labels" in text
    # the reference's exact six-field summary line survives the CIFAR path
    assert "attack=fgsm, eps=0.03137, attack_success=" in text
    assert (out / "results_partial.json").is_file()


@pytest.mark.slow
def test_cifar_grid_validation(tmp_path):
    from image_recognition_adversarial_example_attack_tpu.cli.defense_experiments import (
        main,
    )

    _write_test_batch(tmp_path)
    with pytest.raises(SystemExit, match="32x32"):
        main(["--cifar10_dir", str(tmp_path), "--model", "resnet50",
              "--attacks", "fgsm", "--eps_list", "0.03"])
    with pytest.raises(SystemExit, match="labels_json"):
        main(["--cifar10_dir", str(tmp_path), "--model", "wrn_tiny",
              "--labels_json", "x.json", "--attacks", "fgsm",
              "--eps_list", "0.03"])
