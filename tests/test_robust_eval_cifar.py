"""robust_eval --cifar10_dir: AutoAttack protocols on CIFAR-10 test data
with REAL labels (the RobustBench-style evaluation flow for checkpoints
produced by adversarial_train --cifar10_dir)."""

import json
import pickle

import numpy as np
import pytest


def _write_test_batch(root, n=12, seed=0):
    d = root / "cifar-10-batches-py"
    d.mkdir()
    rng = np.random.RandomState(seed)
    rows = rng.randint(0, 256, (n, 3072)).astype(np.uint8)
    labels = rng.randint(0, 10, (n,)).tolist()
    with open(d / "test_batch", "wb") as f:
        pickle.dump({b"data": rows, b"labels": labels}, f)
    return labels


@pytest.mark.slow
def test_cifar_robust_eval_lite(tmp_path, capsys):
    from image_recognition_adversarial_example_attack_tpu.cli.robust_eval import (
        main,
    )

    _write_test_batch(tmp_path)
    out = tmp_path / "robust.json"
    rc = main([
        "--cifar10_dir", str(tmp_path), "--model", "wrn_tiny",
        "--protocol", "lite", "--eps_list", "0.03137",
        "--apgd_steps", "3", "--square_steps", "5", "--deepfool_steps", "2",
        "--output", str(out),
    ])
    assert rc == 0
    text = capsys.readouterr().out
    # real labels -> the clean-accuracy line must appear
    assert "clean accuracy" in text
    data = json.loads(out.read_text())
    assert data["results"][0]["count"] == 12
    assert 0.0 <= data["results"][0]["robust_accuracy"] <= 1.0


@pytest.mark.slow
def test_cifar_n_cap_and_validation(tmp_path):
    from image_recognition_adversarial_example_attack_tpu.cli.robust_eval import (
        main,
    )

    _write_test_batch(tmp_path)
    # a 224 model cannot consume the 32x32 archive
    with pytest.raises(SystemExit, match="32x32"):
        main(["--cifar10_dir", str(tmp_path), "--model", "resnet50",
              "--eps_list", "0.03"])
