"""CIFAR-10 archive readers (core/datasets.py) + trainer integration."""

import pickle

import numpy as np
import pytest

from image_recognition_adversarial_example_attack_tpu.core.datasets import (
    CIFAR10_CLASSES,
    load_cifar10,
)


def _rows(rng, n):
    """uint8 [n, 3072] channel-planar rows + labels."""
    return (rng.randint(0, 256, (n, 3072)).astype(np.uint8),
            rng.randint(0, 10, (n,)).astype(np.int64))


def _write_py_archive(root, rng, n_per_batch=8, bytes_keys=True):
    d = root / "cifar-10-batches-py"
    d.mkdir()
    all_rows, all_labels = [], []
    for i in range(1, 6):
        rows, labels = _rows(rng, n_per_batch)
        all_rows.append(rows)
        all_labels.append(labels)
        k = (lambda s: s.encode()) if bytes_keys else (lambda s: s)
        with open(d / f"data_batch_{i}", "wb") as f:
            pickle.dump({k("data"): rows, k("labels"): labels.tolist()}, f)
    trows, tlabels = _rows(rng, n_per_batch)
    with open(d / "test_batch", "wb") as f:
        pickle.dump({b"data": trows, b"labels": tlabels.tolist()}, f)
    return (np.concatenate(all_rows), np.concatenate(all_labels),
            trows, tlabels)


def _expect_pixels(rows):
    return rows.reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1).astype(
        np.float32) / 255.0


class TestPickleArchive:
    def test_train_and_test_splits(self, tmp_path):
        rng = np.random.RandomState(0)
        rows, labels, trows, tlabels = _write_py_archive(tmp_path, rng)
        x, y = load_cifar10(tmp_path, "train")
        assert x.shape == (40, 32, 32, 3) and x.dtype == np.float32
        assert y.shape == (40,) and y.dtype == np.int32
        np.testing.assert_array_equal(x, _expect_pixels(rows))
        np.testing.assert_array_equal(y, labels)
        assert 0.0 <= x.min() and x.max() <= 1.0

        xt, yt = load_cifar10(tmp_path, "test")
        np.testing.assert_array_equal(xt, _expect_pixels(trows))
        np.testing.assert_array_equal(yt, tlabels)

    def test_str_keys_tolerated(self, tmp_path):
        rng = np.random.RandomState(1)
        _write_py_archive(tmp_path, rng, bytes_keys=False)
        x, y = load_cifar10(tmp_path, "train")
        assert x.shape == (40, 32, 32, 3)

    def test_root_may_be_the_batches_dir(self, tmp_path):
        rng = np.random.RandomState(2)
        _write_py_archive(tmp_path, rng)
        x, y = load_cifar10(tmp_path / "cifar-10-batches-py", "train")
        assert x.shape == (40, 32, 32, 3)


class TestBinArchive:
    def test_roundtrip(self, tmp_path):
        rng = np.random.RandomState(3)
        d = tmp_path / "cifar-10-batches-bin"
        d.mkdir()
        rows, labels = _rows(rng, 6)
        rec = np.concatenate(
            [labels[:, None].astype(np.uint8), rows], axis=1)
        (d / "data_batch_1.bin").write_bytes(rec.tobytes())
        x, y = load_cifar10(tmp_path, "train")
        assert x.shape == (6, 32, 32, 3)
        np.testing.assert_array_equal(x, _expect_pixels(rows))
        np.testing.assert_array_equal(y, labels)

    def test_truncated_bin_rejected(self, tmp_path):
        d = tmp_path / "cifar-10-batches-bin"
        d.mkdir()
        (d / "data_batch_1.bin").write_bytes(b"\x00" * 100)
        with pytest.raises(ValueError, match="3073"):
            load_cifar10(tmp_path, "train")


class TestErrors:
    def test_missing_archive(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_cifar10(tmp_path, "train")

    def test_bad_split(self, tmp_path):
        with pytest.raises(ValueError, match="split"):
            load_cifar10(tmp_path, "val")

    def test_class_names(self):
        assert len(CIFAR10_CLASSES) == 10
        assert CIFAR10_CLASSES[0] == "airplane"


@pytest.mark.slow
def test_trainer_consumes_cifar_archive(tmp_path, capsys):
    """cli/adversarial_train --cifar10_dir trains a WRN end-to-end."""
    from image_recognition_adversarial_example_attack_tpu.cli.adversarial_train import (
        main,
    )

    rng = np.random.RandomState(4)
    _write_py_archive(tmp_path, rng, n_per_batch=4)
    out = tmp_path / "wrn.msgpack"
    rc = main([
        "--cifar10_dir", str(tmp_path), "--model", "wrn_tiny",
        "--epochs", "1", "--batch_size", "8", "--attack_steps", "1",
        "--lr", "1e-3", "--out", str(out),
    ])
    assert rc == 0
    assert out.is_file()
    text = capsys.readouterr().out
    assert "Dataset: 20 images, 10 classes" in text


def test_trainer_flag_validation(tmp_path):
    from image_recognition_adversarial_example_attack_tpu.cli.adversarial_train import (
        main,
    )

    with pytest.raises(SystemExit, match="exactly one"):
        main(["--model", "wrn_tiny"])
    with pytest.raises(SystemExit, match="streaming"):
        main(["--cifar10_dir", str(tmp_path), "--streaming",
              "--model", "wrn_tiny"])
    with pytest.raises(SystemExit, match="32x32"):
        main(["--cifar10_dir", str(tmp_path), "--model", "resnet50"])
