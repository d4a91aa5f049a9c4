"""Coverage for small utilities: labels, profiling, engine path helpers."""

import time
from pathlib import Path

import numpy as np
import pytest
from PIL import Image


class TestLabels:
    def test_fallback_names(self, monkeypatch, tmp_path):
        from image_recognition_adversarial_example_attack_tpu.core import labels

        monkeypatch.chdir(tmp_path)  # no imagenet_classes.txt here
        monkeypatch.delenv("IMAGENET_CLASSES", raising=False)
        labels.load_imagenet_labels.cache_clear()
        out = labels.load_imagenet_labels()
        assert len(out) == 1000 and out[0] == "class_0"
        assert labels.label_name(388, out) == "class_388"
        assert labels.label_name(5000, out) == "5000"

    def test_env_file(self, monkeypatch, tmp_path):
        from image_recognition_adversarial_example_attack_tpu.core import labels

        f = tmp_path / "names.txt"
        f.write_text("\n".join(f"name_{i}" for i in range(1000)))
        monkeypatch.setenv("IMAGENET_CLASSES", str(f))
        labels.load_imagenet_labels.cache_clear()
        out = labels.load_imagenet_labels()
        assert out[388] == "name_388"
        labels.load_imagenet_labels.cache_clear()


class TestPhaseTimer:
    def test_records_and_rates(self, capsys):
        from image_recognition_adversarial_example_attack_tpu.utils.profiling import (
            PhaseTimer,
        )

        t = PhaseTimer(verbose=True)
        with t.phase("work", examples=100):
            time.sleep(0.01)
        with t.phase("nocount"):
            pass
        d = t.as_dict()
        assert d["work"]["seconds"] >= 0.01
        assert d["work"]["examples"] == 100
        assert d["work"]["examples_per_sec"] > 0
        assert "examples" not in d["nocount"]
        assert "[phase] work:" in capsys.readouterr().out

    def test_records_on_exception(self):
        from image_recognition_adversarial_example_attack_tpu.utils.profiling import (
            PhaseTimer,
        )

        t = PhaseTimer()
        with pytest.raises(RuntimeError):
            with t.phase("boom"):
                raise RuntimeError("x")
        assert t.records[0].name == "boom"


class TestEnginePaths:
    def test_batch_from_dir_and_paths(self, tmp_path):
        from image_recognition_adversarial_example_attack_tpu.eval.engine import Engine

        for i in range(2):
            Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(tmp_path / f"{i}.png")
        eng = Engine(mesh=None, use_mesh=False)
        b = eng.batch_from_dir(tmp_path, size=32)
        assert b.x.shape == (2, 32, 32, 3) and b.n_valid == 2
        assert [p.name for p in b.paths] == ["0.png", "1.png"]
        b2 = eng.batch_from_paths([tmp_path / "0.png"], size=32)
        assert b2.x.shape == (1, 32, 32, 3)
        with pytest.raises(FileNotFoundError):
            eng.batch_from_dir(tmp_path / "missing")
