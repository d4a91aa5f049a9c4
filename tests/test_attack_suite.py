"""Zoo-wide attack-comparison CLI (cli/attack_suite.py)."""

import json

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("suite_imgs")
    rng = np.random.RandomState(0)
    for i in range(3):
        arr = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"img_{i}.jpg")
    return d


@pytest.mark.slow
def test_attack_suite_cli(image_dir, tmp_path, capsys):
    from image_recognition_adversarial_example_attack_tpu.cli.attack_suite import (
        main,
    )

    out = tmp_path / "suite.json"
    rc = main(["--image_dir", str(image_dir), "--model", "resnet_tiny",
               "--attacks", "fgsm", "pgd", "jsma",
               "--steps", "3", "--jsma_steps", "4",
               "--output", str(out)])
    assert rc == 0
    text = capsys.readouterr().out
    assert "ASR" in text and "SSIM" in text
    data = json.loads(out.read_text())
    assert data["count"] == 3 and data["labels"] == "pseudo"
    rows = {r["attack"]: r for r in data["results"]}
    assert set(rows) == {"fgsm", "pgd", "jsma"}
    for r in rows.values():
        assert 0.0 <= r["asr"] <= 1.0
        assert 0.0 <= r["ssim"] <= 1.0
        assert 0.0 <= r["ece"] <= 1.0
        assert r["steady_s"] >= 0.0
    assert 0.0 <= data["ece_clean"] <= 1.0
    # threat models show through the distortion profile: the L0 attack
    # touches far fewer features than the Linf attacks
    assert rows["jsma"]["changed_pct"] < rows["pgd"]["changed_pct"]
    # Linf attacks respect the eps ball; jsma (L0) does not read eps
    assert rows["fgsm"]["linf"] <= data["eps"] + 1e-6
    assert rows["pgd"]["linf"] <= data["eps"] + 1e-6


@pytest.mark.slow
def test_attack_suite_all_expands(image_dir, tmp_path):
    """'all' expands to the full zoo list (parse-level check via a tiny
    2-attack override is too slow; just verify the expansion logic)."""
    from image_recognition_adversarial_example_attack_tpu.cli.attack_suite import (
        ALL_ATTACKS,
        build_parser,
    )

    args = build_parser().parse_args(["--attacks", "all"])
    assert "all" in args.attacks
    assert len(ALL_ATTACKS) >= 20  # the zoo keeps growing; floor it
