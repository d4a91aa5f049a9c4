"""Weights-day runbook drill (VERDICT r3 next #8): scripts/weights_day.py
end to end against SYNTHESIZED torchvision-style state dicts, so landing
real checkpoints requires zero archaeology — the one command is proven
to scan, map, convert, run the weight-gated oracle suite, and write the
scoreboard."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))

from test_robust_loading import synth_resnet_state_dict  # noqa: E402

import weights_day  # noqa: E402


class TestCheckpointMapping:
    def test_torchvision_names_map_to_families(self, tmp_path):
        names = [
            "resnet50-0676ba61.pth", "vgg19-dcbb9e9d.pth",
            "vit_b_16-c867db91.pth", "swin_t-704ceda3.pth",
            "densenet121-a639ec97.pth", "efficientnet_b0_rwightman.pth",
            "mobilenet_v2-b0353104.pth", "convnext_tiny-983f1562.pth",
            "engstrom2019_robust_eps3.pth", "wrn28_10_cifar.pth",
            "mystery_model.pth", "notes.txt",
        ]
        for n in names:
            (tmp_path / n).write_bytes(b"x")
        mapped, unmapped = weights_day.map_checkpoints(tmp_path)
        assert mapped["resnet50"].name == "resnet50-0676ba61.pth"
        assert mapped["vgg19"].name == "vgg19-dcbb9e9d.pth"
        assert mapped["vit_b_16"].name == "vit_b_16-c867db91.pth"
        assert mapped["swin_t"].name == "swin_t-704ceda3.pth"
        assert mapped["densenet121"].name == "densenet121-a639ec97.pth"
        assert mapped["efficientnet_b0"].name.startswith("efficientnet_b0")
        assert mapped["mobilenet_v2"].name == "mobilenet_v2-b0353104.pth"
        assert mapped["convnext_tiny"].name == "convnext_tiny-983f1562.pth"
        assert mapped["resnet50_robust"].name.startswith("engstrom")
        assert mapped["wrn28_10"].name == "wrn28_10_cifar.pth"
        assert [p.name for p in unmapped] == ["mystery_model.pth"]

    def test_exact_zoo_name_wins_over_hints(self, tmp_path):
        (tmp_path / "resnet50.pth").write_bytes(b"x")
        (tmp_path / "resnet50-0676ba61.pth").write_bytes(b"x")
        mapped, _ = weights_day.map_checkpoints(tmp_path)
        assert mapped["resnet50"].name == "resnet50.pth"

    def test_robust_keyword_does_not_hijack_other_architectures(
            self, tmp_path):
        # round-4 review: the unanchored robust hint used to claim ANY
        # robust-named checkpoint for resnet50_robust, displacing the
        # real architecture (and the real robust resnet50)
        for n in ["wrn34_10_robust.pth", "engstrom2019_robust_eps3.pth",
                  "resnet50_madry.pth"]:
            (tmp_path / n).write_bytes(b"x")
        mapped, unmapped = weights_day.map_checkpoints(tmp_path)
        assert mapped["wrn34_10"].name == "wrn34_10_robust.pth"
        # robust resnet50 lineage: shortest of the two contenders wins
        assert mapped["resnet50_robust"].name == "resnet50_madry.pth"
        assert "resnet50" not in mapped  # madry file is NOT plain resnet50
        assert unmapped == []

    def test_non_prefix_robust_names_map_to_their_architecture(
            self, tmp_path):
        # advisor r4: FAMILY_HINTS are ^-anchored, so madry_vgg19.pth used
        # to get arch=None and silently import VGG weights under
        # resnet50_robust; the unanchored retry routes it to vgg19
        for n in ["madry_vgg19.pth", "salman2020_swin_tiny.pth"]:
            (tmp_path / n).write_bytes(b"x")
        mapped, unmapped = weights_day.map_checkpoints(tmp_path)
        assert mapped["vgg19"].name == "madry_vgg19.pth"
        assert mapped["swin_t"].name == "salman2020_swin_tiny.pth"
        assert "resnet50_robust" not in mapped
        assert unmapped == []


@pytest.mark.slow
def test_weights_day_end_to_end_drill(tmp_path, capsys):
    """One command: synthesized resnet_tiny .pth -> converted msgpack ->
    oracle suite executes (every oracle gates on the still-missing
    full-size families and SKIPS — recorded, not hidden) -> scoreboard
    written with the import inventory and per-oracle outcomes."""
    from image_recognition_adversarial_example_attack_tpu.models.resnet import (
        resnet_tiny,
    )

    ckpts = tmp_path / "ckpts"
    ckpts.mkdir()
    model = resnet_tiny()
    template = jax.device_get(
        jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))))
    torch.save(synth_resnet_state_dict(template),
               ckpts / "resnet_tiny.pth")

    wdir = tmp_path / "weights"
    board = tmp_path / "scoreboard.md"
    rc = weights_day.main([
        str(ckpts), "--weights_dir", str(wdir),
        "--scoreboard", str(board), "--no_verify",
        "--oracle_args", "-k 'transcript or trio'",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "resnet_tiny" in out and "imported" in out

    # conversion artifact exists and round-trips bit-exact
    msgpack = wdir / "resnet_tiny.msgpack"
    assert msgpack.is_file()
    from image_recognition_adversarial_example_attack_tpu.models import zoo

    bundle = zoo.load_model("resnet_tiny", weights=msgpack)
    got = jax.tree_util.tree_leaves_with_path(bundle.variables)
    want = dict(jax.tree_util.tree_leaves_with_path(template))
    assert all(np.array_equal(np.asarray(v), np.asarray(want[k]))
               for k, v in got)

    text = board.read_text()
    assert "| resnet_tiny | resnet_tiny.pth | imported |" in text
    assert "## Oracle suite" in text
    # full-size families absent -> the selected oracles ran and SKIPPED
    assert "skipped" in text


def test_dry_run_prints_mapping_only(tmp_path, capsys):
    (tmp_path / "resnet50-0676ba61.pth").write_bytes(b"x")
    rc = weights_day.main([str(tmp_path), "--dry_run"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "resnet50" in out
    assert not (Path(tmp_path) / "weights").exists()
