"""Weights-day runbook: a checkpoint directory -> full pretrained zoo ->
weight-gated oracle suite -> scoreboard, in ONE command (VERDICT r3 #8).

The container is air-gapped, so pretrained torchvision / RobustBench
checkpoints cannot exist here today; the day they land, this script is
the zero-archaeology path from "a directory of .pth files" to "the
reference's published tables (/root/reference/实验结果.md:360-481)
executed and scored":

    python scripts/weights_day.py /path/to/checkpoints \
        [--weights_dir weights] [--oracle_args '-k sweep'] \
        [--scoreboard docs/WEIGHTS_SCOREBOARD.md] [--dry_run]

Steps:
1. **Scan + map**: every ``*.pth``/``*.pt`` in the directory is mapped to
   a zoo family by filename (torchvision's published names — e.g.
   ``resnet50-0676ba61.pth`` — and exact ``<zoo_name>.pth`` both work;
   'robust'/'madry'/'engstrom' in the name maps to resnet50_robust).
2. **Import**: ``cli/import_weights.py`` converts each to the Flax
   msgpack cache under --weights_dir (with --verify's forward-pass smoke).
3. **Oracles**: the weight-gated parity suite
   (``tests/test_reference_oracles.py`` + ``tests/test_pretrained_parity.py``)
   runs; tests gate per family, so a partial checkpoint directory scores
   partially — anything still missing skips, anything present executes.
4. **Scoreboard**: pass/fail/skip per oracle is written to the markdown
   scoreboard with the import inventory, replacing the previous one.

End-to-end drill-tested with synthesized state dicts
(tests/test_weights_day.py) — landing real weights requires running this
one command.
"""

from __future__ import annotations

import argparse
import datetime
import os
import re
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:  # runnable as `python scripts/weights_day.py`
    sys.path.insert(0, str(REPO))

# Robust-checkpoint keyword (Madry-lab / RobustBench naming).  Checked
# SEPARATELY from the architecture hints: a robust checkpoint of a known
# non-ResNet50 architecture (e.g. wrn34_10_robust.pth) belongs to THAT
# family — same module, adversarially-trained weights; only robust
# ResNet-50s (or robust files with no recognizable architecture) go to
# the dedicated identity-normalization resnet50_robust entry.
ROBUST_HINT = re.compile(r"robust|madry|engstrom|salman")

# filename hint -> zoo family (checked in order; first match wins).
# torchvision's published checkpoint names all start with the model name.
FAMILY_HINTS: tuple[tuple[str, str], ...] = (
    (r"^resnet50", "resnet50"),
    (r"^vgg19", "vgg19"),
    (r"^vit_b_16|^vit-b-16|^vit_base_patch16", "vit_b_16"),
    (r"^swin_t|^swin-t|^swin_tiny", "swin_t"),
    (r"^densenet121", "densenet121"),
    (r"^efficientnet_b0|^efficientnet-b0", "efficientnet_b0"),
    (r"^mobilenet_v2|^mobilenetv2", "mobilenet_v2"),
    (r"^convnext_tiny|^convnext-tiny", "convnext_tiny"),
    (r"^wrn28_10|^wrn-28-10|^wideresnet28", "wrn28_10"),
    (r"^wrn34_10|^wrn-34-10|^wideresnet34", "wrn34_10"),
    (r"^preact_resnet18|^preactresnet18", "preact_resnet18"),
)


def map_checkpoints(ckpt_dir: Path) -> tuple[dict[str, Path], list[Path]]:
    """{zoo_family: checkpoint_path}, plus the unmapped leftovers.
    An exact ``<zoo_name>.pth`` always wins over hint matching; among
    hint matches the shortest filename wins (base weights over variants).
    """
    from image_recognition_adversarial_example_attack_tpu.models.zoo import (
        list_models,
    )

    known = set(list_models())
    files = sorted(p for p in ckpt_dir.iterdir()
                   if p.suffix.lower() in (".pth", ".pt"))
    mapped: dict[str, Path] = {}
    unmapped: list[Path] = []
    for p in files:
        stem = p.stem.lower()
        if p.stem in known:                       # exact zoo name
            mapped[p.stem] = p
            continue
        arch = next((family for pat, family in FAMILY_HINTS
                     if re.search(pat, stem)), None)
        if arch is None:
            # non-prefix names (madry_vgg19.pth): retry the hints
            # unanchored so a robust checkpoint of a known non-ResNet50
            # architecture maps to THAT family instead of silently
            # importing foreign weights under resnet50_robust
            arch = next((family for pat, family in FAMILY_HINTS
                         if re.search(pat.replace("^", ""), stem)), None)
        if ROBUST_HINT.search(stem) and arch in (None, "resnet50"):
            family = "resnet50_robust"            # robust ResNet-50 lineage
        else:
            family = arch                         # architecture hint wins
        if family is None:
            unmapped.append(p)
        elif family not in mapped or len(p.name) < len(mapped[family].name):
            mapped[family] = p
    # exact names override hint matches for the same family
    for p in files:
        if p.stem in known:
            mapped[p.stem] = p
    return mapped, unmapped


def run_imports(mapped: dict[str, Path], weights_dir: Path,
                verify: bool) -> list[dict]:
    from image_recognition_adversarial_example_attack_tpu.cli.import_weights import (
        main as import_main,
    )

    weights_dir.mkdir(parents=True, exist_ok=True)
    rows = []
    for family, ckpt in sorted(mapped.items()):
        print(f"\n=== import {family} <- {ckpt.name} ===", flush=True)
        argv = [family, str(ckpt),
                "--out", str(weights_dir / f"{family}.msgpack")]
        if verify:
            argv.append("--verify")
        try:
            rc = import_main(argv)
            status = "imported" if rc == 0 else f"rc={rc}"
        except SystemExit as e:
            status = f"FAILED: {e}"
        except Exception as e:  # keep going — score what converts
            status = f"FAILED: {type(e).__name__}: {e}"
        rows.append({"family": family, "checkpoint": ckpt.name,
                     "status": status})
        print(f"{family}: {status}", flush=True)
    return rows


def run_oracles(weights_dir: Path, extra_args: str) -> tuple[list[dict], str]:
    """Run the weight-gated oracle suite; returns (per-test rows, tail).
    Per-test outcomes come from pytest's built-in junit-xml report (no
    plugin dependency in this container)."""
    import xml.etree.ElementTree as ET

    fd, report_name = tempfile.mkstemp(suffix=".xml")
    os.close(fd)
    report = Path(report_name)
    cmd = [sys.executable, "-m", "pytest",
           "tests/test_reference_oracles.py", "tests/test_pretrained_parity.py",
           "-q", f"--junit-xml={report}"] + (
        __import__("shlex").split(extra_args) if extra_args else [])
    env = dict(os.environ, ADV_TPU_WEIGHTS_DIR=str(weights_dir))
    print(f"\n=== oracles: {' '.join(cmd)} ===", flush=True)
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True)
    tail = "\n".join(proc.stdout.splitlines()[-15:])
    print(tail, flush=True)
    rows = []
    if report.is_file():
        for case in ET.parse(report).getroot().iter("testcase"):
            nodeid = f"{case.get('classname', '')}::{case.get('name', '')}"
            outcome = "passed"
            for child in case:
                if child.tag in ("failure", "error"):
                    outcome = "failed"
                elif child.tag == "skipped":
                    outcome = "skipped"
            rows.append({"test": nodeid, "outcome": outcome})
        report.unlink()
    return rows, tail


def write_scoreboard(path: Path, imports: list[dict], oracles: list[dict],
                     unmapped: list[Path], tail: str) -> None:
    lines = [
        "# Weights-day scoreboard",
        "",
        f"Generated by `scripts/weights_day.py` on "
        f"{datetime.date.today().isoformat()}.",
        "",
        "## Imported checkpoints",
        "",
        "| family | checkpoint | status |",
        "|---|---|---|",
    ]
    for r in imports:
        lines.append(f"| {r['family']} | {r['checkpoint']} | {r['status']} |")
    if unmapped:
        lines += ["", "Unmapped files (no family hint matched): "
                  + ", ".join(p.name for p in unmapped)]
    counts: dict[str, int] = {}
    for r in oracles:
        counts[r["outcome"]] = counts.get(r["outcome"], 0) + 1
    lines += [
        "",
        "## Oracle suite (reference 实验结果.md:360-481)",
        "",
        f"Outcomes: {counts or 'no report captured'}",
        "",
        "| oracle | outcome |",
        "|---|---|",
    ]
    for r in oracles:
        lines.append(f"| `{r['test']}` | {r['outcome']} |")
    lines += ["", "## pytest tail", "", "```", tail, "```", ""]
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text("\n".join(lines))
    print(f"\nScoreboard: {path}", flush=True)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="checkpoints dir -> imported zoo -> oracles -> scoreboard")
    ap.add_argument("checkpoint_dir", type=str)
    ap.add_argument("--weights_dir", type=str, default=str(REPO / "weights"))
    ap.add_argument("--scoreboard", type=str,
                    default=str(REPO / "docs" / "WEIGHTS_SCOREBOARD.md"))
    ap.add_argument("--oracle_args", type=str, default="",
                    help="extra pytest args for the oracle run (e.g. '-k sweep')")
    ap.add_argument("--no_verify", action="store_true",
                    help="skip the per-import forward-pass smoke")
    ap.add_argument("--skip_oracles", action="store_true")
    ap.add_argument("--dry_run", action="store_true",
                    help="print the family mapping and exit")
    args = ap.parse_args(argv)

    ckpt_dir = Path(args.checkpoint_dir)
    if not ckpt_dir.is_dir():
        raise SystemExit(f"checkpoint dir not found: {ckpt_dir}")
    mapped, unmapped = map_checkpoints(ckpt_dir)
    if not mapped:
        raise SystemExit(f"no recognizable checkpoints in {ckpt_dir} "
                         f"(saw {[p.name for p in unmapped][:5]})")
    print("family mapping:")
    for fam, p in sorted(mapped.items()):
        print(f"  {fam:<18} <- {p.name}")
    if unmapped:
        print(f"  (unmapped: {[p.name for p in unmapped]})")
    if args.dry_run:
        return 0

    imports = run_imports(mapped, Path(args.weights_dir),
                          verify=not args.no_verify)
    oracles, tail = ([], "(skipped)") if args.skip_oracles else run_oracles(
        Path(args.weights_dir), args.oracle_args)
    write_scoreboard(Path(args.scoreboard), imports, oracles, unmapped, tail)
    failed = [r for r in imports if r["status"].startswith("FAILED")]
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
