"""One-command reference-workflow replay (VERDICT r4 #9).

Runs all six reference CLI surfaces — through the SAME root shims a
reference user would call (`ResNet.py`, `defense_experiments.py`,
`blackbox_transfer.py`, `transferability_attack.py`,
`visualized_attacks.py`, `test.py`) — against the reference's own assets
(`/root/reference/picture`, `/root/reference/test_set`), archiving every
artifact (PNGs, JSONs, per-run transcripts) under ONE directory.  This
demonstrates the full reference surface end-to-end on TPU in a single
command, and doubles as the weights-day smoke (run it after
`scripts/weights_day.py` imports real checkpoints).

    python scripts/replay_reference.py [--out replay_artifacts] [--fast]

--fast cuts iteration budgets (steps/cw/square) for a quick smoke;
omit it for reference-default budgets.  Runs are strictly sequential
with a sleep between them (one TPU process at a time — CLAUDE.md).
ADV_TPU_PLATFORM=cpu replays on CPU.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference")


def build_steps(art: Path, fast: bool) -> list[tuple[str, list[str]]]:
    fast_attack = (["--steps", "5", "--cw_steps", "10"] if fast else [])
    fast_square = (["--square_steps", "20"] if fast else [])
    return [
        # 1. the simple-attack CLI (reference ResNet.py): classify + PGD +
        #    adversarial PNG round-trip
        ("ResNet.py", ["example.jpg", "--attack", "pgd",
                       "--save_adv", str(art / "resnet_adv.png"),
                       *fast_attack]),
        # 2. the defense-experiment main: full attack x eps grid, detector,
        #    heatmaps, sample grid
        ("defense_experiments.py", ["--image_dir", "picture",
                                    "--output_dir", str(art / "defense"),
                                    *fast_attack, *fast_square]),
        # 3. the black-box trio harness (transfer to the other families)
        ("blackbox_transfer.py", ["--image_dir", "picture",
                                  "--visualize_n", "2",
                                  *fast_attack, *fast_square]),
        # 4. the generalized transfer study
        ("transferability_attack.py", ["--image", "example.jpg",
                                       "--output_dir", str(art / "transfer"),
                                       *fast_attack]),
        # 5. the visualization main (trajectories, FFT, metrics panels)
        ("visualized_attacks.py", ["--image", "example.jpg",
                                   "--output_dir", str(art / "viz"),
                                   *fast_attack]),
        # 6. the test-set diagnostic
        ("test.py", ["--test_dir", "test_set"]),
    ]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=Path, default=REPO / "replay_artifacts")
    ap.add_argument("--fast", action="store_true",
                    help="cut iteration budgets for a quick smoke")
    ap.add_argument("--sleep", type=float, default=8.0,
                    help="seconds between runs (TPU device-grant spacing)")
    ap.add_argument("--model", default=None,
                    help="override --model for every surface (e.g. "
                         "resnet_tiny for a CPU smoke)")
    ap.add_argument("--only", nargs="*", default=None, metavar="SHIM",
                    help="run only these surfaces (by shim filename, e.g. "
                         "defense_experiments.py) — for retrying a surface "
                         "that lost its device grant to a relay stall; the "
                         "summary merges over any prior REPLAY.json in --out")
    args = ap.parse_args()

    art = args.out.resolve()
    art.mkdir(parents=True, exist_ok=True)
    # reference-relative defaults (example.jpg, picture/, test_set/)
    # resolve via symlinks in the working dir, exactly as a reference
    # checkout would lay them out
    work = art / "workdir"
    work.mkdir(exist_ok=True)
    for name, target in [("example.jpg", REF / "picture" / "example.jpg"),
                         ("picture", REF / "picture"),
                         ("test_set", REF / "test_set")]:
        link = work / name
        if not link.exists():
            link.symlink_to(target)

    results = []
    steps = build_steps(art, args.fast)
    if args.only:
        known = {shim for shim, _ in steps}
        unknown = set(args.only) - known
        if unknown:
            ap.error(f"--only: unknown surfaces {sorted(unknown)}; "
                     f"choose from {sorted(known)}")
        steps = [(s, a) for s, a in steps if s in args.only]
    for i, (shim, shim_args) in enumerate(steps):
        if args.model:
            shim_args = [*shim_args, "--model", args.model]
        cmd = [sys.executable, str(REPO / shim), *shim_args]
        label = shim.removesuffix(".py")
        print(f"[{i + 1}/{len(steps)}] {shim} {' '.join(shim_args)}",
              flush=True)
        t0 = time.perf_counter()
        proc = subprocess.run(cmd, cwd=work, capture_output=True, text=True,
                              env={**os.environ})
        dt = time.perf_counter() - t0
        (art / f"{label}.stdout.txt").write_text(proc.stdout)
        (art / f"{label}.stderr.txt").write_text(proc.stderr)
        ok = proc.returncode == 0
        results.append({"surface": shim, "ok": ok, "seconds": round(dt, 1),
                        "returncode": proc.returncode})
        print(f"    {'ok' if ok else 'FAILED'} in {dt:.0f}s "
              f"(transcript: {label}.stdout.txt)", flush=True)
        if not ok:
            print(proc.stderr[-1500:], file=sys.stderr)
        if i + 1 < len(steps):
            time.sleep(args.sleep)

    # the surfaces that write into their default cwd-relative dirs
    # (blackbox visualizations) land in workdir — everything is under art
    artifacts = sorted(str(p.relative_to(art)) for p in art.rglob("*")
                       if p.is_file() and p.suffix in
                       (".png", ".json", ".txt", ".csv"))
    if args.only and (art / "REPLAY.json").exists():
        # merge a retried subset over the prior full run, preserving the
        # canonical surface order and marking retried entries
        prior = json.loads((art / "REPLAY.json").read_text())
        merged = {r["surface"]: r for r in prior.get("surfaces", [])}
        for r in results:
            merged[r["surface"]] = {**r, "retried": True}
        results = [merged[s] for s, _ in build_steps(art, args.fast)
                   if s in merged]
    summary = {"replay_ok": all(r["ok"] for r in results),
               "fast": bool(args.fast),
               "surfaces": results,
               "artifact_count": len(artifacts),
               "artifact_dir": str(art)}
    (art / "REPLAY.json").write_text(json.dumps(
        {**summary, "artifacts": artifacts}, indent=1))
    print(json.dumps(summary))
    return 0 if summary["replay_ok"] else 1


if __name__ == "__main__":
    main()
