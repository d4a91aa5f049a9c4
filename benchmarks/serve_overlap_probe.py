"""Serve-path A/B: sequential vs --overlap on a long synthesized stream
(VERDICT r4 #4).

Round 4 measured serving transfer-bound at 259.2 img/s steady (uint8
transfer, batch 128) with the upload never overlapped with device
compute.  This probe runs the REAL serve CLI twice over the same
N-request stream — identical flags, once with --overlap — and reports
steady throughput from the emitted responses (wall time from the first
response to the last, so compile/warmup is excluded), win or
measured-neutral.

Run on the real chip (ONE TPU process at a time; the probe itself runs
its two serve processes sequentially with a spacing sleep):
    python benchmarks/serve_overlap_probe.py --n 2560 --batch 128

CPU smoke:
    ADV_TPU_PLATFORM=cpu python benchmarks/serve_overlap_probe.py \
        --n 48 --batch 8 --model resnet_tiny
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_serve(paths_file: Path, n: int, args, overlap: bool) -> dict:
    cmd = [sys.executable, "-m",
           "image_recognition_adversarial_example_attack_tpu.cli.serve",
           "--model", args.model, "--batch", str(args.batch),
           "--max_wait_ms", "5"]
    if args.transfer_uint8:
        cmd.append("--transfer_uint8")
    if overlap:
        cmd.append("--overlap")
    t0 = time.perf_counter()
    with open(paths_file) as fin:
        proc = subprocess.Popen(cmd, stdin=fin, stdout=subprocess.PIPE,
                                stderr=subprocess.DEVNULL, text=True,
                                cwd=str(Path(__file__).resolve().parent.parent))
    first_resp = None
    last = None
    count = 0
    errors = 0
    for line in proc.stdout:
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if rec.get("ready"):
            continue
        if "shutdown" in rec:
            continue
        now = time.perf_counter()
        if first_resp is None:
            first_resp = now
        count += 1
        errors += 1 if "error" in rec else 0
        last = now
    proc.wait(timeout=600)
    wall = time.perf_counter() - t0
    steady_span = (last - first_resp) if count > 1 else 0.0
    # the first DRAIN's responses all land at first_resp; steady rate over
    # the remaining drains
    steady = (count - args.batch) / steady_span if steady_span > 0 else None
    return {
        "overlap": overlap,
        "responses": count,
        "errors": errors,
        "wall_s": round(wall, 1),
        "img_per_s_total": round(count / wall, 1),
        "img_per_s_steady": None if steady is None else round(steady, 1),
        "returncode": proc.returncode,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2560)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--model", default="resnet50")
    ap.add_argument("--transfer_uint8", action="store_true", default=True)
    ap.add_argument("--no_transfer_uint8", dest="transfer_uint8",
                    action="store_false")
    ap.add_argument("--image_dir", type=Path,
                    default=Path("/tmp/adv_tpu_stream_scale"))
    ap.add_argument("--sleep", type=float, default=8.0)
    args = ap.parse_args()

    from stream_scale_probe import synthesize_dataset

    need = max(args.n, 1)
    existing = sorted(args.image_dir.glob("im_*.jpg"))
    pool = (existing if len(existing) >= need
            else synthesize_dataset(args.image_dir, need))
    paths = [str(pool[i % len(pool)]) for i in range(need)]
    paths_file = args.image_dir / "serve_requests.txt"
    paths_file.write_text("\n".join(paths) + "\n")

    results = []
    for overlap in (False, True):
        print(f"running serve overlap={overlap}...", file=sys.stderr,
              flush=True)
        results.append(run_serve(paths_file, need, args, overlap))
        print(json.dumps(results[-1]), file=sys.stderr, flush=True)
        time.sleep(args.sleep)

    seq, ovl = results
    record = {
        "n": need, "batch": args.batch, "model": args.model,
        "transfer_uint8": args.transfer_uint8,
        "sequential": seq, "overlap": ovl,
        "speedup_steady": (round(ovl["img_per_s_steady"]
                                 / seq["img_per_s_steady"], 3)
                           if seq["img_per_s_steady"] and
                           ovl["img_per_s_steady"] else None),
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
