"""Per-op device-time profile of the headline PGD-10 bench program.

Captures a ``jax.profiler`` trace of N steady-state iterations on the real
chip, then parses the trace-viewer JSON (the tensorboard profile plugin's
converters are version-broken in this image) and prints:

- per-HLO-category device-time breakdown (convolution fusions vs the rest),
- the top individual ops with shapes,
- derived MXU utilization for the conv fusions.

Usage:  python benchmarks/profile_pgd.py [--batch 128] [--iters 3]
Output: a Markdown table on stdout (committed as PROFILE_R2.md) and the raw
trace under benchmarks/trace_pgd/.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "trace_pgd")


def capture(batch: int, iters: int) -> float:
    import jax

    from bench import build_attack

    attack, x, y = build_attack(batch)
    key = jax.random.PRNGKey(0)
    attack(x, y, key).block_until_ready()
    attack(x, y, key).block_until_ready()
    jax.profiler.start_trace(TRACE_DIR)
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = attack(x, y, jax.random.fold_in(key, i))
    out.block_until_ready()
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    return batch * iters / dt


def parse(iters: int) -> None:
    files = sorted(glob.glob(os.path.join(TRACE_DIR, "plugins/profile/*/*.trace.json.gz")))
    if not files:
        raise SystemExit(f"no trace under {TRACE_DIR}")
    d = json.load(gzip.open(files[-1], "rt"))
    ops = [e for e in d["traceEvents"]
           if e.get("ph") == "X" and e.get("args", {}).get("hlo_category")]
    # device ops only: events carrying device_duration_ps
    ops = [e for e in ops if "device_duration_ps" in e["args"]]

    cat = collections.defaultdict(float)
    tot = 0.0
    for e in ops:
        c = e["args"]["hlo_category"]
        if c == "while":  # container op; children are separate events
            continue
        dur = float(e["args"]["device_duration_ps"]) / 1e12
        cat[c] += dur
        tot += dur

    print(f"\n## Per-category device time ({iters} iterations, {tot/iters*1e3:.1f} ms/iter)\n")
    print("| category | % of step | ms/iter |")
    print("|---|---|---|")
    for c, s in sorted(cat.items(), key=lambda kv: -kv[1]):
        if s / tot < 0.001:
            continue
        print(f"| {c} | {s/tot*100:.1f}% | {s*1e3/iters:.2f} |")

    agg = collections.defaultdict(lambda: [0.0, ""])
    for e in ops:
        a = e["args"]
        if a["hlo_category"] == "while":
            continue
        agg[e["name"]][0] += float(a["device_duration_ps"]) / 1e12
        agg[e["name"]][1] = a.get("long_name", "")

    print("\n## Top ops\n")
    print("| ms/iter | % | op | output |")
    print("|---|---|---|---|")
    for name, (s, ln) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:15]:
        m = re.search(r"= (\S+) fusion", ln) or re.search(r"= (\S+) ", ln)
        shp = m.group(1) if m else "?"
        print(f"| {s*1e3/iters:.2f} | {s/tot*100:.1f}% | {name} | `{shp[:60]}` |")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--parse-only", action="store_true",
                    help="re-parse an existing trace without touching the TPU")
    args = ap.parse_args()
    if not args.parse_only:
        rate = capture(args.batch, args.iters)
        print(f"traced rate (includes profiling overhead): {rate:.1f} ex/s")
    parse(args.iters)


if __name__ == "__main__":
    main()
