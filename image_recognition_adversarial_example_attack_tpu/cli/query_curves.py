"""Query-efficiency curves CLI: ASR vs model-query budget, per attack.

    python -m ...cli.query_curves --image_dir picture \\
        --attacks square simba nes --max_queries 2000 \\
        --checkpoints 100 500 1000 2000

One attack run at the maximum budget produces the EXACT full curve (the
scan emits per-step success; eval/query_curves.py) — no per-checkpoint
reruns.  The printed table samples the curve at --checkpoints; the JSON
carries the full curve.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import DEFAULT_ALPHA, DEFAULT_EPS
from ..core.images import load_image_batch_tolerant
from ..core.rng import key_from_seed
from ..eval.query_curves import CURVE_ATTACKS, curve_at_checkpoints, query_curve
from .common import (add_imagenet_val_arg,
                     add_model_args, cell_key, check_label_range,
                     load_bundle, make_fns, maybe_profile, n_classes_of,
                     resolve_eval_inputs, resolve_labels)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Black-box query-efficiency curves (ASR vs queries)")
    parser.add_argument("--image_dir", type=str, default=None)
    parser.add_argument("--image", type=str, default="example.jpg")
    parser.add_argument("--attacks", type=str, nargs="+",
                        default=["square", "simba"],
                        choices=list(CURVE_ATTACKS))
    parser.add_argument("--eps", type=float, default=DEFAULT_EPS)
    parser.add_argument("--alpha", type=float, default=DEFAULT_ALPHA,
                        help="nes/spsa step size")
    parser.add_argument("--max_queries", type=int, default=2000)
    parser.add_argument("--checkpoints", type=int, nargs="+",
                        default=[100, 500, 1000, 2000],
                        help="budgets the printed table samples")
    parser.add_argument("--est_samples", type=int, default=32,
                        help="nes/spsa probe pairs per step")
    parser.add_argument("--nes_sigma", type=float, default=1e-3)
    parser.add_argument("--spsa_delta", type=float, default=1e-2)
    parser.add_argument("--simba_eps", type=float, default=0.2)
    parser.add_argument("--simba_mode", choices=["dct", "pixel"],
                        default="dct")
    parser.add_argument("--labels_json", type=str, default=None)
    parser.add_argument("--max_batch", type=int, default=256,
                        help="image sets larger than this STREAM fixed-"
                             "shape chunks through the same compiled "
                             "history-emitting programs at constant "
                             "memory (0 = always one resident batch)")
    parser.add_argument("--output", type=str, default="query_curves.json")
    add_imagenet_val_arg(parser)
    add_model_args(parser)
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    print(f"Using device: {jax.devices()[0]}")

    paths = resolve_eval_inputs(args)
    bundle = load_bundle(args)
    logits_fn, _ = make_fns(bundle)

    max_batch = int(args.max_batch)
    if max_batch > 0 and len(paths) > max_batch:
        return _main_streamed(args, paths, bundle, logits_fn)

    x_np, kept = load_image_batch_tolerant(paths, size=bundle.input_size)
    if not kept:
        raise SystemExit("no loadable images")
    x = jnp.asarray(x_np)
    pseudo = jax.device_get(jax.jit(lambda xx: jnp.argmax(logits_fn(xx), -1))(x))
    y = jnp.asarray(resolve_labels(args.labels_json, kept, pseudo))
    if args.labels_json:
        check_label_range(np.asarray(y), n_classes_of(logits_fn, int(x.shape[1])))
    n = len(kept)

    cps = sorted(int(c) for c in args.checkpoints)
    key0 = key_from_seed(args.seed)
    header = (f"{'attack':<10} " +
              " ".join(f"q={c:<6}" for c in cps) +
              f" {'median-q':>9} {'time':>7}")
    print(f"\n{n} images; eps={float(args.eps):.5f}; max budget "
          f"{int(args.max_queries)} queries (ONE run per attack yields the "
          f"full curve)")
    print(header)
    print("-" * len(header))
    results = []
    with maybe_profile(args.profile_dir):
        for name in args.attacks:
            t0 = time.perf_counter()
            curve = query_curve(
                name, logits_fn, x, y,
                eps=float(args.eps), max_queries=int(args.max_queries),
                key=cell_key(key0, name),
                est_samples=int(args.est_samples),
                nes_sigma=float(args.nes_sigma),
                spsa_delta=float(args.spsa_delta),
                alpha=float(args.alpha),
                simba_eps=float(args.simba_eps),
                simba_mode=str(args.simba_mode),
            )
            dt = time.perf_counter() - t0
            sampled = curve_at_checkpoints(curve, cps)
            med = curve["median_queries_to_success"]
            print(f"{name:<10} " +
                  " ".join(f"{a:<8.3f}" for _, a in sampled) +
                  f" {med if med is not None else '—':>9} {dt:>6.1f}s")
            results.append(curve)

    out = Path(args.output)
    out.write_text(json.dumps({
        "count": n,
        "eps": float(args.eps),
        "max_queries": int(args.max_queries),
        "labels": "ground-truth" if args.labels_json else "pseudo",
        "curves": results,
    }, indent=2))
    print(f"\nWrote {out}")
    return 0


def _main_streamed(args, paths, bundle, logits_fn) -> int:
    """Dataset-scale curves: fixed-shape chunks through the same compiled
    history-emitting attack program (eval/streaming.py::
    stream_query_curve_hist).  The curve's two reductions (per-step
    ever-succeeded count, per-sample first-success step) stream exactly,
    so the assembled JSON matches the one-batch path for the same attack
    draws (eval/query_curves.py::assemble_curve is shared)."""
    from ..eval.query_curves import _runner, budget_to_steps, assemble_curve
    from ..eval.streaming import stream_query_curve_hist
    from .common import resolve_labels_sentinel

    n = len(paths)
    chunk = int(args.max_batch)
    labels_sent = resolve_labels_sentinel(args.labels_json, paths)
    if labels_sent is not None:
        check_label_range(labels_sent,
                          n_classes_of(logits_fn, bundle.input_size))
    pseudo_fn = jax.jit(lambda xx: jnp.argmax(logits_fn(xx), -1))
    cps = sorted(int(c) for c in args.checkpoints)
    key0 = key_from_seed(args.seed)
    header = (f"{'attack':<10} " +
              " ".join(f"q={c:<6}" for c in cps) +
              f" {'median-q':>9} {'time':>7}")
    print(f"\n{n} images STREAMED in fixed chunks of {chunk} (constant "
          f"memory); eps={float(args.eps):.5f}; max budget "
          f"{int(args.max_queries)} queries (ONE run per attack per chunk "
          f"yields the full curve)")
    print(header)
    print("-" * len(header))
    results = []
    n_loaded = n
    clean_preds: dict = {}  # per-chunk pseudo-labels, shared by attacks
    with maybe_profile(args.profile_dir):
        for name in args.attacks:
            t0 = time.perf_counter()
            steps = budget_to_steps(name, int(args.max_queries),
                                    int(args.est_samples))
            fn, per_step, init_q = _runner(
                name, logits_fn, eps=float(args.eps), steps=steps,
                est_samples=int(args.est_samples),
                nes_sigma=float(args.nes_sigma),
                spsa_delta=float(args.spsa_delta), alpha=float(args.alpha),
                simba_eps=float(args.simba_eps),
                simba_mode=str(args.simba_mode))
            raw = stream_query_curve_hist(
                jax.jit(fn), steps, paths, cell_key(key0, name),
                chunk_size=chunk, size=bundle.input_size,
                pseudo_label_fn=pseudo_fn, labels=labels_sent,
                clean_cache=clean_preds)
            curve = assemble_curve(name, raw["ever_count"], raw["count"],
                                   raw["first"], per_step=per_step,
                                   init_q=init_q, steps=steps)
            n_loaded = int(raw["count"])
            dt = time.perf_counter() - t0
            sampled = curve_at_checkpoints(curve, cps)
            med = curve["median_queries_to_success"]
            print(f"{name:<10} " +
                  " ".join(f"{a:<8.3f}" for _, a in sampled) +
                  f" {med if med is not None else '—':>9} {dt:>6.1f}s")
            results.append(curve)

    out = Path(args.output)
    out.write_text(json.dumps({
        "count": n_loaded,
        "eps": float(args.eps),
        "max_queries": int(args.max_queries),
        "labels": "ground-truth" if args.labels_json else "pseudo",
        "streamed": True,
        "max_batch": chunk,
        "curves": results,
    }, indent=2))
    print(f"\nWrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
