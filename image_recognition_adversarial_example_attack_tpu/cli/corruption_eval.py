"""Common-corruption robustness CLI (ImageNet-C-style benchmark).

Beyond-reference surface: the reference measures adversarial robustness
only; this CLI adds the standard companion axis — top-1 accuracy under
the common-corruption bank (eval/corruptions.py; Hendrycks & Dietterich,
ICLR 2019) at severities 1..5:

    python -m ...cli.corruption_eval --image_dir picture \\
        --corruptions gaussian_noise fog jpeg_compression --severities 1 3 5

TPU-native structure: each corruption is ONE compiled program with
severity and PRNG key traced — the 5-severity sweep re-enters the same
executable (the dynamic-eps convention used by every sweep here, which
matters at 20s+ per remote compile).  Image sets larger than
``--max_batch`` stream through the program in fixed-shape chunks at
constant memory (eval/streaming.py::stream_correctness_cell).

Labels follow the harness convention: the model's own clean predictions
serve as pseudo-labels unless ``--labels_json`` supplies ground truth
(with the UNLABELED=-1 sentinel for partially labeled sets).  Reported
per cell: top-1 accuracy over all decodable images.  Summary: per-
corruption error (mean over severities), mean corruption accuracy/error
across the bank, and the retained-accuracy ratio vs clean.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..core.images import load_image_batch_tolerant
from ..core.rng import key_from_seed
from ..eval.corruptions import CORRUPTION_NAMES, make_corruption_run
from .common import (add_model_args, cell_key, check_label_range, load_bundle,
                     make_fns, maybe_profile, n_classes_of, positive_int,
                     add_imagenet_val_arg,
                     resolve_eval_inputs, resolve_labels,
                     resolve_labels_sentinel)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Top-1 accuracy under common corruptions "
                    "(ImageNet-C-style bank, severities 1..5)")
    parser.add_argument("--image_dir", type=str, default=None)
    parser.add_argument("--image", type=str, default="example.jpg")
    parser.add_argument("--corruptions", type=str, nargs="+", default=["all"],
                        help="corruption names from the bank, or 'all' "
                             f"(choices: {', '.join(CORRUPTION_NAMES)})")
    parser.add_argument("--severities", type=int, nargs="+",
                        default=[1, 2, 3, 4, 5],
                        help="severity levels to sweep (1..5)")
    parser.add_argument("--labels_json", type=str, default=None,
                        help="JSON {path-or-basename: class id} ground-truth "
                             "labels; default = pseudo-labels (clean preds)")
    parser.add_argument("--max_batch", type=positive_int, default=256,
                        help="device batch cap: larger image sets stream "
                             "through the compiled program in fixed-shape "
                             "chunks at constant memory")
    parser.add_argument("--output", type=str, default="corruption_eval.json")
    parser.add_argument("--plot", type=str, default=None,
                        help="write the corruption x severity accuracy "
                             "heatmap here")
    add_imagenet_val_arg(parser)
    add_model_args(parser)
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    print(f"Using device: {jax.devices()[0]}")

    names = list(CORRUPTION_NAMES) if args.corruptions == ["all"] else \
        list(dict.fromkeys(args.corruptions))
    bad = [n for n in names if n not in CORRUPTION_NAMES]
    if bad:
        raise SystemExit(f"unknown corruptions {bad}; "
                         f"choices: {', '.join(CORRUPTION_NAMES)}")
    severities = sorted(dict.fromkeys(int(s) for s in args.severities))
    if any(s < 1 or s > 5 for s in severities):
        raise SystemExit("severities must be in 1..5")

    paths = resolve_eval_inputs(args)
    bundle = load_bundle(args)
    logits_fn, _ = make_fns(bundle)
    pseudo_fn = jax.jit(lambda xx: jnp.argmax(logits_fn(xx), -1))

    streaming = len(paths) > int(args.max_batch)
    if streaming:
        labels_np = resolve_labels_sentinel(args.labels_json, paths)
        if labels_np is not None:
            check_label_range(labels_np, n_classes_of(logits_fn, 224))
        print(f"Streaming evaluation: {len(paths)} images in fixed chunks "
              f"of {args.max_batch} (constant memory)")
        # One clean prelude pass resolves pseudo-labels and clean accuracy
        # for EVERY cell: a corruption cell is only corrupt+forward, so
        # re-deriving pseudo-labels per chunk in each of the
        # |corruptions| x |severities| cells would nearly double total
        # device time.  Host memory cost: one int per image.
        from ..utils.pipeline import EvalBatchPipeline

        kept, label_rows, clean_rows = [], [], []
        pipe = EvalBatchPipeline(paths, int(args.max_batch),
                                 labels=range(len(paths)))
        for _step, x_np, idx_np, n_valid in pipe:
            pseudo = np.asarray(jax.device_get(
                pseudo_fn(jnp.asarray(x_np))))[:n_valid]
            idx = np.asarray(idx_np)[:n_valid]
            gt = (labels_np[idx] if labels_np is not None
                  else np.full(len(idx), -1, np.int64))
            y_eff = np.where(gt < 0, pseudo, gt)
            kept.extend(paths[i] for i in idx)
            label_rows.append(y_eff)
            clean_rows.append(pseudo == y_eff)
        if not kept:
            raise SystemExit("no loadable images")
        resolved_labels = np.concatenate(label_rows)
        clean_correct = np.concatenate(clean_rows)
        x = y = None
    else:
        x_np, kept = load_image_batch_tolerant(paths, size=bundle.input_size)
        if not kept:
            raise SystemExit("no loadable images")
        x = jnp.asarray(x_np)
        pseudo = np.asarray(jax.device_get(pseudo_fn(x)))
        y_np = resolve_labels(args.labels_json, kept, pseudo)
        if args.labels_json:
            check_label_range(y_np, n_classes_of(logits_fn, int(x.shape[1])))
        y = jnp.asarray(y_np)
        clean_correct = pseudo == np.asarray(y_np)

    key = key_from_seed(args.seed)
    n_imgs = len(kept)
    print(f"{n_imgs} images; {len(names)} corruptions x severities "
          f"{severities} (one compiled program per corruption, severity "
          f"traced)")

    cells: dict[str, dict[str, float]] = {}
    matrix = np.zeros((len(names), len(severities)), np.float64)
    with maybe_profile(args.profile_dir):
        for ci, name in enumerate(names):
            run = jax.jit(make_corruption_run(logits_fn, name))
            row: dict[str, float] = {}
            t0 = time.perf_counter()
            for si, sev in enumerate(severities):
                # key depends only on (seed, corruption NAME, severity) —
                # never on grid position, so a narrowed re-run reproduces
                # the full run's cells (the cell_key convention)
                sub = jax.random.fold_in(cell_key(key, name), sev)
                if streaming:
                    from ..eval.streaming import stream_correctness_cell

                    got = stream_correctness_cell(
                        run, kept, sub, sev, chunk_size=int(args.max_batch),
                        labels=resolved_labels)
                    correct = got["correct"]
                else:
                    correct = np.asarray(jax.device_get(
                        run(x, y, jnp.int32(sev), sub)))
                acc = float(np.mean(correct)) if len(correct) else 0.0
                row[f"s{sev}"] = acc
                matrix[ci, si] = acc
            dt = time.perf_counter() - t0
            cells[name] = row
            accs = " ".join(f"{row[f's{s}']:.3f}" for s in severities)
            print(f"{name:>18s}: {accs}  "
                  f"(err {1.0 - float(np.mean(list(row.values()))):.3f}, "
                  f"{dt:.1f}s)")

    clean_acc = float(np.mean(clean_correct)) if len(clean_correct) else 0.0
    mean_acc = float(matrix.mean()) if matrix.size else 0.0
    retained = mean_acc / clean_acc if clean_acc > 0 else 0.0
    print(f"\nclean accuracy: {clean_acc:.3f}")
    print(f"mean corruption accuracy: {mean_acc:.3f} "
          f"(mean corruption error {1.0 - mean_acc:.3f}, "
          f"retained {retained:.3f} of clean)")

    report = {
        "model": args.model,
        "n_images": int(n_imgs),
        "label_source": "ground_truth" if args.labels_json else "pseudo",
        "severities": severities,
        "clean_accuracy": clean_acc,
        "cells": cells,
        "corruption_error": {
            name: 1.0 - float(np.mean(list(row.values())))
            for name, row in cells.items()
        },
        "mean_corruption_accuracy": mean_acc,
        "mean_corruption_error": 1.0 - mean_acc,
        "retained_accuracy": retained,
    }
    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    print(f"report written to {out}")

    if args.plot:
        from ..viz.plots import plot_corruption_heatmap

        plot_corruption_heatmap(matrix, names, severities, clean_acc,
                                Path(args.plot))
        print(f"heatmap written to {args.plot}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
