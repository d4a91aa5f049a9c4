"""Worst-case robust accuracy CLI (AutoAttack-lite protocol).

Beyond-reference surface: the reference reports single-attack success
rates only; this CLI runs the ensembled protocol (eval/robust_eval.py —
APGD-CE + Square + in-ball DeepFool) and reports robust accuracy over the
clean-correct subset, per eps.

    python -m ...cli.robust_eval --image_dir picture \\
        --eps_list 0.01569 0.03137 --apgd_steps 100 --square_steps 1000

eps is a traced scalar, so the whole eps sweep shares ONE compiled
program (the dynamic-eps convention of every sweep in this framework).
Labels follow the harness convention: the model's own clean predictions
serve as pseudo-labels (ImageNet ground truth is unavailable air-gapped).
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

from ..core.constants import DEFAULT_EPS_LIST
from ..core.images import load_image_batch_tolerant
from ..core.rng import key_from_seed
from ..eval.robust_eval import autoattack_lite
from .common import (add_model_args, load_bundle, make_fns, maybe_profile,
                     resolve_image_inputs, resolve_labels)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Worst-case robust accuracy (APGD + Square + DeepFool)")
    parser.add_argument("--image_dir", type=str, default=None)
    parser.add_argument("--image", type=str, default="example.jpg")
    parser.add_argument("--eps_list", type=float, nargs="+",
                        default=list(DEFAULT_EPS_LIST))
    parser.add_argument("--apgd_steps", type=int, default=100)
    parser.add_argument("--square_steps", type=int, default=1000)
    parser.add_argument("--deepfool_steps", type=int, default=30)
    parser.add_argument("--labels_json", type=str, default=None,
                        help="JSON {path-or-basename: class id} ground-truth "
                             "labels; default = pseudo-labels (clean preds)")
    parser.add_argument("--output", type=str, default="robust_eval.json")
    parser.add_argument("--plot", type=str, default=None,
                        help="write the robust-accuracy-vs-eps figure here")
    add_model_args(parser)
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    print(f"Using device: {jax.devices()[0]}")

    paths = resolve_image_inputs(args.image_dir, args.image)
    x_np, kept = load_image_batch_tolerant(paths)
    if not kept:
        raise SystemExit("no loadable images")

    bundle = load_bundle(args)
    logits_fn, _ = make_fns(bundle)

    x = jnp.asarray(x_np)
    pseudo = jax.device_get(jax.jit(lambda xx: jnp.argmax(logits_fn(xx), -1))(x))
    y = jnp.asarray(resolve_labels(args.labels_json, kept, pseudo))
    clean_correct = pseudo == np.asarray(y)
    if args.labels_json:
        print(f"clean accuracy vs ground truth: {clean_correct.mean():.3f}")

    @jax.jit
    def run(x, y, key, eps):
        res = autoattack_lite(
            logits_fn, x, y, eps=eps, key=key,
            apgd_steps=int(args.apgd_steps),
            square_steps=int(args.square_steps),
            deepfool_steps=int(args.deepfool_steps),
        )
        return (res.success, res.success_apgd, res.success_square,
                res.success_deepfool)

    key = key_from_seed(args.seed)
    rows = []
    n = len(kept)
    print(f"{n} images; arms: apgd-{args.apgd_steps} square-{args.square_steps} "
          f"deepfool-{args.deepfool_steps} (one compiled program, eps traced)")
    with maybe_profile(args.profile_dir):
        for eps in args.eps_list:
            key, sub = jax.random.split(key)
            t0 = time.perf_counter()
            succ, s_apgd, s_sq, s_df = jax.device_get(
                run(x, y, sub, jnp.float32(eps)))
            dt = time.perf_counter() - t0
            # robust accuracy over the clean-correct subset (the standard
            # protocol; with pseudo-labels every sample is clean-correct)
            n_cc = max(1, int(clean_correct.sum()))
            robust_acc = float((clean_correct & ~succ).sum()) / n_cc
            print(f"eps={float(eps):.5f}: robust_acc={robust_acc:.3f} "
                  f"(apgd {int(s_apgd.sum())}/{n}, square {int(s_sq.sum())}/{n}, "
                  f"deepfool-in-ball {int(s_df.sum())}/{n})  [{dt:.1f}s]")
            rows.append({
                "eps": float(eps),
                "robust_accuracy": robust_acc,
                "success_apgd": int(s_apgd.sum()),
                "success_square": int(s_sq.sum()),
                "success_deepfool": int(s_df.sum()),
                "count": n,
            })

    out = Path(args.output)
    out.write_text(json.dumps({
        "apgd_steps": int(args.apgd_steps),
        "square_steps": int(args.square_steps),
        "deepfool_steps": int(args.deepfool_steps),
        "results": rows,
    }, indent=2))
    print(f"Wrote {out}")
    if args.plot:
        from ..viz.plots import plot_robust_accuracy

        plot_robust_accuracy(rows, Path(args.plot))
        print(f"Wrote {args.plot}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
