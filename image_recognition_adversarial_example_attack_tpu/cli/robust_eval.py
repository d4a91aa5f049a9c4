"""Worst-case robust accuracy CLI (AutoAttack protocols).

Beyond-reference surface: the reference reports single-attack success
rates only (and ships the ``autoattack`` dependency without running it —
defense_experiments.py:685); this CLI runs the ensembled protocol
(eval/robust_eval.py) and reports robust accuracy over the clean-correct
subset, per eps.

``--protocol standard`` is the full AutoAttack composition: APGD-CE +
APGD-T (targeted DLR over top-K classes) + FAB-T (minimal-norm, counted
in-ball) + Square.  ``--protocol lite`` (default: cheap sweeps) is
APGD-CE + Square + in-ball DeepFool.

    python -m ...cli.robust_eval --image_dir picture --protocol standard \\
        --eps_list 0.01569 0.03137 --apgd_steps 100 --square_steps 5000

eps is a traced scalar, so the whole eps sweep shares ONE compiled
program (the dynamic-eps convention of every sweep in this framework).
Labels follow the harness convention: the model's own clean predictions
serve as pseudo-labels (ImageNet ground truth is unavailable air-gapped);
``--labels_json`` supplies ground truth.
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
from ..eval.robust_eval import autoattack, autoattack_lite
from .common import (add_imagenet_val_arg, add_model_args,
                     check_label_range, load_bundle,
                     make_fns, maybe_profile, n_classes_of,
                     resolve_eval_inputs, resolve_labels,
                     resolve_labels_sentinel)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Worst-case robust accuracy (APGD + Square + DeepFool)")
    parser.add_argument("--image_dir", type=str, default=None)
    parser.add_argument("--image", type=str, default="example.jpg")
    parser.add_argument("--cifar10_dir", type=str, default=None,
                        help="evaluate on a standard CIFAR-10 archive "
                             "(core/datasets.py) with REAL labels — the "
                             "RobustBench-style flow for checkpoints from "
                             "adversarial_train --cifar10_dir; overrides "
                             "--image_dir/--image")
    parser.add_argument("--cifar10_split", type=str, default="test",
                        choices=["train", "test"])
    parser.add_argument("--cifar10_n", type=int, default=1000,
                        help="cap on evaluated CIFAR images (0 = all)")
    parser.add_argument("--eps_list", type=float, nargs="+",
                        default=list(DEFAULT_EPS_LIST))
    parser.add_argument("--protocol", type=str, default="lite",
                        choices=["lite", "standard", "rand"],
                        help="standard: full AutoAttack (APGD-CE + APGD-T "
                             "+ FAB-T + Square); lite: APGD-CE + Square + "
                             "in-ball DeepFool; rand: the randomized-"
                             "defense protocol (EOT-APGD-CE + EOT-APGD-DLR "
                             "+ Square on the expected classifier)")
    parser.add_argument("--eot_samples", type=int, default=20,
                        help="(rand protocol) Monte-Carlo transform draws "
                             "per EOT gradient / expected prediction")
    parser.add_argument("--eot_sigma", type=float, default=0.25,
                        help="(rand protocol) Gaussian-noise transform "
                             "sigma — the randomized-smoothing setting")
    parser.add_argument("--norm", type=str, default="linf",
                        choices=["linf", "l2"],
                        help="threat-model ball: L-inf (reference "
                             "convention) or L2 (AutoAttack-L2: APGD-L2, "
                             "FAB-L2, Square-L2)")
    parser.add_argument("--apgd_steps", type=int, default=100)
    parser.add_argument("--square_steps", type=int, default=1000)
    parser.add_argument("--deepfool_steps", type=int, default=30,
                        help="(lite protocol)")
    parser.add_argument("--fab_steps", type=int, default=100,
                        help="(standard protocol)")
    parser.add_argument("--n_target_classes", type=int, default=9,
                        help="APGD-T / FAB-T restarts over the top-K "
                             "runner-up classes (standard protocol)")
    parser.add_argument("--labels_json", type=str, default=None,
                        help="JSON {path-or-basename: class id} ground-truth "
                             "labels; default = pseudo-labels (clean preds)")
    parser.add_argument("--max_batch", type=int, default=256,
                        help="device batch cap: image sets larger than this "
                             "stream through the compiled ensemble program in "
                             "fixed-shape chunks at constant memory (0 = "
                             "always one resident batch)")
    parser.add_argument("--output", type=str, default="robust_eval.json")
    parser.add_argument("--save_adv_dir", type=str, default=None,
                        help="save each image's per-sample WORST-CASE "
                             "adversarial example (first successful arm in "
                             "protocol order) as PNGs here, one subdir per "
                             "eps; one-resident-batch mode only (ignored "
                             "with a streaming-size image set)")
    parser.add_argument("--plot", type=str, default=None,
                        help="write the robust-accuracy-vs-eps figure here")
    add_imagenet_val_arg(parser)
    add_model_args(parser)
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    print(f"Using device: {jax.devices()[0]}")

    cifar = args.cifar10_dir is not None
    if cifar and getattr(args, "imagenet_val_dir", None):
        # the data planes are mutually exclusive; fail fast instead of
        # silently evaluating CIFAR while the user asked for ImageNet-val
        raise SystemExit("pass at most one of --imagenet_val_dir / "
                         "--cifar10_dir")
    if cifar:
        from ..core.datasets import load_cifar10

        x_all, y_all = load_cifar10(args.cifar10_dir,
                                    split=args.cifar10_split)
        if int(args.cifar10_n) > 0:
            x_all = x_all[: int(args.cifar10_n)]
            y_all = y_all[: int(args.cifar10_n)]
        paths = [f"cifar10_{args.cifar10_split}_{i:05d}"
                 for i in range(len(y_all))]
    else:
        paths = resolve_eval_inputs(args)
    bundle = load_bundle(args)
    if cifar and bundle.input_size != 32:
        raise SystemExit(f"--cifar10_dir is 32x32 data but --model "
                         f"{args.model} expects {bundle.input_size}x"
                         f"{bundle.input_size}; use the CIFAR family "
                         "(wrn28_10/wrn34_10/preact_resnet18)")
    logits_fn, _ = make_fns(bundle)
    pseudo_fn = jax.jit(lambda xx: jnp.argmax(logits_fn(xx), -1))

    max_batch = int(args.max_batch)
    streaming = (not cifar) and max_batch > 0 and len(paths) > max_batch
    if cifar:
        kept = paths
        check_label_range(np.asarray(y_all), n_classes_of(logits_fn, 32))
        x = jnp.asarray(x_all)
        y = jnp.asarray(y_all)
        pseudo = jax.device_get(pseudo_fn(x))
        clean_correct = pseudo == np.asarray(y_all)
        print(f"clean accuracy vs CIFAR-10 {args.cifar10_split} labels: "
              f"{clean_correct.mean():.3f}")
    elif streaming:
        kept = list(paths)  # per-chunk decode handles failures
        x = y = None
        clean_correct = None
        # ground truth with the shared UNLABELED sentinel, replaced per
        # chunk by that image's pseudo-label (resolve_labels convention)
        labels_np = resolve_labels_sentinel(args.labels_json, kept)
        if labels_np is not None:
            check_label_range(labels_np, n_classes_of(logits_fn, 224))
        print(f"Streaming evaluation: {len(paths)} images in fixed chunks "
              f"of {max_batch} (constant memory)")
    else:
        x_np, kept = load_image_batch_tolerant(paths, size=bundle.input_size)
        if not kept:
            raise SystemExit("no loadable images")
        x = jnp.asarray(x_np)
        pseudo = jax.device_get(pseudo_fn(x))
        y = jnp.asarray(resolve_labels(args.labels_json, kept, pseudo))
        if args.labels_json:
            check_label_range(np.asarray(y),
                              n_classes_of(logits_fn, int(x.shape[1])))
        clean_correct = pseudo == np.asarray(y)
        if args.labels_json:
            print(f"clean accuracy vs ground truth: {clean_correct.mean():.3f}")

    standard = args.protocol == "standard"
    save_adv = args.save_adv_dir is not None and not streaming
    if args.save_adv_dir is not None and streaming:
        print("(--save_adv_dir ignored: streaming mode keeps x_adv "
              "on-device per chunk; rerun with --max_batch 0 to save)")
    if args.protocol == "rand":
        from ..eval.robust_eval import autoattack_rand

        arm_names = ("apgd_ce_eot", "apgd_dlr_eot", "square")

        @jax.jit
        def run(x, y, key, eps):
            res = autoattack_rand(
                logits_fn, x, y, eps=eps, key=key,
                eot_samples=int(args.eot_samples),
                sigma=float(args.eot_sigma),
                apgd_steps=int(args.apgd_steps),
                square_steps=int(args.square_steps),
                norm=args.norm,
            )
            masks = (res.success, res.success_apgd_ce,
                     res.success_apgd_dlr, res.success_square)
            return masks + (res.x_adv,) if save_adv else masks

        arm_desc = (f"eot{args.eot_samples}@sigma{args.eot_sigma} "
                    f"apgd-ce-{args.apgd_steps} apgd-dlr-{args.apgd_steps} "
                    f"square-{args.square_steps}")
    elif standard:
        arm_names = ("apgd_ce", "apgd_t", "fab", "square")

        @jax.jit
        def run(x, y, key, eps):
            res = autoattack(
                logits_fn, x, y, eps=eps, key=key,
                apgd_steps=int(args.apgd_steps),
                apgd_t_steps=int(args.apgd_steps),
                apgd_t_targets=int(args.n_target_classes),
                fab_steps=int(args.fab_steps),
                fab_targets=int(args.n_target_classes),
                square_steps=int(args.square_steps),
                norm=args.norm,
            )
            masks = (res.success, res.success_apgd_ce, res.success_apgd_t,
                     res.success_fab, res.success_square)
            return masks + (res.x_adv,) if save_adv else masks

        arm_desc = (f"apgd-ce-{args.apgd_steps} "
                    f"apgd-t-{args.apgd_steps}x{args.n_target_classes} "
                    f"fab-t-{args.fab_steps}x{args.n_target_classes} "
                    + f"square-{args.square_steps}")
    else:
        arm_names = ("apgd", "square", "deepfool")

        @jax.jit
        def run(x, y, key, eps):
            res = autoattack_lite(
                logits_fn, x, y, eps=eps, key=key,
                apgd_steps=int(args.apgd_steps),
                square_steps=int(args.square_steps),
                deepfool_steps=int(args.deepfool_steps),
                norm=args.norm,
            )
            masks = (res.success, res.success_apgd, res.success_square,
                     res.success_deepfool)
            return masks + (res.x_adv,) if save_adv else masks

        arm_desc = (f"apgd-{args.apgd_steps} square-{args.square_steps} "
                    f"deepfool-{args.deepfool_steps}")

    key = key_from_seed(args.seed)
    rows = []
    n = len(kept)
    print(f"{n} images; protocol={args.protocol}; norm={args.norm}; "
          f"arms: {arm_desc} (one compiled program, eps traced)")
    clean_preds: dict = {}  # per-chunk pseudo-labels, shared across eps
    with maybe_profile(args.profile_dir):
        for eps in args.eps_list:
            key, sub = jax.random.split(key)
            t0 = time.perf_counter()
            if streaming:
                from ..eval.streaming import stream_robust_cell

                got = stream_robust_cell(
                    run, kept, sub, float(eps), chunk_size=max_batch,
                    pseudo_label_fn=pseudo_fn, labels=labels_np,
                    clean_cache=clean_preds,
                )
                if not got:  # every chunk dropped: nothing decoded
                    raise SystemExit("no loadable images")
                succ = got["arm0"]
                arms = [got[f"arm{i + 1}"] for i in range(len(arm_names))]
                cc = got["clean_correct"]
                n = len(succ)
            else:
                outs = jax.device_get(run(x, y, sub, jnp.float32(eps)))
                if save_adv:
                    *outs, x_adv_np = outs
                    from ..core.images import save_image_01

                    adv_dir = Path(args.save_adv_dir) / f"eps_{float(eps):.5f}"
                    # index prefix: distinct sources with equal stems
                    # (a.jpg vs a.png) must not overwrite each other
                    for i, (img, p) in enumerate(zip(np.asarray(x_adv_np),
                                                     kept)):
                        save_image_01(
                            img, adv_dir / f"adv_{i:04d}_{Path(p).stem}.png")
                    print(f"  saved {len(kept)} worst-case examples to {adv_dir}")
                succ, arms = outs[0], list(outs[1:])
                cc = clean_correct
            dt = time.perf_counter() - t0
            # robust accuracy over the clean-correct subset (the standard
            # protocol; with pseudo-labels every sample is clean-correct)
            n_cc = max(1, int(cc.sum()))
            robust_acc = float((cc & ~succ).sum()) / n_cc
            per_arm = " ".join(f"{nm} {int(v.sum())}/{n}"
                               for nm, v in zip(arm_names, arms))
            print(f"eps={float(eps):.5f}: robust_acc={robust_acc:.3f} "
                  f"({per_arm})  [{dt:.1f}s]")
            row = {
                "eps": float(eps),
                "robust_accuracy": robust_acc,
                "count": n,
            }
            for nm, v in zip(arm_names, arms):
                row[f"success_{nm}"] = int(v.sum())
            rows.append(row)

    out = Path(args.output)
    out.write_text(json.dumps({
        "protocol": args.protocol,
        "norm": args.norm,
        "eot_samples": int(args.eot_samples),
        "eot_sigma": float(args.eot_sigma),
        "apgd_steps": int(args.apgd_steps),
        "square_steps": int(args.square_steps),
        "deepfool_steps": int(args.deepfool_steps),
        "fab_steps": int(args.fab_steps),
        "n_target_classes": int(args.n_target_classes),
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
