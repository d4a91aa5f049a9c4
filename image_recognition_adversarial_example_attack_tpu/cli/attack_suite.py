"""Zoo-wide attack comparison: every attack on one batch, one table.

Beyond-reference surface: the reference's deep-dive compares its 3
attacks on ONE image (visualized_attacks.py); this CLI runs any subset
of the 20+-attack zoo over a whole image batch and reports, per attack,
the success rate, wall time, and distortion profile (L∞ / mean-L2 /
changed-feature % / SSIM / PSNR) — the standard "attack benchmark" table
of the adversarial-robustness literature, as one compiled program per
attack.

    python -m ...cli.attack_suite --image_dir picture \\
        --attacks fgsm pgd cw deepfool square jsma --eps 0.03137

TPU design: each attack is ONE jitted program over the batch (compile
time reported separately from steady-state by running the program
twice with the same key — deterministic attacks return bitwise-equal
results, so the second call measures pure device time).  The distortion
metrics for every attack share one compiled metrics program.
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

from ..attacks.api import AttackParams, run_attack
from ..core.constants import DEFAULT_ALPHA, DEFAULT_EPS, DEFAULT_STEPS
from ..core.images import load_image_batch_tolerant
from ..core.rng import key_from_seed
from ..eval.metrics import expected_calibration_error, psnr, ssim
from .common import (add_imagenet_val_arg,
                     add_extended_attack_args, add_model_args,
                     cell_key, check_label_range, extended_attack_kwargs,
                     load_bundle, make_fns, maybe_profile, n_classes_of,
                     resolve_eval_inputs, resolve_labels)

ALL_ATTACKS = ("fgsm", "pgd", "pgd_l2", "mifgsm", "dim", "tim", "apgd",
               "apgd_dlr", "apgd_t", "fab", "square", "square_l2",
               "deepfool", "cw", "ead", "nes", "spsa", "bandits", "hsja", "boundary",
               "simba", "stadv", "jsma", "pgd_l1", "spatial")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Run many attacks on one batch; compare ASR + distortion")
    parser.add_argument("--image_dir", type=str, default=None)
    parser.add_argument("--image", type=str, default="example.jpg")
    parser.add_argument("--attacks", type=str, nargs="+",
                        default=["fgsm", "pgd", "cw"],
                        choices=list(ALL_ATTACKS) + ["all"],
                        help="'all' expands to the full zoo")
    parser.add_argument("--eps", type=float, default=DEFAULT_EPS)
    parser.add_argument("--alpha", type=float, default=DEFAULT_ALPHA)
    parser.add_argument("--steps", type=int, default=DEFAULT_STEPS)
    parser.add_argument("--cw_c", type=float, default=1.0)
    parser.add_argument("--cw_kappa", type=float, default=0.0)
    parser.add_argument("--cw_steps", type=int, default=100)
    parser.add_argument("--cw_lr", type=float, default=0.01)
    parser.add_argument("--square_steps", type=int, default=1000)
    parser.add_argument("--n_target_classes", type=int, default=9)
    add_extended_attack_args(parser)
    parser.add_argument("--labels_json", type=str, default=None,
                        help="ground-truth labels (default: pseudo-labels)")
    parser.add_argument("--max_batch", type=int, default=256,
                        help="image sets larger than this STREAM fixed-"
                             "shape chunks through the same compiled "
                             "programs at constant memory (0 = always "
                             "one resident batch)")
    parser.add_argument("--output", type=str, default="attack_suite.json")
    add_imagenet_val_arg(parser)
    add_model_args(parser)
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    attacks = list(ALL_ATTACKS) if "all" in args.attacks else args.attacks
    print(f"Using device: {jax.devices()[0]}")

    paths = resolve_eval_inputs(args)
    bundle = load_bundle(args)
    logits_fn, _ = make_fns(bundle)

    max_batch = int(args.max_batch)
    if max_batch > 0 and len(paths) > max_batch:
        return _main_streamed(args, attacks, paths, bundle, logits_fn)

    x_np, kept = load_image_batch_tolerant(paths, size=bundle.input_size)
    if not kept:
        raise SystemExit("no loadable images")
    x = jnp.asarray(x_np)
    pseudo = jax.device_get(jax.jit(lambda xx: jnp.argmax(logits_fn(xx), -1))(x))
    y = jnp.asarray(resolve_labels(args.labels_json, kept, pseudo))
    if args.labels_json:
        check_label_range(np.asarray(y), n_classes_of(logits_fn, int(x.shape[1])))
    n = len(kept)

    params = _suite_params(args)

    @jax.jit
    def distortion(x_adv):
        diff = x_adv - x
        flat = diff.reshape(n, -1)
        logits_adv = logits_fn(x_adv)
        succ = jnp.argmax(logits_adv, -1) != y
        return {
            "asr": jnp.mean(succ.astype(jnp.float32)),
            "linf": jnp.max(jnp.abs(diff)),
            "l2_mean": jnp.mean(jnp.sqrt(jnp.sum(jnp.square(flat), -1))),
            "changed_pct": jnp.mean(
                (jnp.abs(flat) > 1.0 / 255.0).astype(jnp.float32)) * 100.0,
            "ssim": ssim(x, x_adv),
            "psnr": psnr(x, x_adv),
            # calibration damage: adversarial examples don't just flip
            # labels, they make the survivors over-confident (ECE vs the
            # same labels as ASR; clean baseline printed in the preamble)
            "ece": expected_calibration_error(
                jax.nn.softmax(logits_adv, -1), y),
        }

    ece_clean = float(jax.jit(lambda xx: expected_calibration_error(
        jax.nn.softmax(logits_fn(xx), -1), y))(x))

    key0 = key_from_seed(args.seed)
    header = (f"{'attack':<10} {'ASR':>6} {'L∞':>8} {'L2(mean)':>9} "
              f"{'chg%':>6} {'SSIM':>6} {'PSNR':>6} {'ECE':>6} "
              f"{'compile+run':>12} {'steady':>8}")
    print(f"\n{n} images; eps={float(args.eps):.5f}; per attack: one "
          f"compiled program (timed twice: compile+run, then steady); "
          f"clean ECE {ece_clean:.3f}")
    if not args.labels_json:
        print("NOTE: labels are the model's own pseudo-labels, so 'ECE' "
              "degenerates to a confidence-deficit (clean accuracy is 1.0 "
              "by construction) — pass --labels_json for true calibration")
    print(header)
    print("-" * len(header))
    rows = []
    with maybe_profile(args.profile_dir):
        for name in attacks:
            fn = jax.jit(lambda xx, yy, kk, _name=name: run_attack(
                _name, logits_fn, xx, yy, params, kk))
            k = cell_key(key0, name)
            t0 = time.perf_counter()
            x_adv = fn(x, y, k)
            jax.block_until_ready(x_adv)
            t1 = time.perf_counter()
            x_adv = fn(x, y, k)
            jax.block_until_ready(x_adv)
            t2 = time.perf_counter()
            m = {k2: float(v) for k2, v in
                 jax.device_get(distortion(x_adv)).items()}
            row = {"attack": name, **m,
                   "compile_run_s": round(t1 - t0, 2),
                   "steady_s": round(t2 - t1, 4)}
            rows.append(row)
            print(f"{name:<10} {m['asr']:>6.3f} {m['linf']:>8.4f} "
                  f"{m['l2_mean']:>9.3f} {m['changed_pct']:>6.2f} "
                  f"{m['ssim']:>6.3f} {m['psnr']:>6.1f} {m['ece']:>6.3f} "
                  f"{row['compile_run_s']:>10.1f}s {row['steady_s']:>7.3f}s")

    out = Path(args.output)
    out.write_text(json.dumps({
        "count": n,
        "eps": float(args.eps),
        "model": args.model,
        "labels": "ground-truth" if args.labels_json else "pseudo",
        "ece_clean": ece_clean,
        "results": rows,
    }, indent=2))
    print(f"\nWrote {out}")
    return 0


def _suite_params(args) -> AttackParams:
    return AttackParams(
        eps=float(args.eps), alpha=float(args.alpha), steps=int(args.steps),
        cw_c=float(args.cw_c), cw_kappa=float(args.cw_kappa),
        cw_steps=int(args.cw_steps), cw_lr=float(args.cw_lr),
        square_steps=int(args.square_steps),
        n_target_classes=int(args.n_target_classes),
        **extended_attack_kwargs(args),
    )


def _main_streamed(args, attacks, paths, bundle, logits_fn) -> int:
    """Dataset-scale suite table: fixed-shape chunks through the same
    compiled attack programs (eval/streaming.py::stream_suite_attack) at
    constant memory.  Every table column decomposes into per-sample
    vectors or bin sums, so streamed values match the one-batch path up
    to float summation order (exactly, for the counters)."""
    import math

    from ..eval.metrics import ece_from_conf_correct, ssim_per_sample
    from ..eval.streaming import stream_suite_attack
    from .common import resolve_labels_sentinel

    n = len(paths)
    size = bundle.input_size
    chunk = int(args.max_batch)
    labels_sent = resolve_labels_sentinel(args.labels_json, paths)
    if labels_sent is not None:
        check_label_range(labels_sent, n_classes_of(logits_fn, size))
    params = _suite_params(args)

    clean_fn = jax.jit(lambda xx: (
        jnp.argmax(logits_fn(xx), -1),
        jnp.max(jax.nn.softmax(logits_fn(xx), -1), -1)))

    @jax.jit
    def metrics_fn(xc, xa, yy):
        diff = xa - xc
        flat = diff.reshape(diff.shape[0], -1)
        logits_adv = logits_fn(xa)
        probs = jax.nn.softmax(logits_adv, -1)
        return {
            "succ": jnp.argmax(logits_adv, -1) != yy,
            "linf": jnp.max(jnp.abs(flat), -1),
            "l2": jnp.sqrt(jnp.sum(jnp.square(flat), -1)),
            "changed": jnp.mean(
                (jnp.abs(flat) > 1.0 / 255.0).astype(jnp.float32), -1),
            "ssim": ssim_per_sample(xc, xa),
            "sq_sum": jnp.sum(jnp.square(flat), -1),
            "conf": jnp.max(probs, -1),
        }

    ece_fn = jax.jit(ece_from_conf_correct)
    key0 = key_from_seed(args.seed)
    header = (f"{'attack':<10} {'ASR':>6} {'L∞':>8} {'L2(mean)':>9} "
              f"{'chg%':>6} {'SSIM':>6} {'PSNR':>6} {'ECE':>6} "
              f"{'compile+run':>12} {'steady':>8}")
    print(f"\n{n} images STREAMED in fixed chunks of {chunk} (constant "
          f"memory); eps={float(args.eps):.5f}; per attack: one compiled "
          f"program (compile+run = first chunk; steady = mean later-chunk "
          f"device time)")
    if not args.labels_json:
        print("NOTE: labels are the model's own pseudo-labels, so 'ECE' "
              "degenerates to a confidence-deficit (clean accuracy is 1.0 "
              "by construction) — pass --labels_json for true calibration")
    print(header)
    print("-" * len(header))
    rows = []
    ece_clean = None
    clean_cache: dict = {}
    with maybe_profile(args.profile_dir):
        for name in attacks:
            fn = jax.jit(lambda xx, yy, kk, _name=name: run_attack(
                _name, logits_fn, xx, yy, params, kk))
            res = stream_suite_attack(
                fn, metrics_fn, clean_fn, paths, cell_key(key0, name),
                chunk_size=chunk, size=size, labels=labels_sent,
                clean_cache=clean_cache)
            if ece_clean is None:
                ece_clean = float(ece_fn(jnp.asarray(res["clean_conf"]),
                                         jnp.asarray(res["clean_correct"])))
            mse = float(np.sum(res["sq_sum"], dtype=np.float64)) / (
                res["count"] * size * size * 3)
            m = {
                "asr": float(np.mean(res["succ"])),
                "linf": float(np.max(res["linf"])),
                "l2_mean": float(np.mean(res["l2"])),
                "changed_pct": float(np.mean(res["changed"])) * 100.0,
                "ssim": float(np.mean(res["ssim"])),
                "psnr": 100.0 if mse <= 1e-10 else -10.0 * math.log10(mse),
                "ece": float(ece_fn(
                    jnp.asarray(res["conf"]),
                    jnp.asarray(~res["succ"], jnp.float32))),
            }
            steady = res["steady_s"]  # None when only ONE chunk survived
            row = {"attack": name, **m,
                   "compile_run_s": round(res["compile_run_s"], 2),
                   "steady_s": None if steady is None else round(steady, 4)}
            rows.append(row)
            steady_txt = ("      —" if steady is None
                          else f"{steady:>7.3f}s")
            print(f"{name:<10} {m['asr']:>6.3f} {m['linf']:>8.4f} "
                  f"{m['l2_mean']:>9.3f} {m['changed_pct']:>6.2f} "
                  f"{m['ssim']:>6.3f} {m['psnr']:>6.1f} {m['ece']:>6.3f} "
                  f"{row['compile_run_s']:>10.1f}s {steady_txt}")
    print(f"clean ECE {ece_clean:.3f}")

    out = Path(args.output)
    out.write_text(json.dumps({
        # the EVALUATED count (unreadable files drop tolerantly) — same
        # convention as the one-batch path's len(kept); nargs='+' on
        # --attacks guarantees the loop ran
        "count": int(res["count"]),
        "requested": n,
        "eps": float(args.eps),
        "model": args.model,
        "labels": "ground-truth" if args.labels_json else "pseudo",
        "ece_clean": ece_clean,
        "streamed": True,
        "max_batch": chunk,
        "results": rows,
    }, indent=2))
    print(f"\nWrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
