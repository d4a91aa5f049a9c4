"""Detector-comparison CLI: ROC analysis across detector families.

Beyond-reference surface (the reference evaluates its single detector
only through fixed-threshold grid counters, defense_experiments.py:
579-646): craft adversarial batches per attack, score them with EVERY
selected detector, and report threshold-free AUC plus operating points —
the standard way to compare adversarial detectors (Lee et al. 2018,
Xu et al. 2018 both report ROC/AUC).

    python -m ...cli.detector_eval --image_dir picture \\
        --attacks fgsm pgd cw --eps 0.03137 \\
        --detectors feature squeezing mahalanobis

One compiled program per attack (shared by all detectors), one stacked
[2B] scoring call per (attack, detector); results as a fixed-width table
+ JSON.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..attacks.api import AttackParams, run_attack
from ..core.rng import key_from_seed
from ..defenses.detector import (feature_score, squeezing_score,
                                 threshold_from_scores)
from ..eval.detector_eval import evaluate_detector_cell, summary_table
from .common import (add_extended_attack_args, add_model_args, cell_key,
                     cell_rng_id, extended_attack_kwargs, load_bundle,
                     make_fns, maybe_profile, n_classes_of,
                     resolve_image_inputs)

DETECTOR_CHOICES = ["feature", "squeezing", "mahalanobis"]


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="ROC comparison of adversarial detectors")
    parser.add_argument("--image_dir", type=str, default=None)
    parser.add_argument("--image", type=str, default="example.jpg")
    parser.add_argument("--attacks", type=str, nargs="+",
                        default=["fgsm", "pgd", "cw"],
                        choices=["fgsm", "pgd", "pgd_l2", "cw", "mifgsm",
                                 "dim", "tim", "apgd", "square", "deepfool",
                                 "nes", "spsa", "hsja", "ead", "apgd_dlr",
                                 "apgd_t", "fab", "stadv", "boundary",
                                 "simba", "jsma", "pgd_l1", "spatial"])
    parser.add_argument("--eps", type=float, default=0.03137)
    parser.add_argument("--alpha", type=float, default=0.00784)
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--cw_c", type=float, default=1.0)
    parser.add_argument("--cw_kappa", type=float, default=0.0)
    parser.add_argument("--cw_steps", type=int, default=100)
    parser.add_argument("--cw_lr", type=float, default=0.01)
    parser.add_argument("--square_steps", type=int, default=1000)
    add_extended_attack_args(parser)
    parser.add_argument("--detectors", type=str, nargs="+",
                        default=list(DETECTOR_CHOICES),
                        choices=DETECTOR_CHOICES)
    parser.add_argument("--quantile", type=float, default=0.95,
                        help="clean-score quantile for the calibrated "
                             "operating point")
    parser.add_argument("--max_batch", type=int, default=256,
                        help="image sets larger than this STREAM fixed-"
                             "shape chunks through the same compiled "
                             "attack/score programs at constant memory "
                             "(0 = always one resident batch)")
    parser.add_argument("--output_json", type=str, default=None)
    add_model_args(parser)
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    image_paths = resolve_image_inputs(args.image_dir, args.image)
    print(f"Evaluating detectors on {len(image_paths)} images")
    print(f"Using device: {jax.devices()[0]}")

    bundle = load_bundle(args)
    logits_fn, features_fn = make_fns(bundle)

    max_batch = int(args.max_batch)
    if max_batch > 0 and len(image_paths) > max_batch:
        return _main_streamed(args, image_paths, bundle, logits_fn,
                              features_fn)

    from ..core.images import load_image_batch_tolerant

    x_np, image_paths = load_image_batch_tolerant(image_paths, size=bundle.input_size)
    x = jnp.asarray(x_np)
    pseudo_fn = jax.jit(lambda xx: jnp.argmax(logits_fn(xx), -1))
    y = pseudo_fn(x)

    # --- calibrate every detector ONCE on the clean batch ---
    score_fns: dict = {}
    thresholds: dict = {}
    for det in args.detectors:
        if det == "feature":
            score_fns[det] = lambda xx: feature_score(features_fn, xx)
            scores = jax.jit(score_fns[det])(x)
            thresholds[det] = threshold_from_scores(scores, args.quantile)
        elif det == "squeezing":
            score_fns[det] = lambda xx: squeezing_score(logits_fn, xx)
            scores = jax.jit(score_fns[det])(x)
            thresholds[det] = float(jnp.quantile(scores, args.quantile))
        else:  # mahalanobis
            from ..defenses.mahalanobis import (calibrate_mahalanobis,
                                                mahalanobis_score)

            params, thr = calibrate_mahalanobis(
                features_fn, x, y, n_classes_of(logits_fn, int(x.shape[1])),
                n=x.shape[0], quantile=args.quantile)
            score_fns[det] = (
                lambda xx, _p=params: mahalanobis_score(features_fn, xx, _p))
            thresholds[det] = thr
        print(f"  {det}: threshold={thresholds[det]:.4f} "
              f"(q={args.quantile})")

    base_params = AttackParams(
        eps=float(args.eps), alpha=float(args.alpha), steps=int(args.steps),
        cw_c=float(args.cw_c), cw_kappa=float(args.cw_kappa),
        cw_steps=int(args.cw_steps), cw_lr=float(args.cw_lr),
        square_steps=int(args.square_steps),
        **extended_attack_kwargs(args),
    )
    key0 = key_from_seed(args.seed)

    results = []
    with maybe_profile(args.profile_dir):
        for attack_name in args.attacks:
            print(f"\nCrafting {attack_name.upper()} (eps={args.eps:.5f})...")
            sub = cell_key(key0, cell_rng_id(attack_name, float(args.eps)))
            atk = jax.jit(lambda xx, yy, kk, a=attack_name: run_attack(
                a, logits_fn, xx, yy, base_params, key=kk))
            x_adv = atk(x, y, sub)
            asr = float(jnp.mean((jnp.argmax(logits_fn(x_adv), -1) != y)
                                 .astype(jnp.float32)))
            print(f"  attack success rate: {asr:.3f}")
            for det in args.detectors:
                r = evaluate_detector_cell(
                    score_fns[det], x, x_adv, thresholds[det],
                    detector=det, attack=attack_name)
                results.append(r)
                print(f"  {det}: AUC={r.auc:.3f} "
                      f"TPR@thr={r.tpr_at_threshold:.3f} "
                      f"TPR@5%FPR={r.tpr_at_fpr05:.3f}")

    print("\n" + "=" * 62)
    print("DETECTOR COMPARISON")
    print("=" * 62)
    print(summary_table(results))

    if args.output_json:
        out = Path(args.output_json)
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps(
            [dataclasses.asdict(r) for r in results], indent=2))
        print(f"\nWrote {out}")
    return 0


def _build_score_fns(args, logits_fn, features_fn, x_cal, y_cal):
    """Jitted detector score programs.  Mahalanobis Gaussians are FIT on
    the calibration batch (x_cal, y_cal) — in streamed mode the first
    chunk, the standard small-calibration-set deployment of Lee et al.
    2018; feature/squeezing scores are parameter-free."""
    from ..defenses.detector import feature_score, squeezing_score

    score_fns: dict = {}
    for det in args.detectors:
        if det == "feature":
            score_fns[det] = jax.jit(
                lambda xx: feature_score(features_fn, xx))
        elif det == "squeezing":
            score_fns[det] = jax.jit(
                lambda xx: squeezing_score(logits_fn, xx))
        else:  # mahalanobis
            from ..defenses.mahalanobis import (calibrate_mahalanobis,
                                                mahalanobis_score)

            params, _ = calibrate_mahalanobis(
                features_fn, x_cal, y_cal,
                n_classes_of(logits_fn, int(x_cal.shape[1])),
                n=x_cal.shape[0], quantile=args.quantile)
            score_fns[det] = jax.jit(
                lambda xx, _p=params: mahalanobis_score(features_fn, xx, _p))
    return score_fns


def _main_streamed(args, image_paths, bundle, logits_fn,
                   features_fn) -> int:
    """Dataset-scale detector comparison, streamed at constant memory.

    Two passes of fixed-shape chunks through the same compiled programs:
    (1) clean scores for every detector over the FULL set (thresholds
    then come from full-set quantiles — the exact statistic the one-batch
    path computes, now over all N instead of an in-RAM cap); (2) per
    attack, craft + score chunks (eval/streaming.py::
    stream_detector_scores).  ROC arithmetic runs on the concatenated
    host vectors — identical to the one-batch path's.  Mahalanobis
    Gaussians fit on the first chunk (its calibration set)."""
    from ..core.images import load_image_batch_tolerant
    from ..defenses.detector import threshold_from_scores
    from ..eval.detector_eval import cell_from_scores
    from ..eval.streaming import stream_clean_scores, stream_detector_scores

    chunk = int(args.max_batch)
    print(f"({len(image_paths)} images exceed --max_batch {chunk}: "
          f"STREAMING fixed chunks at constant memory)")
    pseudo_fn = jax.jit(lambda xx: jnp.argmax(logits_fn(xx), -1))

    # Mahalanobis calibration set = the first DECODABLE chunk; decoded
    # ONCE — its clean scores are computed here (padded to the compiled
    # chunk shape) and the streaming pass covers only the remaining paths.
    # load_image_batch_tolerant raises ValueError on an all-unreadable
    # chunk, so scan forward until one chunk survives (unreadable files
    # drop tolerantly everywhere else too).
    x_cal_np, cal_end = None, 0
    for off in range(0, len(image_paths), chunk):
        try:
            x_cal_np, _ = load_image_batch_tolerant(
                image_paths[off:off + chunk], size=bundle.input_size)
            cal_end = off + chunk
            break
        except ValueError:
            continue
    if x_cal_np is None:
        raise SystemExit("no loadable images")
    n0 = x_cal_np.shape[0]
    x_cal = jnp.asarray(x_cal_np)
    score_fns = _build_score_fns(args, logits_fn, features_fn,
                                 x_cal, pseudo_fn(x_cal))

    pad = chunk - n0
    x0 = (jnp.concatenate([x_cal, jnp.zeros((pad,) + x_cal.shape[1:],
                                            x_cal.dtype)]) if pad else x_cal)
    clean0 = {det: np.asarray(jax.device_get(fn(x0)), np.float64)[:n0]
              for det, fn in score_fns.items()}
    rest_paths = image_paths[cal_end:]
    if rest_paths:
        try:
            rest = stream_clean_scores(score_fns, rest_paths,
                                       chunk_size=chunk,
                                       size=bundle.input_size)
        except SystemExit:
            # every remaining file unreadable: score what the first chunk has
            rest = {det: np.empty(0, np.float64) for det in score_fns}
    else:
        # calibration chunk was the LAST chunk (earlier ones unreadable):
        # nothing left to stream — EvalBatchPipeline rejects an empty set
        rest = {det: np.empty(0, np.float64) for det in score_fns}
    clean = {det: np.concatenate([clean0[det], rest[det]])
             for det in score_fns}
    thresholds: dict = {}
    for det in args.detectors:
        if det == "feature":
            thresholds[det] = threshold_from_scores(
                jnp.asarray(clean[det]), args.quantile)
        else:
            thresholds[det] = float(np.quantile(clean[det], args.quantile))
        print(f"  {det}: threshold={thresholds[det]:.4f} "
              f"(q={args.quantile}, calibrated on all "
              f"{clean[det].shape[0]} clean scores)")

    base_params = AttackParams(
        eps=float(args.eps), alpha=float(args.alpha), steps=int(args.steps),
        cw_c=float(args.cw_c), cw_kappa=float(args.cw_kappa),
        cw_steps=int(args.cw_steps), cw_lr=float(args.cw_lr),
        square_steps=int(args.square_steps),
        **extended_attack_kwargs(args),
    )
    key0 = key_from_seed(args.seed)

    results = []
    clean_preds: dict = {}  # per-chunk clean predictions, shared by attacks
    with maybe_profile(args.profile_dir):
        for attack_name in args.attacks:
            print(f"\nCrafting {attack_name.upper()} (eps={args.eps:.5f}, "
                  f"streamed)...")
            sub = cell_key(key0, cell_rng_id(attack_name, float(args.eps)))
            atk = jax.jit(lambda xx, yy, kk, a=attack_name: run_attack(
                a, logits_fn, xx, yy, base_params, key=kk))
            got = stream_detector_scores(
                atk, score_fns, pseudo_fn, image_paths, sub,
                chunk_size=chunk, size=bundle.input_size,
                clean_cache=clean_preds)
            asr = float(np.mean(got["succ"]))
            print(f"  attack success rate: {asr:.3f} "
                  f"({got['count']} images)")
            for det in args.detectors:
                r = cell_from_scores(
                    clean[det], got["adv"][det], thresholds[det],
                    detector=det, attack=attack_name)
                results.append(r)
                print(f"  {det}: AUC={r.auc:.3f} "
                      f"TPR@thr={r.tpr_at_threshold:.3f} "
                      f"TPR@5%FPR={r.tpr_at_fpr05:.3f}")

    print("\n" + "=" * 62)
    print("DETECTOR COMPARISON")
    print("=" * 62)
    print(summary_table(results))

    if args.output_json:
        out = Path(args.output_json)
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps(
            [dataclasses.asdict(r) for r in results], indent=2))
        print(f"\nWrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
