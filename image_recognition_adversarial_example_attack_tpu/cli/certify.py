"""Randomized-smoothing certification CLI (Cohen et al., ICML 2019).

Beyond-reference capability: the reference evaluates empirical defenses
only (defense_experiments.py); this CLI produces *certified* L2 radii for
the smoothed classifier g(x) = argmax_c P(f(x + N(0, sigma^2)) = c).

    python -m ...cli.certify --image_dir picture --sigma 0.25 --n 1000

Per image it prints the smoothed prediction (or ABSTAIN) and the certified
radius, plus a JSON artifact.  The Monte-Carlo voting — the compute-heavy
part — runs as chunked [chunk*B] batched forwards in one jitted scan per
budget (defenses/smoothing.py); only the vote counts reach the host.
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

from ..core.images import load_image_batch_tolerant
from ..core.labels import load_imagenet_labels
from ..core.rng import key_from_seed
from ..defenses.smoothing import ABSTAIN, SmoothedClassifier, SmoothingConfig
from .common import (add_imagenet_val_arg,
                     add_model_args, model_input_size, load_bundle, make_fns, maybe_profile,
                     resolve_eval_inputs, resolve_labels)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Certified robustness: randomized smoothing (L2) or "
                    "interval bound propagation (L-inf)")
    parser.add_argument("--image_dir", type=str, default=None)
    parser.add_argument("--image", type=str, default="example.jpg")
    parser.add_argument("--method", type=str, default="smoothing",
                        choices=["smoothing", "ibp", "crown-ibp"],
                        help="smoothing: Monte-Carlo L2 certificates "
                             "(Cohen et al.); ibp: deterministic L-inf "
                             "certificates from closed-form interval "
                             "bounds (Gowal et al.; ibp_* models only); "
                             "crown-ibp: tighter L-inf certificates via a "
                             "backward linear bound over IBP intermediates "
                             "(Zhang et al. 2020 — never worse than ibp)")
    parser.add_argument("--eps_list", type=float, nargs="+",
                        default=[2 / 255, 8 / 255],
                        help="ibp method: L-inf radii to certify (eps is a "
                             "traced scalar — the whole sweep shares ONE "
                             "compiled program)")
    parser.add_argument("--sigma", type=float, default=0.25,
                        help="Gaussian noise scale in [0,1] pixel units")
    parser.add_argument("--n0", type=int, default=32,
                        help="selection samples (class guess)")
    parser.add_argument("--n", type=int, default=512,
                        help="estimation samples (certified bound)")
    parser.add_argument("--chunk", type=int, default=32,
                        help="noisy copies per compiled step")
    parser.add_argument("--alpha", type=float, default=0.001,
                        help="certificate failure probability")
    parser.add_argument("--max_batch", type=int, default=4,
                        help="images per compiled program (device batch is "
                             "chunk * max_batch)")
    parser.add_argument("--sigmas", type=float, nargs="+", default=None,
                        help="sweep several noise scales (overrides --sigma); "
                             "sigma is a traced scalar, so the whole sweep "
                             "shares ONE compiled voting program")
    parser.add_argument("--plot", type=str, default=None,
                        help="write the certified-accuracy-vs-radius figure "
                             "here (accuracy vs the base model's clean "
                             "pseudo-labels, the harness convention)")
    parser.add_argument("--labels_json", type=str, default=None,
                        help="JSON {path-or-basename: class id} ground-truth "
                             "labels for certified ACCURACY; default = the "
                             "base model's clean predictions")
    parser.add_argument("--output", type=str, default="certify_results.json")
    add_imagenet_val_arg(parser)
    add_model_args(parser)
    return parser


def _main_ibp(args) -> int:
    """Deterministic L-inf certification: one interval forward per
    (batch, eps) — no sampling, no abstention, exact by construction."""
    paths = resolve_eval_inputs(args, skip_bmp=False)
    x_np, kept = load_image_batch_tolerant(paths, size=model_input_size(args))
    if not kept:
        raise SystemExit("no loadable images")
    bundle = load_bundle(args)
    if not hasattr(bundle.module, "spec"):
        raise SystemExit(
            f"--method {args.method} needs a spec-driven model (ibp_cnn7 / "
            f"ibp_tiny, models/ibp.py); --model {args.model} has no "
            f"interval propagator")
    if args.method == "crown-ibp":
        from ..defenses.crown_ibp import make_crown_verify_fn as _make_verify
    else:
        from ..defenses.ibp import make_verify_fn as _make_verify

    verify = jax.jit(_make_verify(
        bundle.variables["params"], bundle.module.spec,
        bundle.mean, bundle.std))
    logits_fn, _ = make_fns(bundle)
    x = jnp.asarray(x_np)
    with maybe_profile(args.profile_dir):
        base_pred = jax.device_get(
            jax.jit(lambda xx: jnp.argmax(logits_fn(xx), axis=-1))(x))
        y_eval = resolve_labels(args.labels_json, kept, base_pred)
        if args.labels_json:
            from .common import check_label_range, n_classes_of

            check_label_range(np.asarray(y_eval),
                              n_classes_of(logits_fn, int(x.shape[1])))
        y = jnp.asarray(np.asarray(y_eval, np.int32))
        sweeps = []
        for eps in [float(e) for e in args.eps_list]:
            t0 = time.perf_counter()
            out = jax.device_get(verify(x, y, jnp.float32(eps)))
            dt = time.perf_counter() - t0
            verified = np.asarray(out["verified"])
            correct = np.asarray(out["correct"])
            margin = np.asarray(out["margin"])
            print(f"eps={eps:.6g}: verified_acc={verified.mean():.3f} "
                  f"clean_acc={correct.mean():.3f} "
                  f"({len(kept)} images, {dt:.1f}s)")
            results = []
            for i, p in enumerate(kept):
                print(f"  {Path(p).name}: pred={int(base_pred[i])} "
                      f"{'VERIFIED' if verified[i] else 'not verified'} "
                      f"(margin={margin[i]:.4f})")
                results.append({
                    "image": str(p),
                    "base_prediction": int(base_pred[i]),
                    "label": int(y_eval[i]),
                    "verified": bool(verified[i]),
                    "margin": float(margin[i]),
                })
            sweeps.append({"eps": eps,
                           "verified_accuracy": float(verified.mean()),
                           "clean_accuracy": float(correct.mean()),
                           "results": results})
    out_path = Path(args.output)
    out_path.write_text(json.dumps(
        {"method": args.method, "model": args.model, "sweeps": sweeps},
        indent=2))
    print(f"Wrote {out_path}")
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    print(f"Using device: {jax.devices()[0]}")

    if args.method in ("ibp", "crown-ibp"):
        return _main_ibp(args)

    paths = resolve_eval_inputs(args, skip_bmp=False)
    x_np, kept = load_image_batch_tolerant(
        paths, size=model_input_size(args))
    if not kept:
        raise SystemExit("no loadable images")

    bundle = load_bundle(args)
    logits_fn, _ = make_fns(bundle)
    labels = load_imagenet_labels()

    from ..defenses.smoothing import make_counts_fn

    sigmas = ([float(s) for s in args.sigmas] if args.sigmas
              else [float(args.sigma)])
    # one jitted voting program serves every sigma (traced scalar)
    counts_fn = make_counts_fn(logits_fn, int(args.chunk))

    x = jnp.asarray(x_np)
    key = key_from_seed(args.seed)
    per_sigma, curves = [], []
    with maybe_profile(args.profile_dir):
        base_pred = jax.device_get(
            jax.jit(lambda xx: jnp.argmax(logits_fn(xx), axis=-1))(x))
        y_eval = resolve_labels(args.labels_json, kept, base_pred)
        if args.labels_json:
            from .common import check_label_range, n_classes_of

            check_label_range(np.asarray(y_eval),
                              n_classes_of(logits_fn, int(x.shape[1])))
        for si, sigma in enumerate(sigmas):
            config = SmoothingConfig(
                sigma=sigma, n0=int(args.n0), n=int(args.n),
                chunk=int(args.chunk), alpha=float(args.alpha),
                max_batch=int(args.max_batch),
            )
            smoothed = SmoothedClassifier(logits_fn, config,
                                          counts_fn=counts_fn)
            t0 = time.perf_counter()
            classes, radii = smoothed.certify(x, jax.random.fold_in(key, si))
            dt = time.perf_counter() - t0

            results = []
            print(f"sigma={sigma} n0={config.n0} n={config.n} "
                  f"alpha={config.alpha}  ({dt:.1f}s total)")
            for i, p in enumerate(kept):
                cls = int(classes[i])
                name = ("ABSTAIN" if cls == ABSTAIN else
                        (labels[cls] if labels and cls < len(labels) else str(cls)))
                print(f"{Path(p).name}: prediction={name} "
                      f"certified_radius={radii[i]:.4f} "
                      f"(base pred {int(base_pred[i])})")
                results.append({
                    "image": str(p),
                    "base_prediction": int(base_pred[i]),
                    "smoothed_prediction": cls,
                    "certified_radius": float(radii[i]),
                })
            per_sigma.append({"sigma": sigma, "results": results})
            curves.append({
                "sigma": sigma,
                "radii": np.asarray(radii),
                # ground truth when --labels_json is given, else the base
                # model's clean predictions (the harness convention)
                "correct": np.asarray(classes) == np.asarray(y_eval),
            })

    out = Path(args.output)
    out.write_text(json.dumps({
        "n0": int(args.n0), "n": int(args.n), "alpha": float(args.alpha),
        "sweeps": per_sigma,
    }, indent=2))
    print(f"Wrote {out}")

    if args.plot:
        from ..viz.plots import plot_certified_accuracy

        plot_certified_accuracy(curves, Path(args.plot))
        print(f"Wrote {args.plot}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
