"""Deep-dive visualization CLI (parity with reference visualized_attacks.py).

Runs fgsm+pgd+cw on one image and emits attack_comparison.png,
attack_trajectory.png, perturbation_analysis.png, the printed metric block,
and attack_report.json.  Fixes two reference defects (SURVEY.md §2):
the ``pred_adj`` JSON typo (KeyError at visualized_attacks.py:609) and the
spurious denormalize-on-[0,1]-pixels display bug (:207-212).

TPU design: the three attacks and the trajectory replay are each one
compiled program; the trajectory comes from scan-stacked outputs
(eval/trajectory.py) instead of a per-step Python replay.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..attacks import AttackParams, run_attack
from ..core.constants import DEFAULT_ALPHA, DEFAULT_CW_C, DEFAULT_EPS
from ..core.images import load_image, save_image_01
from ..core.labels import load_imagenet_labels
from ..core.rng import key_from_seed
from ..eval.metrics import attack_metrics, metrics_to_python
from ..eval.trajectory import pgd_trajectory
from .common import add_model_args, load_bundle, make_fns, maybe_profile


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Adversarial attack visual deep-dive")
    parser.add_argument("--image", type=str, required=True)
    parser.add_argument("--eps", type=float, default=DEFAULT_EPS)
    parser.add_argument("--alpha", type=float, default=DEFAULT_ALPHA)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--cw_steps", type=int, default=100)
    parser.add_argument("--cw_c", type=float, default=DEFAULT_CW_C)
    parser.add_argument("--output_dir", type=str, default="./attack_visualization")
    parser.add_argument("--save_images", action="store_true")
    parser.add_argument("--gradcam", action="store_true",
                        help="also emit gradcam_attack.png: Grad-CAM "
                             "attention maps of the clean vs adversarial "
                             "prediction per attack, with the attention-"
                             "shift IoU (conv models; eval/explain.py)")
    parser.add_argument("--landscape", action="store_true",
                        help="also emit loss_landscape.png: the CE surface "
                             "on the plane spanned by each attack's "
                             "direction and a random orthogonal direction "
                             "(eval/landscape.py)")
    parser.add_argument("--landscape_grid", type=int, default=21,
                        help="landscape resolution (one [grid^2] batched "
                             "forward per attack)")
    add_model_args(parser)
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    image_path = Path(args.image)
    if not image_path.exists():
        raise FileNotFoundError(f"image not found: {image_path}")

    print(f"Using device: {jax.devices()[0]}")
    bundle = load_bundle(args)
    logits_fn, _ = make_fns(bundle)
    labels = load_imagenet_labels()

    x = jnp.asarray(load_image(image_path))
    key = key_from_seed(args.seed)

    probs_fn = jax.jit(lambda x: jax.nn.softmax(logits_fn(x), -1))

    def predict(xx):
        p = np.asarray(probs_fn(xx))[0]
        idx = int(p.argmax())
        return idx, labels[idx] if idx < len(labels) else str(idx), float(p[idx])

    clean_id, clean_name, clean_prob = predict(x)
    print("\n" + "=" * 60)
    print(f"Input image: {image_path.name}")
    print(f"Predicted label: {clean_name} (class {clean_id})")
    print(f"Confidence: {clean_prob:.4f}")
    print("=" * 60)

    print("\nRunning attacks...")
    results: dict[str, dict] = {}
    y = jnp.asarray([clean_id], jnp.int32)
    with maybe_profile(args.profile_dir):
        for attack_name in ("fgsm", "pgd", "cw"):
            print(f"  running {attack_name.upper()}...")
            params = AttackParams(
                eps=args.eps, alpha=args.alpha, steps=args.steps,
                cw_c=args.cw_c, cw_steps=args.cw_steps,
            )
            key, sub = jax.random.split(key)
            x_adv = jax.jit(
                lambda x, y, k, a=attack_name, p=params: run_attack(a, logits_fn, x, y, p, k)
            )(x, y, sub)
            results[attack_name] = {
                "x_adv": np.asarray(jax.device_get(x_adv)),
                "pred_clean": (clean_id, clean_name, clean_prob),
                "pred_adv": predict(x_adv),
            }

        # trajectory (PGD) via scan-stacked outputs
        key, sub = jax.random.split(key)
        traj = jax.jit(
            lambda x, y, k: pgd_trajectory(
                logits_fn, x, y, eps=args.eps, alpha=args.alpha,
                steps=args.steps, key=k,
            )
        )(x, y, sub)
        traj_probs = np.asarray(traj.probs)
        traj_l2 = np.asarray(traj.l2)

    output_dir = Path(args.output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    print("\nGenerating visualizations...")
    from ..viz.plots import (
        plot_attack_grid,
        plot_attack_trajectory,
        plot_perturbation_analysis,
    )

    x_np = np.asarray(x)[0]
    grid_results = {
        name: {"x_adv": r["x_adv"][0], "pred_clean": r["pred_clean"],
               "pred_adv": r["pred_adv"]}
        for name, r in results.items()
    }
    plot_attack_grid(x_np, grid_results, output_dir / "attack_comparison.png")
    print(f"  saved: {output_dir / 'attack_comparison.png'}")
    plot_attack_trajectory(traj_probs, traj_l2, "pgd", args.eps,
                           output_dir / "attack_trajectory.png")
    print(f"  saved: {output_dir / 'attack_trajectory.png'}")
    plot_perturbation_analysis(x_np, grid_results,
                               output_dir / "perturbation_analysis.png")
    print(f"  saved: {output_dir / 'perturbation_analysis.png'}")

    if args.landscape:
        from ..eval.landscape import adversarial_plane, loss_landscape
        from ..viz.plots import plot_loss_landscape

        span = 1.5
        # one program: plane construction + the [grid^2] batched forward
        # (keeps everything on-device; CLAUDE.md relay-latency rule)
        ll_fn = jax.jit(
            lambda xx, xa, yy, kk: loss_landscape(
                logits_fn, xx, yy, adversarial_plane(xx, xa, kk),
                span=span, grid=int(args.landscape_grid)))
        landscapes = {}
        for attack_name, r in results.items():
            key, sub = jax.random.split(key)
            landscapes[attack_name] = np.asarray(
                ll_fn(x[0], jnp.asarray(r["x_adv"])[0], y[0], sub))
        plot_loss_landscape(landscapes, span,
                            output_dir / "loss_landscape.png")
        print(f"  saved: {output_dir / 'loss_landscape.png'}")

    cam_report: dict[str, float] = {}
    if args.gradcam:
        from ..eval.explain import cam_shift_iou, make_gradcam_fn, upsample_cam

        from .common import bundle_input_dtype

        try:
            gradcam_fn = make_gradcam_fn(bundle.module, bundle.variables,
                                         bundle.mean, bundle.std,
                                         input_dtype=bundle_input_dtype(bundle))
        except ValueError as exc:
            print(f"  gradcam skipped: {exc}")
        else:
            height, width = x.shape[1], x.shape[2]
            cam_up = jax.jit(
                lambda xx, yy: upsample_cam(gradcam_fn(xx, yy), height, width))
            iou_fn = jax.jit(cam_shift_iou)
            cam_clean = cam_up(x, y)
            cam_results = {}
            for attack_name, r in results.items():
                x_adv = jnp.asarray(r["x_adv"])
                y_adv = jnp.asarray([r["pred_adv"][0]], jnp.int32)
                cam_adv = cam_up(x_adv, y_adv)
                iou = float(iou_fn(cam_clean, cam_adv)[0])
                cam_report[attack_name] = iou
                cam_results[attack_name] = {
                    "x_adv": r["x_adv"][0],
                    "cam_clean": np.asarray(cam_clean)[0],
                    "cam_adv": np.asarray(cam_adv)[0],
                    "pred_clean": r["pred_clean"],
                    "pred_adv": r["pred_adv"],
                    "cam_iou": iou,
                }
            from ..viz.plots import plot_gradcam_panel
            plot_gradcam_panel(x_np, cam_results,
                               output_dir / "gradcam_attack.png")
            print(f"  saved: {output_dir / 'gradcam_attack.png'}")

    # metric block (reference print layout, ":564-584")
    print("\nQuantitative metrics:")
    print("-" * 80)
    metrics_cache: dict[str, dict] = {}
    metrics_fn = jax.jit(attack_metrics)
    for attack_name, r in results.items():
        adv_info = r["pred_adv"]
        success = "SUCCESS" if clean_id != adv_info[0] else "FAILED"
        print(f"\n{attack_name.upper()} attack [{success}]:")
        print(f"  prediction change: {clean_name} ({clean_prob:.4f}) -> "
              f"{adv_info[1]} ({adv_info[2]:.4f})")
        m = metrics_to_python(metrics_fn(x, jnp.asarray(r["x_adv"])))
        metrics_cache[attack_name] = m
        for metric, value in m.items():
            if "SSIM" in metric or "PSNR" in metric:
                print(f"  {metric:.<25} {value:.4f}")
            else:
                print(f"  {metric:.<25} {value:.6f}")

    if args.save_images:
        print("\nSaving adversarial images...")
        img_dir = output_dir / "adversarial_images"
        for attack_name, r in results.items():
            out = img_dir / f"adv_{attack_name}.png"
            save_image_01(r["x_adv"][0], out)
            print(f"    {out}")

    report = {
        "image": str(image_path.absolute()),
        "model": args.model,
        "clean_prediction": {
            "class_id": clean_id,
            "class_name": clean_name,
            "confidence": clean_prob,
        },
        "params": {
            "eps": float(args.eps),
            "alpha": float(args.alpha),
            "steps": int(args.steps),
            "cw_c": float(args.cw_c),
            "cw_steps": int(args.cw_steps),
        },
        "attacks": {
            name: {
                # reference read result["pred_adj"] here — a typo that
                # crashed report writing (visualized_attacks.py:609); fixed.
                "predicted_class": int(r["pred_adv"][0]),
                "predicted_name": r["pred_adv"][1],
                "confidence": float(r["pred_adv"][2]),
                "success": bool(clean_id != r["pred_adv"][0]),
                "metrics": metrics_cache[name],
                **({"gradcam_iou": cam_report[name]}
                   if name in cam_report else {}),
            }
            for name, r in results.items()
        },
    }
    report_path = output_dir / "attack_report.json"
    report_path.write_text(json.dumps(report, indent=2, ensure_ascii=False))

    print(f"\nAll results saved to: {output_dir}")
    print(f"JSON report: {report_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
