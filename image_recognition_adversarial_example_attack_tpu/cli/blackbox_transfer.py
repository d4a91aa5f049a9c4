"""Fixed-trio black-box transfer CLI (parity with reference blackbox_transfer.py).

ResNet-50 source, {VGG19, ViT-B/16, Swin-T} targets; transfer success means
the target's adversarial label differs from the target's OWN clean label
(reference blackbox_transfer.py:244-251).  Output: the same tab-separated
ASR table (":325-340") and per-sample clean/adv 2-panel PNGs under
``<image_dir>/blackbox_vis``.

TPU design: one batched attack program per attack on the source model; one
batched forward per target for clean and adversarial; per-image loops only
for host-side PNG writing.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..attacks import AttackParams, run_attack
from ..core.constants import (
    DEFAULT_ALPHA,
    DEFAULT_CW_C,
    DEFAULT_CW_KAPPA,
    DEFAULT_CW_LR,
    DEFAULT_EPS,
    DEFAULT_STEPS,
)
from ..core.images import list_images, load_image_batch
from ..core.labels import load_imagenet_labels
from ..core.rng import key_from_seed
from .common import (VarBoundJit, add_extended_attack_args, add_model_args,
                     extended_attack_kwargs, load_bundle, make_fns_explicit,
                     maybe_profile)

TARGET_DISPLAY = {"vgg19": "VGG19", "vit_b_16": "ViT", "swin_t": "Swin"}


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Black-box transfer sweep: ResNet-50 -> VGG19/ViT/Swin"
    )
    parser.add_argument("--image_dir", type=str, default="picture")
    parser.add_argument("--attacks", type=str, nargs="+",
                        default=["fgsm", "pgd", "cw"],
                        choices=["fgsm", "pgd", "cw", "mifgsm", "dim", "tim", "apgd", "square", "deepfool", "nes", "spsa", "bandits", "hsja", "ead", "apgd_dlr", "apgd_t", "fab", "stadv", "boundary", "simba", "jsma", "pgd_l1", "spatial"])
    parser.add_argument("--eps", type=float, default=DEFAULT_EPS)
    parser.add_argument("--alpha", type=float, default=DEFAULT_ALPHA)
    parser.add_argument("--steps", type=int, default=DEFAULT_STEPS)
    parser.add_argument("--cw_c", type=float, default=DEFAULT_CW_C)
    parser.add_argument("--cw_kappa", type=float, default=DEFAULT_CW_KAPPA)
    parser.add_argument("--cw_steps", type=int, default=200)
    parser.add_argument("--square_steps", type=int, default=1000,
                        help="query budget for the square attack")
    add_extended_attack_args(parser)
    parser.add_argument("--cw_lr", type=float, default=DEFAULT_CW_LR)
    parser.add_argument("--visualize_n", type=int, default=3)
    parser.add_argument("--max_batch", type=int, default=256,
                        help="device batch cap: image sets larger than this "
                             "stream through the compiled attack/forward "
                             "programs in fixed-shape chunks at constant "
                             "memory (0 = always one resident batch)")
    parser.add_argument("--source", type=str, default="resnet50",
                        help="source (white-box) model")
    parser.add_argument("--targets", type=str, nargs="+",
                        default=["vgg19", "vit_b_16", "swin_t"],
                        help="target (black-box) models")
    add_model_args(parser)
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    image_dir = Path(args.image_dir)
    if not image_dir.is_dir():
        raise SystemExit(f"image_dir not found: {image_dir}")
    paths = list_images(image_dir)
    if not paths:
        raise SystemExit(f"no images found in {image_dir}")

    # variables-explicit closures: weights cross every jit boundary as
    # runtime arguments, never as compile-payload constants (HTTP 413 on
    # vgg19-size models over the relay — see common.make_fns_explicit)
    src_bundle = load_bundle(args, name=args.source)
    src_logits_of, _ = make_fns_explicit(src_bundle)
    target_fns = {}  # name -> (logits_of, variables)
    for name in args.targets:
        b = load_bundle(args, name=name)
        target_fns[name] = (make_fns_explicit(b)[0], b.variables)

    labels = load_imagenet_labels()
    max_batch = int(args.max_batch)
    streaming = max_batch > 0 and len(paths) > max_batch
    key = key_from_seed(args.seed)

    # ONE jitted predict program per model, reused for the clean pass and
    # every attack's adversarial pass (a fresh jit lambda per (attack,
    # target) would recompile the identical forward each time — minutes per
    # program on a remote TPU relay)
    predict_fns = {
        name: VarBoundJit(lambda v, x, f=fn: jnp.argmax(f(v, x), -1), vars_)
        for name, (fn, vars_) in target_fns.items()
    }
    src_pred = VarBoundJit(lambda v, x: jnp.argmax(src_logits_of(v, x), -1),
                           src_bundle.variables)

    def make_attack_fn(attack_name):
        params = AttackParams(
            eps=args.eps, alpha=args.alpha, steps=args.steps,
            cw_c=args.cw_c, cw_kappa=args.cw_kappa,
            cw_steps=args.cw_steps, cw_lr=args.cw_lr,
            square_steps=int(args.square_steps),
            **extended_attack_kwargs(args),
        )
        return VarBoundJit(
            lambda v, x, y, k, a=attack_name, p=params: run_attack(
                a, lambda xx: src_logits_of(v, xx), x, y, p, k),
            src_bundle.variables)

    stats: dict[str, dict[str, dict[str, int]]] = {}
    adv_cache: dict[str, np.ndarray] = {}
    if streaming:
        from ..utils.pipeline import EvalBatchPipeline

        n = len(paths)
        n_viz = min(int(args.visualize_n), n)
        print(f"Streaming evaluation: {n} images in fixed chunks of "
              f"{max_batch} (constant memory)")
        attack_fns = {a: make_attack_fn(a) for a in args.attacks}
        counts = {a: {nm: 0 for nm in target_fns} for a in args.attacks}
        viz_y_adv = {a: {} for a in args.attacks}
        y_src_head = y_clean_head = x_head = None
        total = 0
        with maybe_profile(args.profile_dir):
            keys = {a: jax.random.split(key, len(args.attacks))[i]
                    for i, a in enumerate(args.attacks)}
            for step, x_np, _, n_valid in EvalBatchPipeline(paths, max_batch):
                xc = jnp.asarray(x_np)
                ys = src_pred(xc)
                yc = {nm: np.asarray(pf(xc))
                      for nm, pf in predict_fns.items()}
                for attack_name in args.attacks:
                    x_adv = attack_fns[attack_name](
                        xc, ys, jax.random.fold_in(keys[attack_name], step))
                    for nm in target_fns:
                        ya = np.asarray(predict_fns[nm](x_adv))
                        counts[attack_name][nm] += int(np.sum(
                            ya[:n_valid] != yc[nm][:n_valid]))
                    if step == 0 and n_viz:
                        adv_cache[attack_name] = np.asarray(
                            jax.device_get(x_adv[:n_viz]))
                        for nm in target_fns:
                            viz_y_adv[attack_name][nm] = np.asarray(
                                predict_fns[nm](x_adv))[:n_viz]
                if step == 0:
                    y_src_head = np.asarray(ys)[:n_viz]
                    y_clean_head = {nm: v[:n_viz] for nm, v in yc.items()}
                    x_head = np.asarray(x_np)[:n_viz]
                total += n_valid
        if total == 0:  # every chunk dropped: nothing decoded
            raise SystemExit("no loadable images")
        n = total
        y_src, y_clean, x = y_src_head, y_clean_head, x_head
        for attack_name in args.attacks:
            stats[attack_name] = {}
            for nm in target_fns:
                disp = TARGET_DISPLAY.get(nm, nm)
                stats[attack_name][disp] = {
                    "success": counts[attack_name][nm], "total": total,
                    "y_adv": viz_y_adv[attack_name].get(nm, np.zeros(0, np.int64)),
                }
        args.visualize_n = n_viz
    else:
        x = jnp.asarray(load_image_batch(paths))
        n = x.shape[0]
        y_src = np.asarray(src_pred(x))
        y_clean = {name: np.asarray(pf(x)) for name, pf in predict_fns.items()}
        with maybe_profile(args.profile_dir):
            for attack_name in args.attacks:
                key, sub = jax.random.split(key)
                attack_fn = make_attack_fn(attack_name)
                x_adv = attack_fn(x, jnp.asarray(y_src), sub)
                adv_cache[attack_name] = np.asarray(jax.device_get(x_adv))

                stats[attack_name] = {}
                for name in target_fns:
                    y_adv = np.asarray(predict_fns[name](x_adv))
                    success = int(np.sum(y_adv != y_clean[name]))
                    disp = TARGET_DISPLAY.get(name, name)
                    stats[attack_name][disp] = {"success": success, "total": n,
                                                "y_adv": y_adv}

    # per-sample visualization PNGs (first visualize_n images x attacks)
    if args.visualize_n > 0:
        from ..viz.plots import plot_blackbox_pair

        out_dir = image_dir / "blackbox_vis"
        try:
            out_dir.mkdir(parents=True, exist_ok=True)
        except OSError:
            # reference image dirs may be read-only; degrade gracefully
            out_dir = Path("blackbox_vis")
            out_dir.mkdir(parents=True, exist_ok=True)

        def lbl(idx: int) -> str:
            return labels[idx] if 0 <= idx < len(labels) else str(idx)

        for i in range(min(int(args.visualize_n), n)):
            for attack_name in args.attacks:
                clean_text = f"{args.source}: {lbl(int(y_src[i]))}\n" + "\n".join(
                    f"{TARGET_DISPLAY.get(nm, nm)}: {lbl(int(y_clean[nm][i]))}"
                    for nm in target_fns
                )
                adv_text = "\n".join(
                    f"{TARGET_DISPLAY.get(nm, nm)}: "
                    f"{lbl(int(stats[attack_name][TARGET_DISPLAY.get(nm, nm)]['y_adv'][i]))}"
                    for nm in target_fns
                )
                plot_blackbox_pair(
                    np.asarray(x[i]), adv_cache[attack_name][i],
                    clean_text, adv_text,
                    title=f"{paths[i].name} ({attack_name})",
                    attack_name=attack_name,
                    out_path=out_dir / f"{paths[i].stem}_{attack_name}.png",
                )

    # tab-separated ASR table, exact reference layout (":325-340")
    models_order = [TARGET_DISPLAY.get(nm, nm) for nm in args.targets]
    header = ["Attack/Model"] + models_order
    print("\t".join(header))
    for attack_name in args.attacks:
        row = [attack_name.upper()]
        for disp in models_order:
            cell = stats.get(attack_name, {}).get(disp)
            asr = 100.0 * cell["success"] / cell["total"] if cell and cell["total"] else 0.0
            row.append(f"{asr:.1f}%")
        print("\t".join(row))
    return 0


if __name__ == "__main__":
    sys.exit(main())
