"""Generalized transfer CLI (parity with reference transferability_attack.py).

Configurable source/target model lists and an eps sweep; success convention:
target's adversarial label differs from the SOURCE model's clean
pseudo-label (reference transferability_attack.py:110-120).  Emits the
summary table, ``transfer_results.json``, and a seaborn heatmap per attack.

The reference ships broken (undefined ``predict``/``load_image`` ->
NameError at runtime; SURVEY.md §2 "Known defects") — this CLI is the
working equivalent.
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

from ..attacks import AttackParams
from ..core.constants import (
    DEFAULT_ALPHA,
    DEFAULT_CW_C,
    DEFAULT_CW_KAPPA,
    DEFAULT_CW_LR,
    DEFAULT_EPS_LIST,
)
from ..core.images import load_image_batch, save_image_01
from ..core.rng import key_from_seed
from ..eval.transfer import transfer_attack_batch
from .common import (EPS_INDEPENDENT_ATTACKS, VarBoundJit,
                     add_extended_attack_args, add_model_args, cell_key,
                     cell_rng_id, extended_attack_kwargs, load_bundle,
                     make_fns_explicit, maybe_profile, resolve_image_inputs)

def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Black-box Transferability Attack")
    parser.add_argument("--source_model", type=str, nargs="+",
                        default=["resnet50"],
                        help="one zoo model, or several to attack a logit-"
                             "fusion ensemble (beyond-reference; one fused "
                             "program).  Any registered family works — "
                             "ImageNet (224) and CIFAR (32) models alike, as "
                             "long as every participant shares one input size")
    parser.add_argument("--target_models", type=str, nargs="+",
                        default=["vgg19", "densenet121", "vit_b_16"],
                        help="zoo model names (see models/zoo.py list_models)")
    parser.add_argument("--image_dir", type=str, default=None)
    parser.add_argument("--image", type=str, default="example.jpg")
    parser.add_argument("--attacks", type=str, nargs="+", default=["pgd"],
                        choices=["fgsm", "pgd", "cw", "mifgsm", "dim", "tim", "apgd", "square", "deepfool", "nes", "spsa", "bandits", "hsja", "ead", "apgd_dlr", "apgd_t", "fab", "stadv", "boundary", "simba", "jsma", "pgd_l1", "spatial"])
    parser.add_argument("--eps_list", type=float, nargs="+",
                        default=list(DEFAULT_EPS_LIST))
    parser.add_argument("--alpha", type=float, default=DEFAULT_ALPHA)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--cw_c", type=float, default=DEFAULT_CW_C)
    parser.add_argument("--cw_kappa", type=float, default=DEFAULT_CW_KAPPA)
    parser.add_argument("--cw_steps", type=int, default=100)
    parser.add_argument("--square_steps", type=int, default=1000,
                        help="query budget for the square attack")
    add_extended_attack_args(parser)
    parser.add_argument("--cw_lr", type=float, default=DEFAULT_CW_LR)
    parser.add_argument("--convention", type=str, default="source-label",
                        choices=["source-label", "blackbox"],
                        help="success reference: the SOURCE model's clean "
                             "pseudo-label (reference transferability_attack.py"
                             ":110-120) or each target's OWN clean label "
                             "(reference blackbox_transfer.py:244-251)")
    parser.add_argument("--save_adv_images", action="store_true")
    parser.add_argument("--max_batch", type=int, default=256,
                        help="device batch cap: image sets larger than this "
                             "stream through the compiled cell program in "
                             "fixed-shape chunks at constant memory (0 = "
                             "always one resident batch)")
    parser.add_argument("--output_dir", type=str, default="./transfer_results")
    add_model_args(parser)
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from ..models.zoo import list_models, model_meta

    names = list(args.source_model) + list(args.target_models)
    known = set(list_models())
    unknown = [nm for nm in names if nm not in known]
    if unknown:
        print(f"error: unknown model(s) {unknown}; registered: "
              f"{sorted(known)}", file=sys.stderr)
        return 2
    # every participating model sees the SAME pixel batch, so all input
    # sizes must agree (224 ImageNet families, 32 CIFAR families)
    sizes = {nm: int(model_meta(nm)["input_size"]) for nm in names}
    if len(set(sizes.values())) != 1:
        print(f"error: mixed input sizes {sizes}; transfer requires one "
              "common size per run", file=sys.stderr)
        return 2
    input_size = next(iter(sizes.values()))

    print(f"Using device: {jax.devices()[0]}")

    image_paths = resolve_image_inputs(args.image_dir, args.image)
    if args.image_dir is not None:
        print(f"\n[3/4] Found {len(image_paths)} images in {args.image_dir}")
    else:
        print(f"\n[3/4] Using single image: {image_paths[0]}")

    src_names = list(args.source_model)
    print(f"\n[1/4] Loading source model(s): {src_names}")
    # variables-explicit closures + a variables pytree passed as an
    # explicit jit argument: the fused cell program spans EVERY
    # participating model's weights (source ensemble + all targets ≈ 1 GB
    # f32 at the reference defaults), far past the relay compile
    # endpoint's ~0.5 GB payload limit if captured as closure constants
    # (HTTP 413 — see common.make_fns_explicit)
    member_bundles = [load_bundle(args, name=nm) for nm in src_names]
    member_ofs = [make_fns_explicit(b)[0] for b in member_bundles]
    if len(member_ofs) > 1:
        print(f"  Attacking a logit-fusion ensemble of {len(member_ofs)} sources"
              " (one fused program)")

    print(f"\n[2/4] Loading target models: {args.target_models}")
    target_ofs = {}
    target_vars = {}
    for name in args.target_models:
        if name in src_names:
            print(f"  Skipping {name} (same as a source model)")
            continue
        b = load_bundle(args, name=name)
        target_ofs[name] = make_fns_explicit(b)[0]
        target_vars[name] = b.variables
    target_fns = target_ofs  # name order/keys (downstream iterates names)

    vars_tree = {"sources": [b.variables for b in member_bundles],
                 "targets": target_vars}

    def bind_fns(vtree):
        """Rebuild the (src_logits_fn, target_fns) closures from a TRACED
        variables pytree, inside the jit trace."""
        mfns = [lambda x, f=f, v=v: f(v, x)
                for f, v in zip(member_ofs, vtree["sources"])]
        if len(mfns) == 1:
            src_lf = mfns[0]
        else:
            from ..attacks import make_ensemble_logits_fn

            src_lf = make_ensemble_logits_fn(mfns)
        tfns = {name: (lambda x, f=target_ofs[name], v=vtree["targets"][name]:
                       f(v, x))
                for name in target_ofs}
        return src_lf, tfns

    output_dir = Path(args.output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    max_batch = int(args.max_batch)
    streaming = max_batch > 0 and len(image_paths) > max_batch
    if streaming:
        x = None
        n = len(image_paths)
        print(f"\nStreaming evaluation: {n} images in fixed chunks of "
              f"{max_batch} (constant memory)")
    else:
        x = jnp.asarray(load_image_batch(image_paths, size=input_size))
        n = x.shape[0]
    key = key_from_seed(args.seed)

    print("\n[4/4] Running transfer attack experiments...")
    print("=" * 80)

    # all_results[attack][eps] = {"source_success": rate-relevant list,
    #                             "transfer_success": {model: list}}
    all_results: dict = {}
    # EPS_INDEPENDENT_ATTACKS never read eps: identical cells across the
    # eps sweep — compute once, reuse (RNG from an eps-free cell key so
    # the cached cell equals a fresh run of any eps subset)
    eps_independent_cache: dict = {}
    # eps is a traced runtime scalar: ONE compiled program per attack
    # serves the whole eps sweep (same rationale as defense_experiments)
    cell_fns: dict = {}
    with maybe_profile(args.profile_dir):
        for attack_name in args.attacks:
            all_results[attack_name] = {}
            for eps in args.eps_list:
                print(f"  Running {attack_name.upper()} with eps={eps:.5f} "
                      f"on a batch of {n}...")
                if attack_name in eps_independent_cache:
                    print(f"    ({attack_name} is eps-independent: reusing the computed cell)")
                    all_results[attack_name][float(eps)] = eps_independent_cache[attack_name]
                    continue
                if attack_name not in cell_fns:
                    base = AttackParams(
                        eps=0.0,  # overridden by the traced eps at call time
                        alpha=float(args.alpha), steps=int(args.steps),
                        cw_c=float(args.cw_c), cw_kappa=float(args.cw_kappa),
                        cw_steps=int(args.cw_steps), cw_lr=float(args.cw_lr), square_steps=int(args.square_steps),
                        **extended_attack_kwargs(args),
                    )
                    def _cell(vtree, x, k, e, a=attack_name, p=base):
                        src_lf, tfns = bind_fns(vtree)
                        return transfer_attack_batch(
                            src_lf, tfns, x, a,
                            dataclasses.replace(p, eps=e), k,
                            convention=args.convention,
                        )

                    cell_fns[attack_name] = VarBoundJit(_cell, vars_tree)
                sub = cell_key(key, cell_rng_id(attack_name, float(eps)))
                if streaming:
                    from ..eval.streaming import stream_transfer_cell

                    adv_dir = output_dir / f"{attack_name}_eps_{eps:.5f}"

                    def _save_chunk(adv_np, kept_paths, _dir=adv_dir):
                        for img, p in zip(adv_np, kept_paths):
                            save_image_01(img, _dir / f"adv_{Path(p).stem}.png")

                    cell_record = stream_transfer_cell(
                        cell_fns[attack_name], image_paths, sub, float(eps),
                        list(target_fns), chunk_size=max_batch,
                        size=input_size,
                        save_adv=_save_chunk if args.save_adv_images else None,
                    )
                    src_vec = np.asarray(cell_record["source_success"])
                else:
                    cell = cell_fns[attack_name](x, sub, jnp.float32(eps))
                    src_vec = np.asarray(cell.source_success)
                    cell_record = {
                        "source_success": src_vec.tolist(),
                        "transfer_success": {
                            name: np.asarray(v).tolist()
                            for name, v in cell.target_success.items()
                        },
                    }
                all_results[attack_name][float(eps)] = cell_record
                if attack_name in EPS_INDEPENDENT_ATTACKS:
                    eps_independent_cache[attack_name] = cell_record
                print(f"    Source model ASR: {src_vec.mean():.3f}")
                for name, v in cell_record["transfer_success"].items():
                    print(f"    Transfer to {name}: {np.asarray(v).mean():.3f}")

                if args.save_adv_images and not streaming:
                    adv_dir = output_dir / f"{attack_name}_eps_{eps:.5f}"
                    adv_np = np.asarray(jax.device_get(cell.x_adv))
                    for i, p in enumerate(image_paths):
                        save_image_01(adv_np[i], adv_dir / f"adv_{p.stem}.png")

    # summary table (reference layout, ":318-340")
    print("\n" + "=" * 80)
    print("TRANSFERABILITY SUMMARY")
    print("=" * 80)
    header = f"{'Attack':<10} {'Eps':<10} {'Source':<10}"
    for name in target_fns:
        header += f" {name:<15}"
    print(header)
    print("-" * len(header))
    for attack_name in args.attacks:
        for eps in args.eps_list:
            cell = all_results[attack_name][float(eps)]
            src_rate = float(np.mean(cell["source_success"]))
            row = f"{attack_name:<10} {eps:<10.5f} {src_rate:<10.3f}"
            for name in target_fns:
                rate = float(np.mean(cell["transfer_success"][name]))
                row += f" {rate:<15.3f}"
            print(row)

    results_file = output_dir / "transfer_results.json"
    results_file.write_text(json.dumps(all_results, indent=2))
    print(f"\nDetailed results saved to: {results_file}")

    # per-attack heatmap (eps x target-model)
    from ..viz.plots import plot_transfer_heatmap

    model_names = list(target_fns)
    if model_names:
        for attack_name in args.attacks:
            matrix = np.zeros((len(args.eps_list), len(model_names)))
            for i, eps in enumerate(args.eps_list):
                for j, name in enumerate(model_names):
                    v = all_results[attack_name][float(eps)]["transfer_success"][name]
                    matrix[i, j] = float(np.mean(v))
            plot_path = output_dir / f"transfer_heatmap_{attack_name}.png"
            plot_transfer_heatmap(matrix, args.eps_list, model_names,
                                  "+".join(src_names), attack_name, plot_path)
            print(f"Transferability heatmap saved: {plot_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
