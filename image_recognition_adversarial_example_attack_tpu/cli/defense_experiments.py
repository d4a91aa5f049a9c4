"""Defense experiment CLI (parity with reference defense_experiments.py).

Same argparse surface (reference defense_experiments.py:699-738) and the
exact summary-line format (":843-850", also README.md:48-55).  Differences
by design (TPU-native):

- the whole image set is ONE sharded batch; each (attack, eps) grid cell is
  one compiled XLA program (attack + defend + detect fused) instead of a
  per-image Python loop;
- per-cell results are appended to ``<output_dir>/results_partial.json`` so
  interrupted sweeps resume (--resume; the reference restarts from scratch —
  SURVEY.md §5 checkpoint/resume);
- ``--model_type robust`` loads ``resnet50_robust`` weights (converted
  RobustBench checkpoint) with identity normalization
  (reference defense_experiments.py:765-767); without the weight file it
  degrades to random init with a warning.
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

from ..core.constants import (
    DEFAULT_ALPHA,
    DEFAULT_CW_C,
    DEFAULT_CW_KAPPA,
    DEFAULT_CW_LR,
    DEFAULT_EPS_LIST,
    DEFAULT_STEPS,
)
from ..core.images import list_images
from ..core.rng import key_from_seed
from ..defenses.detector import (calibrate_feature_threshold,
                                 calibrate_squeezing_threshold)
from ..defenses.preprocess import DefenseConfig, defend_input
from ..eval.defense_eval import (
    DefenseEvalConfig,
    aggregate_stats,
    summary_line,
)
from .common import (EPS_INDEPENDENT_ATTACKS, add_extended_attack_args,
                     add_imagenet_val_arg, add_model_args,
                     apply_imagenet_val, cell_key, cell_rng_id,
                     extended_attack_kwargs, load_bundle, make_fns,
                     maybe_profile, resolve_image_inputs)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Adversarial attack & defense experiment harness (TPU-native)",
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    parser.add_argument("--model_type", type=str, choices=["standard", "robust"],
                        default="standard")
    parser.add_argument("--image_dir", type=str, default=None)
    parser.add_argument("--image", type=str, default="example.jpg")

    parser.add_argument("--attacks", type=str, nargs="+",
                        default=["fgsm", "pgd", "cw"],
                        choices=["fgsm", "pgd", "cw", "mifgsm", "dim", "tim", "apgd", "square", "deepfool", "nes", "spsa", "bandits", "hsja", "ead", "apgd_dlr", "apgd_t", "fab", "stadv", "boundary", "simba", "jsma", "pgd_l1", "spatial"])
    parser.add_argument("--eps_list", type=float, nargs="+",
                        default=list(DEFAULT_EPS_LIST))
    parser.add_argument("--certified", type=str, default="off",
                        choices=["off", "ibp", "crown-ibp"],
                        help="append per-eps CERTIFIED (verified) accuracy "
                             "rows to the experiment summary — "
                             "deterministic L-inf interval bounds "
                             "(defenses/ibp.py / crown_ibp.py) computed on "
                             "the SAME images and labels as the empirical "
                             "grid; spec-driven models only "
                             "(ibp_cnn7/ibp_tiny)")
    parser.add_argument("--cifar10_dir", type=str, default=None,
                        help="run the grid on a standard CIFAR-10 archive "
                             "(core/datasets.py) with REAL labels instead "
                             "of an image directory; use with the CIFAR "
                             "family (wrn28_10/wrn34_10/preact_resnet18)")
    parser.add_argument("--cifar10_split", type=str, default="test",
                        choices=["train", "test"])
    parser.add_argument("--cifar10_n", type=int, default=200,
                        help="cap on evaluated CIFAR images (0 = all)")
    parser.add_argument("--alpha", type=float, default=DEFAULT_ALPHA)
    parser.add_argument("--steps", type=int, default=DEFAULT_STEPS)
    parser.add_argument("--cw_c", type=float, default=DEFAULT_CW_C)
    parser.add_argument("--cw_kappa", type=float, default=DEFAULT_CW_KAPPA)
    parser.add_argument("--cw_steps", type=int, default=100)
    parser.add_argument("--square_steps", type=int, default=1000,
                        help="query budget for the square attack")
    add_extended_attack_args(parser)
    parser.add_argument("--cw_lr", type=float, default=DEFAULT_CW_LR)

    parser.add_argument("--detector", type=str, default="feature",
                        choices=["feature", "squeezing", "mahalanobis"],
                        help="feature: reference stage-3 statistics detector; "
                             "squeezing: prediction-inconsistency over the "
                             "quantize/smooth squeezers; mahalanobis: min "
                             "class-conditional Mahalanobis distance, fitted "
                             "on the calibration images (both "
                             "beyond-reference)")
    parser.add_argument("--detector_threshold", type=float, default=None)
    parser.add_argument("--calibrate_dir", type=str, default=None)
    parser.add_argument("--calibrate_n", type=int, default=100)
    parser.add_argument("--calibrate_quantile", type=float, default=0.95)

    parser.add_argument("--use_jpeg", action="store_true")
    parser.add_argument("--jpeg_quality", type=int, default=75)
    parser.add_argument("--jpeg_mode", type=str, default="host",
                        choices=["host", "dct"],
                        help="host: reference-parity PIL codec (one host "
                             "round-trip per cell); dct: device-side "
                             "differentiable baseline codec — fully fused, "
                             "SPMD-safe, adaptive-attack-capable")
    parser.add_argument("--use_tv", action="store_true",
                        help="prepend TV-minimization (Guo et al. 2018) to "
                             "the defense chain — a fixed-step Chambolle-"
                             "Pock solve fused into the cell program, "
                             "differentiable under --adaptive")
    parser.add_argument("--tv_weight", type=float, default=0.03,
                        help="TV regularization weight (paper lambda_TV)")
    parser.add_argument("--tv_steps", type=int, default=30,
                        help="Chambolle-Pock iterations (static)")

    parser.add_argument("--labels_json", type=str, default=None,
                        help="JSON {path-or-basename: class id} ground-truth "
                             "labels; default = pseudo-labels (the model's "
                             "clean predictions, the reference convention "
                             ":818-819); partial files fall back per image")
    parser.add_argument("--adaptive", action="store_true",
                        help="generate attacks against the DEFENDED pipeline "
                             "(gradients through the STE-differentiable "
                             "defense chain) instead of the raw model — the "
                             "Athalye et al. adaptive-evaluation standard; "
                             "counters keep their definitions, so "
                             "preproc_defense_acc under --adaptive is the "
                             "defense's honest worst-case number")
    parser.add_argument("--detector_aware", action="store_true",
                        help="the attacker also knows the DETECTOR: fgsm/pgd "
                             "cells ascend CE - lam*relu(score - margin*tau) "
                             "(Carlini & Wagner 2017) so detector_attack_"
                             "success becomes the detector's honest bypass "
                             "number; gradient attacks only; composes with "
                             "--adaptive")
    parser.add_argument("--detector_lam", type=float, default=1.0,
                        help="detector-penalty weight (with --detector_aware)")
    parser.add_argument("--detector_margin", type=float, default=0.9,
                        help="attack targets score < margin*threshold "
                             "(with --detector_aware)")
    parser.add_argument("--max_batch", type=int, default=256,
                        help="device batch cap: image sets larger than this "
                             "stream through the one compiled cell program in "
                             "fixed-shape chunks at constant host+device "
                             "memory (0 = always one resident batch)")
    parser.add_argument("--output_dir", type=str, default="./defense_results")
    parser.add_argument("--viz_samples", type=int, default=5,
                        help="number of attack samples to visualize (0 disables)")
    parser.add_argument("--resume", action="store_true",
                        help="skip (attack, eps) cells already in results_partial.json")
    add_imagenet_val_arg(parser)
    add_model_args(parser)
    return parser


def _partial_path(output_dir: Path) -> Path:
    return output_dir / "results_partial.json"


def _load_partial(output_dir: Path) -> dict:
    path = _partial_path(output_dir)
    if path.is_file():
        try:
            return json.loads(path.read_text())
        except json.JSONDecodeError:
            return {}
    return {}


def _save_partial(output_dir: Path, partial: dict) -> None:
    output_dir.mkdir(parents=True, exist_ok=True)
    _partial_path(output_dir).write_text(json.dumps(partial, indent=2))


def _calibrate(args, logits_fn, features_fn, x_clean, n, pseudo_fn):
    """Quantile calibration for the selected detector (same rails as the
    reference for 'feature'; plain quantile for the others).  Returns
    ``(threshold, detector_params)`` — params are the fitted Gaussian
    state for 'mahalanobis', None otherwise."""
    if args.detector == "squeezing":
        print(f"Calibrating squeezing detector on {min(n, x_clean.shape[0])} clean images...")
        return calibrate_squeezing_threshold(
            logits_fn, x_clean, n=n,
            quantile=args.calibrate_quantile), None
    if args.detector == "mahalanobis":
        from .common import n_classes_of
        from ..defenses.mahalanobis import calibrate_mahalanobis

        num = min(int(n), x_clean.shape[0])
        print(f"Fitting Mahalanobis detector on {num} clean images...")
        # clean predictions as pseudo-labels — the grid's standing label
        # convention (reference defense_experiments.py:818-819); the
        # CALLER's compiled pseudo_fn (a second jit lambda would
        # recompile the identical forward — 20s-4min on the relay)
        pseudo = pseudo_fn(x_clean[:num])
        params, thr = calibrate_mahalanobis(
            features_fn, x_clean, pseudo,
            n_classes_of(logits_fn, int(x_clean.shape[1])),
            n=n, quantile=args.calibrate_quantile)
        return thr, params
    return calibrate_feature_threshold(
        features_fn, x_clean, n=n, quantile=args.calibrate_quantile), None


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.detector_aware:
        bad = [a for a in args.attacks if a not in ("fgsm", "pgd")]
        if bad:
            raise SystemExit(
                "--detector_aware needs gradient attacks with a CE "
                f"objective (fgsm|pgd); drop {bad} from --attacks")

    # --- image list first: fail fast before any device work ---
    cifar = args.cifar10_dir is not None
    if cifar:
        if args.labels_json:
            raise SystemExit("--cifar10_dir carries its own ground-truth "
                             "labels; drop --labels_json")
        if getattr(args, "imagenet_val_dir", None):
            # mutually exclusive data planes; fail fast instead of
            # silently running CIFAR when ImageNet-val was requested
            raise SystemExit("pass at most one of --imagenet_val_dir / "
                             "--cifar10_dir")
        from ..core.datasets import load_cifar10

        x_cifar, y_cifar = load_cifar10(args.cifar10_dir,
                                        split=args.cifar10_split)
        if int(args.cifar10_n) > 0:
            x_cifar = x_cifar[: int(args.cifar10_n)]
            y_cifar = y_cifar[: int(args.cifar10_n)]
        image_paths = [f"cifar10_{args.cifar10_split}_{i:05d}"
                       for i in range(len(y_cifar))]
        print(f"Loaded CIFAR-10 {args.cifar10_split} split: "
              f"{len(image_paths)} images")
    else:
        val_paths = apply_imagenet_val(args)
        if val_paths is not None:
            image_paths = val_paths
        else:
            image_paths = resolve_image_inputs(args.image_dir, args.image)
            if args.image_dir is not None:
                print(f"Loaded image directory: {args.image_dir} ({len(image_paths)} images)")
            else:
                print(f"Loaded single image: {image_paths[0]}")

    print(f"Using device: {jax.devices()[0]}")

    # --- model + normalization (robust arm: identity normalize) ---
    if args.model_type == "robust":
        args.model = "resnet50_robust"  # so an explicit --weights applies
        bundle = load_bundle(args, name="resnet50_robust")
        bundle.mean = np.zeros(3, np.float32)
        bundle.std = np.ones(3, np.float32)
    else:
        bundle = load_bundle(args)
    if cifar and bundle.input_size != 32:
        raise SystemExit(f"--cifar10_dir is 32x32 data but --model "
                         f"{args.model} expects {bundle.input_size}x"
                         f"{bundle.input_size}; use the CIFAR family "
                         "(wrn28_10/wrn34_10/preact_resnet18)")
    logits_fn, features_fn = make_fns(bundle)

    # fail fast BEFORE the grid runs, not after (the certified rows are
    # computed post-summary)
    if args.certified != "off" and not hasattr(bundle.module, "spec"):
        raise SystemExit(
            f"--certified {args.certified} needs a spec-driven model "
            f"(ibp_cnn7 / ibp_tiny, models/ibp.py); --model {args.model} "
            "has no interval propagator")

    # one padded batch on the device mesh (sharded over 'data' when the
    # host sees multiple chips); counters are trimmed back to n_valid.
    # Image sets larger than --max_batch instead STREAM fixed-shape chunks
    # through the same compiled cell program at constant memory
    # (eval/streaming.py — the dataset-scale replacement for the
    # reference's per-image loop, defense_experiments.py:804-832).
    from ..core.images import load_image_batch_tolerant
    from ..eval.engine import Engine

    # JPEG cells keep the mesh via the split-program path (two sharded
    # programs around one host codec stage — eval/defense_eval.py::
    # make_defense_eval_fn_split_jpeg); non-JPEG cells are one fused program.
    engine = Engine(use_mesh=True)
    # fail fast, before any decode/calibration work: the host codec
    # cannot sit inside a SHARDED adaptive attack loop (io_callback
    # aborts SPMD programs); single-device adaptive+host works (BPDA)
    if (args.adaptive and args.use_jpeg and args.jpeg_mode == "host"
            and engine.mesh is not None):
        raise SystemExit(
            "--adaptive with the host JPEG codec cannot run on a mesh "
            "(the codec must sit inside the sharded attack loop); "
            "use --jpeg_mode dct")
    max_batch = int(args.max_batch)
    streaming = (not cifar) and max_batch > 0 and len(image_paths) > max_batch
    pseudo_fn = jax.jit(lambda xx: jnp.argmax(logits_fn(xx), -1))
    if streaming:
        from ..eval.streaming import make_placer, round_up

        mesh_mult = (engine.mesh.shape["data"]
                     if engine.mesh is not None else 1)
        chunk = round_up(max_batch, mesh_mult)
        place = make_placer(engine.mesh)
        x = None
        n = len(image_paths)
        print(f"Streaming evaluation: {n} images in fixed chunks of {chunk} "
              "(constant memory; decode overlaps the device step)")
        if engine.mesh is not None:
            print(f"Mesh: {dict(engine.mesh.shape)} "
                  f"(chunks of {chunk} sharded over 'data')")
    else:
        if cifar:
            x_np = x_cifar
        else:
            x_np, image_paths = load_image_batch_tolerant(
                image_paths, size=bundle.input_size)
        batch = engine.batch_from_array(x_np, paths=list(image_paths))
        x = batch.x
        n = batch.n_valid
        if engine.mesh is not None:
            print(f"Mesh: {dict(engine.mesh.shape)} (batch {batch.padded_size} sharded over 'data')")

    # --- detector threshold ---
    if (args.detector_threshold is not None
            and args.detector != "mahalanobis"):
        # explicit threshold: no calibration pass at all (mahalanobis is
        # the exception — its detector STATE must still be fitted below)
        detector_threshold, detector_params = float(args.detector_threshold), None
        print(f"Using specified threshold: {detector_threshold:.4f}")
    elif args.calibrate_dir is not None:
        calib_dir = Path(args.calibrate_dir)
        if not calib_dir.is_dir():
            raise SystemExit(f"calibrate_dir not found: {calib_dir}")
        calib_paths = [p for p in list_images(calib_dir) if p.suffix.lower() != ".bmp"]
        if not calib_paths:
            raise SystemExit(f"no images found in calibrate_dir: {calib_dir}")
        x_calib_np, _ = load_image_batch_tolerant(calib_paths[: args.calibrate_n],
                                                  size=bundle.input_size)
        x_calib = jnp.asarray(x_calib_np)
        detector_threshold, detector_params = _calibrate(
            args, logits_fn, features_fn, x_calib, args.calibrate_n,
            pseudo_fn)
        if args.detector_threshold is not None:
            # explicit threshold over the freshly fitted mahalanobis state
            detector_threshold = float(args.detector_threshold)
            print(f"Using specified threshold: {detector_threshold:.4f}")
        else:
            print(f"Using calibrated threshold: {detector_threshold:.4f}")
    else:
        if streaming:
            # calibrate on the leading <=100 clean images (the reference
            # caps calibration at calibrate_n=100 anyway, :288-345) — the
            # only slice the streaming path ever holds resident
            head = min(100, len(image_paths))
            x_head_np, _ = load_image_batch_tolerant(image_paths[:head],
                                                     size=bundle.input_size)
            x_cal, n_cal = jnp.asarray(x_head_np), x_head_np.shape[0]
        else:
            x_cal, n_cal = x[:n], min(100, n)
        detector_threshold, detector_params = _calibrate(
            args, logits_fn, features_fn, x_cal, n_cal, pseudo_fn)
        if args.detector_threshold is not None:
            detector_threshold = float(args.detector_threshold)
            print(f"Using specified threshold: {detector_threshold:.4f}")
        else:
            print(f"Auto-calibrated threshold: {detector_threshold:.4f}")

    defense_cfg = DefenseConfig(use_jpeg=bool(args.use_jpeg),
                                jpeg_quality=int(args.jpeg_quality),
                                jpeg_mode=str(args.jpeg_mode),
                                use_tv=bool(args.use_tv),
                                tv_weight=float(args.tv_weight),
                                tv_steps=int(args.tv_steps))

    # clean predictions = pseudo-labels (reference :818-819); the
    # streaming path derives them per chunk with the same program.
    # --labels_json overrides with ground truth (partial files fall back
    # per image via the shared UNLABELED sentinel, resolved per chunk
    # when streaming)
    from .common import (check_label_range, config_fingerprint, labels_digest,
                         n_classes_of, resolve_labels, resolve_labels_sentinel)

    # one fingerprint PER ATTACK: scoped to the knobs that attack's
    # program reads, so editing --cw_steps or dropping an attack from
    # the grid leaves the other attacks' finished cells resumable
    # (labels hashed once, not once per attack)
    _labels_fp = labels_digest(getattr(args, "labels_json", None))
    config_fps = {a: config_fingerprint(args, attack_name=a,
                                        labels_content=_labels_fp)
                  for a in args.attacks}
    labels_np = None
    y_viz_dev = None  # the viz figure always shows CLEAN PREDICTIONS
    if streaming:
        y_true = None
        labels_np = resolve_labels_sentinel(args.labels_json, image_paths)
        if labels_np is not None:
            check_label_range(labels_np, n_classes_of(logits_fn, 224))
    elif cifar:
        # real labels; pad rows keep their pseudo-labels (the counters are
        # trimmed to n_valid downstream, same as the labels_json path)
        pseudo = np.asarray(jax.device_get(pseudo_fn(x)))
        y_true = jnp.asarray(y_cifar.tolist()
                             + pseudo[n:].tolist()).astype(jnp.int32)
        check_label_range(np.asarray(y_true)[:n],
                          n_classes_of(logits_fn, int(x.shape[1])))
        acc = float(np.mean(np.asarray(y_true)[:n] == pseudo[:n]))
        print(f"clean accuracy vs CIFAR-10 {args.cifar10_split} labels: "
              f"{acc:.3f}")
        y_viz_dev = jnp.asarray(pseudo)
    elif args.labels_json:
        pseudo = np.asarray(jax.device_get(pseudo_fn(x)))
        y_true = jnp.asarray(resolve_labels(
            args.labels_json, list(image_paths), pseudo[:n]).tolist()
            + pseudo[n:].tolist()).astype(jnp.int32)
        check_label_range(np.asarray(y_true)[:n],
                          n_classes_of(logits_fn, int(x.shape[1])))
        acc = float(np.mean(np.asarray(y_true)[:n] == pseudo[:n]))
        print(f"clean accuracy vs ground truth: {acc:.3f}")
        y_viz_dev = jnp.asarray(pseudo)
    else:
        # no ground truth: keep the pseudo-labels device-resident (a
        # host round-trip here costs ~150ms over the relay and drops
        # the mesh sharding)
        y_true = pseudo_fn(x)
        y_viz_dev = y_true

    output_dir = Path(args.output_dir)
    partial = _load_partial(output_dir) if args.resume else {}

    results: dict[tuple[str, float], dict] = {}
    print("\n" + "=" * 60)
    print("Running attack & defense experiments...")
    print("=" * 60)

    from ..utils.profiling import PhaseTimer

    timer = PhaseTimer(verbose=False)
    key = key_from_seed(args.seed)
    # EPS_INDEPENDENT_ATTACKS never read eps, so their grid cells are
    # identical across the eps sweep: compute once, reuse (cost-only
    # optimization — see PARITY.md C17).  The RNG-consuming ones
    # (boundary/simba) draw from an eps-FREE cell key so the one cell is
    # reproducible from any eps subset (common.cell_rng_id)
    eps_independent_cache: dict[str, dict] = {}
    # eps enters the attacks only arithmetically, so ONE compiled program
    # per attack serves the whole eps sweep (remote TPU compiles run
    # 20s-4min each — this drops an attacks x eps grid from
    # len(attacks)*len(eps_list) compiles to len(attacks))
    eval_fns: dict = {}
    # per-chunk pseudo-labels survive the whole attack x eps grid: the
    # clean forward runs once per chunk total, not once per cell
    stream_clean_cache: dict = {}
    with maybe_profile(args.profile_dir):
        for attack_name in args.attacks:
            for eps in args.eps_list:
                cell_id = f"{attack_name}:{float(eps):.6f}"
                tag = " | ADAPTIVE (through the defense)" if args.adaptive else ""
                if args.detector_aware:
                    tag += " | DETECTOR-AWARE"
                print(f"\n[{attack_name.upper()} Attack | eps={eps:.5f}{tag}]")
                # resume only cells computed under the SAME configuration:
                # --labels_json (by CONTENT), --adaptive, detector/defense/
                # attack knobs all change counter semantics, so mixing
                # them in one summary would be silently inconsistent
                if (cell_id in partial
                        and partial[cell_id].get("count") == n
                        and partial[cell_id].get("config_fp")
                        == config_fps[attack_name]):
                    print("  (resumed from partial results)")
                    results[(attack_name, float(eps))] = partial[cell_id]
                    if attack_name in EPS_INDEPENDENT_ATTACKS:
                        # the resumed cell serves every other eps too
                        eps_independent_cache.setdefault(
                            attack_name, partial[cell_id])
                    continue
                if attack_name in eps_independent_cache:
                    print(f"  ({attack_name} is eps-independent: reusing the computed cell)")
                    cached = eps_independent_cache[attack_name]
                    results[(attack_name, float(eps))] = dict(cached)
                    partial[cell_id] = dict(cached)
                    _save_partial(output_dir, partial)
                    continue

                if attack_name not in eval_fns:
                    cfg = DefenseEvalConfig(
                        attack_name=attack_name, eps=float(eps),  # eps overridden at call time
                        alpha=float(args.alpha), steps=int(args.steps),
                        cw_c=float(args.cw_c), cw_kappa=float(args.cw_kappa),
                        cw_steps=int(args.cw_steps), cw_lr=float(args.cw_lr),
                        square_steps=int(args.square_steps),
                        **extended_attack_kwargs(args),
                        detector=str(args.detector),
                        detector_params=detector_params,
                        defense=defense_cfg,
                        adaptive=bool(args.adaptive),
                        detector_aware=bool(args.detector_aware),
                        detector_lam=float(args.detector_lam),
                        detector_margin=float(args.detector_margin),
                    )
                    if (defense_cfg.use_jpeg
                            and defense_cfg.jpeg_mode == "host"
                            and engine.mesh is not None):
                        # (adaptive+host+mesh was rejected up front)
                        from ..eval.defense_eval import make_defense_eval_fn_split_jpeg

                        eval_fns[attack_name] = make_defense_eval_fn_split_jpeg(
                            logits_fn, features_fn, cfg)
                    else:
                        from ..eval.defense_eval import make_defense_eval_fn_dynamic_eps

                        eval_fns[attack_name] = make_defense_eval_fn_dynamic_eps(
                            logits_fn, features_fn, cfg)
                fn = eval_fns[attack_name]
                t0 = time.perf_counter()
                # position-independent: resuming a subset grid must agree
                # with a fresh run of that subset (see common.cell_key);
                # eps-independent attacks use an eps-free id so the reused
                # cell matches a fresh run of ANY eps subset
                sub = cell_key(key, cell_rng_id(attack_name, float(eps)))
                with timer.phase(cell_id, examples=n):
                    if streaming:
                        from ..eval.streaming import stream_defense_cell

                        stats = stream_defense_cell(
                            fn, image_paths, detector_threshold, sub,
                            jnp.float32(eps), chunk_size=chunk,
                            size=bundle.input_size,
                            pseudo_label_fn=pseudo_fn, labels=labels_np,
                            place=place, clean_cache=stream_clean_cache,
                        )
                    else:
                        out = fn(x, y_true, detector_threshold, sub,
                                 jnp.float32(eps))
                        jax.block_until_ready(out)
                dt = time.perf_counter() - t0
                if not streaming:
                    stats = aggregate_stats(out, n_valid=n)
                    print(f"  {n} images in {dt:.2f}s ({n / dt:.1f} img/s, one XLA program)")
                else:
                    print(f"  {stats['count']} images in {dt:.2f}s "
                          f"({stats['count'] / dt:.1f} img/s, streamed chunks "
                          f"of {chunk} through one XLA program)")
                results[(attack_name, float(eps))] = stats
                if attack_name in EPS_INDEPENDENT_ATTACKS:
                    eps_independent_cache[attack_name] = stats
                stats["config_fp"] = config_fps[attack_name]  # resume gate
                partial[cell_id] = stats
                _save_partial(output_dir, partial)

    # --- summary (exact reference format) ---
    print("\n" + "=" * 60)
    print("Experiment summary")
    print("=" * 60)
    for (attack_name, eps), stats in sorted(results.items()):
        print(summary_line(attack_name, eps, stats))

    output_dir.mkdir(parents=True, exist_ok=True)

    # --- certified rows on the same summary surface (VERDICT r3 #9):
    # empirical and verified robustness side by side, same images, same
    # labels (the reference's single-summary design :843-850, extended) ---
    if args.certified != "off":
        _certified_summary(args, bundle, logits_fn, pseudo_fn,
                           image_paths=image_paths, streaming=streaming,
                           x=x, n=n, y_true=y_true, labels_np=labels_np,
                           chunk=(chunk if streaming else 0),
                           output_dir=output_dir)

    # --- sample visualization (PGD at eps_list[1] or 8/255, alpha=eps/4) ---
    if args.viz_samples > 0:
        print("\n" + "=" * 60)
        print("Generating attack-sample visualization...")
        print("=" * 60)
        viz_eps = float(args.eps_list[1]) if len(args.eps_list) > 1 else 8 / 255
        n_viz = min(int(args.viz_samples), n)
        if streaming:
            # resident slice of just the visualized samples
            x_viz_np, _ = load_image_batch_tolerant(image_paths[:n_viz],
                                                    size=bundle.input_size)
            x_viz = jnp.asarray(x_viz_np)
            y_viz = pseudo_fn(x_viz)
        else:
            # clean PREDICTIONS, never ground-truth labels: the figure's
            # pred_clean/conf_clean fields mean "what the model said"
            # (and a >=num_classes label would index out of bounds)
            x_viz, y_viz = x[:n_viz], y_viz_dev[:n_viz]
        if (defense_cfg.use_jpeg and defense_cfg.jpeg_mode == "host"
                and engine.mesh is not None):
            # the viz program embeds the fused io_callback JPEG, which XLA
            # forbids in SPMD programs — un-shard the (tiny) sample slice
            x_viz = jnp.asarray(np.asarray(jax.device_get(x_viz)))
            y_viz = jnp.asarray(np.asarray(jax.device_get(y_viz)))
        _visualize_samples(
            logits_fn, x_viz, y_viz, viz_eps, defense_cfg,
            output_dir, key_from_seed(args.seed + 1),
        )

    print("\n" + "=" * 60)
    print("Generating defense heatmaps...")
    print("=" * 60)
    from ..viz.plots import plot_defense_heatmaps

    plot_defense_heatmaps(results, output_dir, save_prefix="defense_results")
    print(f"Saved visualizations to: {output_dir}")

    # per-phase wall-clock + examples/sec observability (SURVEY.md §5 —
    # the reference has no timing at all)
    timings_path = output_dir / "timings.json"
    timings_path.write_text(json.dumps(timer.as_dict(), indent=2))
    print(f"Phase timings: {timings_path}")

    print("\nAll experiments complete. Results saved to:", output_dir)
    return 0


def _certified_summary(args, bundle, logits_fn, pseudo_fn, *, image_paths,
                       streaming, x, n, y_true, labels_np, chunk,
                       output_dir) -> None:
    """Per-eps verified accuracy appended to the experiment summary.

    One deterministic interval forward per eps (defenses/ibp.py or the
    tighter crown_ibp backward bound) over the SAME evaluated images and
    the SAME label convention as the empirical grid (ground truth where
    given, pseudo-labels otherwise — so 'verified' means 'provably keeps
    the prediction the summary's accuracy column is judged by').  The
    streaming path reuses the fixed-chunk pipeline; only per-chunk count
    sums reach the host."""
    # spec presence was fail-fast-checked in main() before the grid ran
    if args.certified == "crown-ibp":
        from ..defenses.crown_ibp import make_crown_verify_fn as _mk
    else:
        from ..defenses.ibp import make_verify_fn as _mk

    verify = jax.jit(_mk(bundle.variables["params"], bundle.module.spec,
                         bundle.mean, bundle.std))
    eps_list = [float(e) for e in args.eps_list]
    print("-" * 60)
    rows = []
    if not streaming:
        for eps in eps_list:
            out = jax.device_get(verify(x, y_true, jnp.float32(eps)))
            v = float(np.mean(np.asarray(out["verified"])[:n]))
            c = float(np.mean(np.asarray(out["correct"])[:n]))
            print(f"certified({args.certified}), eps={eps:.5f}: "
                  f"verified_acc={v:.4f}, clean_acc={c:.4f} ({n} images)")
            rows.append({"eps": eps, "verified_accuracy": v,
                         "clean_accuracy": c, "count": n})
    else:
        from ..eval.streaming import EvalBatchPipeline, _merge_labels

        labels = labels_np.tolist() if labels_np is not None else None
        counts = {eps: [0, 0, 0] for eps in eps_list}  # verified, correct, n
        pipe = EvalBatchPipeline(image_paths, chunk,
                                 labels=labels, size=bundle.input_size)
        for _step, x_np, y_np, n_valid in pipe:
            xc = jnp.asarray(x_np)
            pseudo = np.asarray(jax.device_get(pseudo_fn(xc)))
            y_eff = _merge_labels(y_np, pseudo)
            yc = jnp.asarray(np.asarray(y_eff).astype(np.int32))
            for eps in eps_list:
                out = jax.device_get(verify(xc, yc, jnp.float32(eps)))
                counts[eps][0] += int(np.sum(np.asarray(out["verified"])[:n_valid]))
                counts[eps][1] += int(np.sum(np.asarray(out["correct"])[:n_valid]))
                counts[eps][2] += int(n_valid)
        for eps in eps_list:
            nv, nc, tot = counts[eps]
            v, c = nv / max(tot, 1), nc / max(tot, 1)
            print(f"certified({args.certified}), eps={eps:.5f}: "
                  f"verified_acc={v:.4f}, clean_acc={c:.4f} ({tot} images)")
            rows.append({"eps": eps, "verified_accuracy": v,
                         "clean_accuracy": c, "count": tot})
    path = output_dir / "certified_accuracy.json"
    path.write_text(json.dumps(
        {"method": args.certified, "model": args.model, "rows": rows},
        indent=2))
    print(f"Certified rows: {path}")


def _visualize_samples(logits_fn, x, y_true, eps, defense_cfg, output_dir, key):
    """Clean/adv/defended/perturbation grid (reference :423-530): PGD with
    alpha=eps/4, 10 steps, then the composite defense — one jitted program."""
    from ..attacks.pgd import pgd_linf_attack
    from ..viz.plots import plot_attack_samples

    @jax.jit
    def viz_program(x, y, k):
        probs_clean = jax.nn.softmax(logits_fn(x), -1)
        x_adv = pgd_linf_attack(logits_fn, x, y, eps=eps, alpha=eps / 4,
                                steps=10, key=k)
        x_def = defend_input(x_adv, defense_cfg)
        pred_adv = jnp.argmax(logits_fn(x_adv), -1)
        pred_def = jnp.argmax(logits_fn(x_def), -1)
        return probs_clean, x_adv, x_def, pred_adv, pred_def

    probs_clean, x_adv, x_def, pred_adv, pred_def = map(
        np.asarray, jax.device_get(viz_program(x, y_true, key))
    )
    y_np = np.asarray(y_true)
    samples = [
        {
            "x": np.asarray(x[i]),
            "x_adv": x_adv[i],
            "x_def": x_def[i],
            "pred_clean": int(y_np[i]),
            "conf_clean": float(probs_clean[i, y_np[i]]),
            "pred_adv": int(pred_adv[i]),
            "pred_def": int(pred_def[i]),
        }
        for i in range(x.shape[0])
    ]
    out = plot_attack_samples(samples, output_dir, eps)
    print(f"Saved sample visualization: {out}")


if __name__ == "__main__":
    sys.exit(main())
