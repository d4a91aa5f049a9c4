"""Adversarial fine-tuning CLI (PGD-AT / TRADES) — produce robust checkpoints.

The reference consumes a RobustBench checkpoint it cannot produce
(defense_experiments.py:674-686); this CLI closes the loop:

    python -m ...cli.adversarial_train --data_dir data/ --model resnet50 \\
        --epochs 3 --eps 0.03137 --out weights/resnet50_robust.msgpack

``--data_dir`` uses the universal subdirectory-per-class layout; classes
map to label ids by sorted directory name.  The produced msgpack drops
straight into the robust arm (``defense_experiments --model_type robust``)
and the detector/eval stack.

TPU execution: every optimization step is ONE compiled program (PGD
attack on current params + param grads + optax update — see
train/adversarial.py); the batch shards over the data mesh when more
than one device is visible.
"""

from __future__ import annotations

import argparse
import sys
import time
from dataclasses import replace
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..core.images import list_images, load_image_batch_tolerant
from ..core.rng import key_from_seed
from ..utils.pipeline import shuffle_seed
from ..train.adversarial import (AdvTrainConfig, load_train_checkpoint,
                                 make_eval_step, make_free_step,
                                 make_mart_step, make_train_step,
                                 make_trades_step, save_train_checkpoint,
                                 train_state_from_bundle)
from .common import (add_model_args, load_bundle, maybe_profile,
                     model_input_size, positive_int)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Adversarial fine-tuning: PGD-AT (Madry et al.), "
                    "TRADES or MART")
    parser.add_argument("--data_dir", type=str, default=None,
                        help="root with one subdirectory per class")
    parser.add_argument("--cifar10_dir", type=str, default=None,
                        help="root containing a standard CIFAR-10 archive "
                             "(cifar-10-batches-py or -bin; "
                             "core/datasets.py) — the natural input for "
                             "the WRN family; mutually exclusive with "
                             "--data_dir/--streaming")
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--eps", type=float, default=8 / 255)
    parser.add_argument("--alpha", type=float, default=2 / 255)
    parser.add_argument("--attack_steps", type=int, default=7)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--lr_schedule", type=str, default="constant",
                        choices=["constant", "cosine"],
                        help="cosine: linear warmup to --lr then cosine "
                             "decay to 0 over the whole run (the standard "
                             "AT recipe); schedule state lives in the "
                             "optimizer, so --resume continues it exactly")
    parser.add_argument("--warmup_steps", type=int, default=0,
                        help="linear LR warmup steps (both schedules)")
    parser.add_argument("--eval_attack_steps", type=int, default=0,
                        help=">0: also report per-epoch ROBUST accuracy "
                             "(PGD-k at --eps/--alpha) on the held slice")
    parser.add_argument("--weight_decay", type=float, default=1e-4)
    parser.add_argument("--label_smoothing", type=float, default=0.0)
    parser.add_argument("--clean_weight", type=float, default=0.0,
                        help=">0 mixes clean CE into the objective")
    parser.add_argument("--objective", type=str, default="pgd-at",
                        choices=["pgd-at", "trades", "mart", "free", "ibp",
                                 "crown-ibp"],
                        help="pgd-at: CE on PGD examples; trades: "
                             "CE(clean) + beta*KL(clean||adv); mart: "
                             "boosted CE(adv) + beta*(1-p_y(clean))*"
                             "KL(clean||adv); free: Shafahi et al. "
                             "replay training (param update + FGSM "
                             "perturbation update per replay, "
                             "adversarial examples at ~natural-training "
                             "cost — train ~epochs/replays passes); ibp: "
                             "certified training on closed-form interval "
                             "bounds (Gowal et al. 2018; ibp_* models "
                             "only — see cli/certify --method ibp); "
                             "crown-ibp: certified training on backward "
                             "linear bounds mixed with IBP via a ramped "
                             "beta (Zhang et al. 2020; tighter early "
                             "signal, same models)")
    parser.add_argument("--free_replays", type=positive_int, default=4,
                        help="free objective: replays per batch (m)")
    parser.add_argument("--trades_beta", type=float, default=6.0,
                        help="TRADES robustness/accuracy trade-off beta")
    parser.add_argument("--mart_beta", type=float, default=5.0,
                        help="MART misclassification-aware KL weight")
    parser.add_argument("--ibp_ramp_steps", type=int, default=-1,
                        help="ibp objective: optimizer steps over which "
                             "eps ramps 0->--eps and kappa 1->--ibp_kappa "
                             "(-1 = half the run's total steps; 0 = full "
                             "eps from step 0)")
    parser.add_argument("--ibp_kappa", type=float, default=0.5,
                        help="ibp objective: final weight of the clean CE "
                             "term after the ramp")
    parser.add_argument("--ibp_final_beta", type=float, default=0.0,
                        help="crown-ibp objective: final CROWN weight in "
                             "the beta_t*CROWN + (1-beta_t)*IBP margin mix "
                             "(beta ramps 1 -> this over --ibp_ramp_steps; "
                             "0 = the paper's recipe, ending on pure IBP)")
    parser.add_argument("--augment", type=str, default="none",
                        choices=["none", "crop-flip"],
                        help="crop-flip: 4-pixel-pad random crop + "
                             "horizontal flip inside the compiled step "
                             "(the standard from-scratch CIFAR AT recipe; "
                             "Madry et al. 2018) — augment, THEN attack")
    parser.add_argument("--cutout", type=int, default=0,
                        help=">0: additionally zero one NxN square per "
                             "image (DeVries & Taylor 2017; composes with "
                             "--augment)")
    parser.add_argument("--noise_sigma", type=float, default=0.0,
                        help=">0: Gaussian-noise training for randomized "
                             "smoothing (SmoothAdv inner attack + noisy CE; "
                             "with --attack_steps 0, plain Cohen "
                             "augmentation). pgd-at objective only.")
    parser.add_argument("--noise_samples", type=int, default=4,
                        help="EOT noise draws for the SmoothAdv inner attack")
    parser.add_argument("--grad_accum", type=positive_int, default=1,
                        help="micro-batches per optimizer step: the batch is "
                             "scanned in N slices inside the one compiled "
                             "step, bounding activation memory at batch/N "
                             "(effective batch and update count unchanged)")
    parser.add_argument("--ema_decay", type=float, default=0.0,
                        help=">0 (e.g. 0.999): maintain an EMA of the "
                             "parameters and EXPORT the EMA weights as the "
                             "deployment checkpoint (raw weights stay in "
                             "the .ckpt for resuming); the standard "
                             "robust-training deployment artifact")
    parser.add_argument("--train_bn", action="store_true",
                        help="batch-statistics BatchNorm — the from-"
                             "scratch training mode for the CIFAR family "
                             "(wrn*/preact_resnet18): forwards normalize "
                             "by the batch's own statistics, and running "
                             "stats are recalibrated once at export "
                             "(precise-BN) so the checkpoint deploys as a "
                             "standard inference-mode model")
    parser.add_argument("--remat", action="store_true",
                        help="jax.checkpoint the model forward: the backward "
                             "recomputes activations instead of holding them "
                             "in HBM (one extra forward per backward)")
    parser.add_argument("--out", type=str, default=None,
                        help="output .msgpack (default: weights/<model>_robust.msgpack)")
    parser.add_argument("--checkpoint_path", type=str, default=None,
                        help="full-state checkpoint file (default: <out>.ckpt)")
    parser.add_argument("--save_every", type=int, default=1,
                        help="checkpoint every N epochs (0 disables)")
    parser.add_argument("--resume", action="store_true",
                        help="restore params+optimizer+epoch from "
                             "--checkpoint_path and continue")
    parser.add_argument("--streaming", action="store_true",
                        help="decode batches in a background thread instead "
                             "of loading the whole dataset into RAM "
                             "(utils/pipeline.py; same shuffle/key schedule "
                             "as the in-RAM path)")
    add_model_args(parser)
    return parser


def _list_dataset(data_dir: Path):
    """(paths, labels, classes) without decoding anything."""
    classes = sorted(d.name for d in data_dir.iterdir() if d.is_dir())
    if not classes:
        raise SystemExit(f"no class subdirectories under {data_dir}")
    paths, labels = [], []
    for label, cname in enumerate(classes):
        for p in list_images(data_dir / cname):
            paths.append(p)
            labels.append(label)
    if not paths:
        raise SystemExit(f"no images under {data_dir}/<class>/")
    return paths, labels, classes


def _load_dataset(data_dir: Path, size: int):
    paths, labels, classes = _list_dataset(data_dir)
    x, kept = load_image_batch_tolerant(paths, size=size)
    kept_set = {str(p) for p in kept}
    y = np.asarray([l for p, l in zip(paths, labels) if str(p) in kept_set],
                   np.int32)
    return x, y, classes


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    print(f"Using device: {jax.devices()[0]}")

    if (args.data_dir is None) == (args.cifar10_dir is None):
        raise SystemExit("pass exactly one of --data_dir / --cifar10_dir")
    if args.cifar10_dir is not None and args.streaming:
        raise SystemExit("--streaming applies to --data_dir image trees "
                         "(the CIFAR archives are already one dense array)")
    size = model_input_size(args)
    if args.cifar10_dir is not None:
        from ..core.datasets import CIFAR10_CLASSES, load_cifar10

        if size != 32:
            raise SystemExit(f"--cifar10_dir is 32x32 data but --model "
                             f"{args.model} expects {size}x{size}; use the "
                             "WRN family (wrn28_10/wrn34_10)")
        x_np, y_np = load_cifar10(args.cifar10_dir, split="train")
        classes = list(CIFAR10_CLASSES)
        n = len(y_np)
        eval_x, eval_y = x_np[: min(256, n)], y_np[: min(256, n)]
    elif args.streaming:
        data_dir = Path(args.data_dir)
        ds_paths, ds_labels, classes = _list_dataset(data_dir)
        x_np = y_np = None
        n = len(ds_paths)
        # fixed held-slice for the epoch metric (decoded once, bounded RAM)
        # so streaming logs stay comparable to in-RAM runs
        eval_x, eval_kept = load_image_batch_tolerant(ds_paths[: min(256, n)],
                                                      size=size)
        kept_set = {str(Path(p)) for p in eval_kept}
        eval_y = np.asarray(
            [l for p, l in zip(ds_paths[: min(256, n)],
                               ds_labels[: min(256, n)])
             if str(Path(p)) in kept_set], np.int32)
    else:
        x_np, y_np, classes = _load_dataset(Path(args.data_dir), size)
        n = len(y_np)
        eval_x, eval_y = x_np[: min(256, n)], y_np[: min(256, n)]
    print(f"Dataset: {n} images, {len(classes)} classes {classes[:8]}"
          f"{'...' if len(classes) > 8 else ''}"
          f"{' [streaming]' if args.streaming else ''}")

    bundle = load_bundle(args)
    # fail fast if the dataset has more classes than the model head (the
    # WRN/CIFAR family has a 10-way head, the ImageNet families 1000)
    n_out = jax.eval_shape(
        bundle.module.apply, bundle.variables,
        jax.ShapeDtypeStruct((1, size, size, 3), jnp.float32)).shape[-1]
    if len(classes) > n_out:
        raise SystemExit(
            f"dataset has {len(classes)} classes but --model {args.model} "
            f"outputs {n_out}")
    # total optimizer steps for the cosine schedule — the SAME batch/accum
    # arithmetic the loop below applies, computed up front because the
    # optimizer (and thus the TrainState) closes over the schedule
    batch_plan = min(int(args.batch_size), n)
    accum_plan = max(1, min(int(args.grad_accum), batch_plan))
    if batch_plan % accum_plan:
        batch_plan = (batch_plan // accum_plan) * accum_plan
    total_steps = max(1, n // batch_plan) * int(args.epochs)
    config = AdvTrainConfig(
        eps=float(args.eps), alpha=float(args.alpha),
        attack_steps=int(args.attack_steps), learning_rate=float(args.lr),
        lr_schedule=str(args.lr_schedule),
        warmup_steps=int(args.warmup_steps),
        total_steps=int(total_steps),
        weight_decay=float(args.weight_decay),
        label_smoothing=float(args.label_smoothing),
        clean_weight=float(args.clean_weight),
        trades_beta=float(args.trades_beta),
        mart_beta=float(args.mart_beta),
        noise_sigma=float(args.noise_sigma),
        noise_samples=int(args.noise_samples),
        ibp_ramp_steps=(total_steps // 2 if int(args.ibp_ramp_steps) < 0
                        else int(args.ibp_ramp_steps)),
        ibp_kappa=float(args.ibp_kappa),
        ibp_bound="crown" if args.objective == "crown-ibp" else "ibp",
        ibp_final_beta=float(args.ibp_final_beta),
        aug_pad=4 if args.augment == "crop-flip" else 0,
        aug_flip=args.augment == "crop-flip",
        aug_cutout=int(args.cutout),
        grad_accum=int(args.grad_accum),
        remat=bool(args.remat),
        ema_decay=float(args.ema_decay),
        train_bn=bool(args.train_bn),
        free_replays=int(args.free_replays),
    )
    try:
        state = train_state_from_bundle(bundle, config)
    except ValueError as e:
        raise SystemExit(str(e))
    if args.objective == "free" and int(args.grad_accum) > 1:
        raise SystemExit("--objective free updates parameters every replay; "
                         "drop --grad_accum")
    if args.objective == "free" and args.streaming:
        # the carried perturbation is shaped [batch]; the streaming
        # pipeline's final short batches tile rows, which would mix
        # per-image perturbations — keep free on the in-RAM path
        raise SystemExit("--objective free uses a batch-shaped carried "
                         "perturbation; use the in-RAM data path")
    if args.objective != "pgd-at" and float(args.noise_sigma) > 0.0:
        print("WARNING: --noise_sigma applies to the pgd-at objective only "
              f"({args.objective} ignores it).")
    if args.objective != "pgd-at" and float(args.clean_weight) > 0.0:
        print("WARNING: --clean_weight is a PGD-AT flag; "
              f"{args.objective} already contains its own clean term "
              "and ignores it.")
    if args.objective in ("ibp", "crown-ibp"):
        if not hasattr(bundle.module, "spec"):
            raise SystemExit(
                f"--objective {args.objective} needs a spec-driven model "
                f"(ibp_cnn7 / ibp_tiny, models/ibp.py); --model "
                f"{args.model} has no interval propagator")
        if args.train_bn:
            raise SystemExit("IBP nets are BN-free by construction "
                             "(models/ibp.py); drop --train_bn")
        from ..train.adversarial import make_ibp_step

        ibp_spec = bundle.module.spec

        def make_step(config, mean, std):
            return make_ibp_step(config, ibp_spec, mean, std)
    else:
        make_step = {"trades": make_trades_step,
                     "mart": make_mart_step}.get(args.objective,
                                                 make_train_step)
    if args.objective == "free":
        # the free step has an extra carried input/output (the shared
        # perturbation, persisted across batches per the paper); adapt it
        # to the uniform (state, x, y, key) -> (state, metrics) loop shape
        free_step = jax.jit(make_free_step(config, bundle.mean, bundle.std))
        _free_delta = {"v": None}

        def train_step(state, xb, yb, kb):
            if (_free_delta["v"] is None
                    or _free_delta["v"].shape != xb.shape):
                _free_delta["v"] = jnp.zeros(xb.shape, jnp.float32)
            state, metrics, _free_delta["v"] = free_step(
                state, xb, yb, kb, _free_delta["v"])
            return state, metrics
    else:
        train_step = jax.jit(make_step(config, bundle.mean, bundle.std))
    eval_step = jax.jit(make_eval_step(bundle.mean, bundle.std))
    eval_step_ema = (jax.jit(make_eval_step(bundle.mean, bundle.std,
                                            use_ema=True))
                     if float(args.ema_decay) > 0.0 else None)
    robust_eval = None
    if int(args.eval_attack_steps) > 0:
        from ..train.adversarial import make_robust_eval_step

        robust_eval = jax.jit(make_robust_eval_step(
            int(args.eval_attack_steps), float(args.eps), float(args.alpha),
            bundle.mean, bundle.std, use_ema=float(args.ema_decay) > 0.0))
    verified_eval = None
    if args.objective in ("ibp", "crown-ibp"):
        # per-epoch CERTIFIED accuracy at the full target eps on the held
        # slice (the training metric's eps is still ramping); the
        # crown-ibp objective certifies with its own tighter bound
        if args.objective == "crown-ibp":
            from ..defenses.crown_ibp import crown_ibp_margin

            @jax.jit
            def verified_eval(state, x, y):
                m = crown_ibp_margin(state.params, ibp_spec, x, y,
                                     jnp.float32(args.eps),
                                     bundle.mean, bundle.std)
                return jnp.mean((m > 0.0).astype(jnp.float32))
        else:
            from ..defenses.ibp import logit_bounds, verified_margin

            @jax.jit
            def verified_eval(state, x, y):
                lo, hi = logit_bounds(state.params, ibp_spec, x,
                                      jnp.float32(args.eps),
                                      bundle.mean, bundle.std)
                return jnp.mean(
                    (verified_margin(lo, hi, y) > 0.0).astype(jnp.float32))

    out = Path(args.out) if args.out else (
        Path("weights") / f"{args.model}_robust.msgpack")
    ckpt_path = Path(args.checkpoint_path) if args.checkpoint_path else (
        out.with_suffix(out.suffix + ".ckpt"))

    start_epoch = 0
    if args.resume:
        if ckpt_path.is_file():
            state, start_epoch = load_train_checkpoint(state, ckpt_path)
            print(f"Resumed from {ckpt_path}: step={int(state.step)}, "
                  f"continuing at epoch {start_epoch + 1}")
        else:
            print(f"--resume: no checkpoint at {ckpt_path}; starting fresh")

    # epoch-indexed keys + shuffles: a resumed run replays the EXACT
    # schedule an uninterrupted run would have used
    key0 = key_from_seed(args.seed)
    batch = min(int(args.batch_size), n)
    # parser guarantees grad_accum >= 1; the only clamp left is batch size
    accum = min(int(args.grad_accum), batch)
    if accum != int(args.grad_accum):
        print(f"grad_accum clamped to {accum} (batch is only {batch})")
        config = replace(config, grad_accum=accum)
        train_step = jax.jit(make_step(config, bundle.mean, bundle.std))
    if batch % accum:
        # the scan needs equal micro-batches; round down so grad_accum
        # still divides (never below one image per micro-batch)
        batch = (batch // accum) * accum
        print(f"batch_size rounded to {batch} "
              f"(must divide by grad_accum={accum})")
    steps_per_epoch = max(1, n // batch)

    def end_epoch(epoch, metrics, dt):
        """Per-epoch metric line + checkpoint (shared by both data paths).
        clean_acc comes from the SAME fixed held slice in both modes."""
        nonlocal state
        ev = eval_step(state, jnp.asarray(eval_x), jnp.asarray(eval_y))
        ema_note = ""
        if eval_step_ema is not None:
            ev_ema = eval_step_ema(state, jnp.asarray(eval_x),
                                   jnp.asarray(eval_y))
            ema_note = f" ema_clean_acc={float(ev_ema['clean_accuracy']):.3f}"
        robust_note = ""
        if robust_eval is not None:
            # per-epoch key: robust accuracy is comparable across epochs
            # AND across interrupted/resumed runs (epoch-indexed, like the
            # training schedule)
            rv = robust_eval(state, jnp.asarray(eval_x), jnp.asarray(eval_y),
                             jax.random.fold_in(key0, 10_000_019 + epoch))
            robust_note = (f" robust_acc@pgd{int(args.eval_attack_steps)}="
                           f"{float(rv['robust_accuracy']):.3f}")
        if verified_eval is not None:
            va = verified_eval(state, jnp.asarray(eval_x),
                               jnp.asarray(eval_y))
            robust_note += (f" verified_acc@{float(args.eps):.4g}="
                            f"{float(va):.3f}")
        print(f"epoch {epoch + 1}/{args.epochs}: "
              f"loss={float(metrics['loss']):.4f} "
              f"adv_acc={float(metrics['adv_accuracy']):.3f} "
              f"clean_acc={float(ev['clean_accuracy']):.3f}{ema_note}"
              f"{robust_note} "
              f"({steps_per_epoch * batch / dt:.1f} ex/s)")
        if args.save_every and (epoch + 1) % int(args.save_every) == 0:
            save_train_checkpoint(state, ckpt_path, epoch)

    with maybe_profile(args.profile_dir):
        if args.streaming:
            # ONE pipeline across every remaining epoch: decode of epoch
            # e+1's first batch overlaps epoch e's last device step
            from ..utils.pipeline import BatchPipeline

            pipe = BatchPipeline(ds_paths, ds_labels, batch,
                                 epochs=int(args.epochs),
                                 start_epoch=start_epoch,
                                 seed=int(args.seed), size=size)
            cur_epoch, ek = None, None
            t0 = time.perf_counter()
            metrics = {}
            for epoch, s, xb, yb in pipe:
                if epoch != cur_epoch:
                    if cur_epoch is not None:
                        jax.block_until_ready(metrics)
                        end_epoch(cur_epoch, metrics, time.perf_counter() - t0)
                        t0 = time.perf_counter()
                    cur_epoch = epoch
                    ek = jax.random.fold_in(key0, epoch)
                state, metrics = train_step(
                    state, jnp.asarray(xb), jnp.asarray(yb),
                    jax.random.fold_in(ek, s))
            if cur_epoch is not None:
                jax.block_until_ready(metrics)
                end_epoch(cur_epoch, metrics, time.perf_counter() - t0)
        else:
            for epoch in range(start_epoch, int(args.epochs)):
                ek = jax.random.fold_in(key0, epoch)
                t0 = time.perf_counter()
                metrics = {}
                order = np.random.RandomState(
                    shuffle_seed(int(args.seed), epoch)).permutation(n)
                for s in range(steps_per_epoch):
                    idx = order[s * batch:(s + 1) * batch]
                    if len(idx) < batch:  # keep one static batch shape
                        idx = np.concatenate([idx, order[: batch - len(idx)]])
                    state, metrics = train_step(
                        state, jnp.asarray(x_np[idx]), jnp.asarray(y_np[idx]),
                        jax.random.fold_in(ek, s))
                jax.block_until_ready(metrics)
                end_epoch(epoch, metrics, time.perf_counter() - t0)
    from ..models.zoo import save_variables
    from ..train.adversarial import deploy_params

    if args.train_bn:
        # precise-BN: one calibration sweep gives the exported checkpoint
        # real running statistics (training normalized by batch stats)
        from ..train.adversarial import calibrate_batch_stats

        calib_x = jnp.asarray(x_np if x_np is not None else eval_x)
        print(f"Calibrating BatchNorm running statistics "
              f"({calib_x.shape[0]} images, precise-BN sweep)...")
        state = state.replace(extra_variables=calibrate_batch_stats(
            state, calib_x, bundle.mean, bundle.std,
            batch_size=min(256, batch)))

    # ship the EMA shadow when maintained (the deployment-standard
    # artifact); the raw weights remain in the .ckpt for exact resume
    variables = {"params": deploy_params(state), **state.extra_variables}
    save_variables(variables, out)
    which = "EMA" if state.ema_params is not None else "raw"
    print(f"Saved adversarially fine-tuned checkpoint ({which} weights): {out}")
    # fine-tuning keeps the base model's ImageNet normalization, so the
    # checkpoint belongs on the STANDARD arm (the robust arm applies
    # identity normalization for RobustBench-style checkpoints)
    print(f"Use it via: defense_experiments --model {args.model} "
          f"--weights {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
