"""Per-family attack roofline: PGD-10 ex/s + forward img/s + MFU for every
ImageNet family in the zoo (VERDICT r4 #1).

The TPU-first claim needs transformer evidence, not just the conv model:
ViT-B/16 and Swin-T are the reference's own transfer targets
(/root/reference/blackbox_transfer.py:25-54) and the matmul-bound,
MXU-friendly case.  For each family this prints ONE JSON line:

  model, batch, fwd_img_per_s (scan-chained — the only citable methodology
  for sub-100 ms programs over the relay), pgd10_ex_per_s (bench.measure,
  pipelined steady state), gflops_per_example (XLA cost analysis of the
  compiled forward), attack_tflops_per_s (pgd rate x 20 fwd-equivalents x
  fwd GF/ex), mfu_pct (vs the v5e's 197 TF/s bf16 peak), and
  pgd_over_fwd20 (how close the fused attack sits to its own fwd/20
  ceiling — 1.0 means the attack loop adds zero overhead).

Run on the real chip (ONE TPU process at a time; compiles dominate):
    python benchmarks/family_roofline.py [--models resnet50 vit_b_16 ...]
    python benchmarks/family_roofline.py --batch 128 --iters 3

CPU smoke (virtual devices fine):
    ADV_TPU_PLATFORM=cpu python benchmarks/family_roofline.py \
        --models resnet_tiny --batch 8 --size 64 --iters 1
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if os.environ.get("ADV_TPU_PLATFORM") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

import bench

V5E_BF16_PEAK_TFLOPS = 197.0

# order: conv families, then the transformers, then the depthwise/cheap ones
DEFAULT_MODELS = ["resnet50", "vgg19", "densenet121", "convnext_tiny",
                  "vit_b_16", "swin_t", "efficientnet_b0", "mobilenet_v2"]


def forward_gflops_per_example(model_name: str, size: int, batch: int) -> float | None:
    """FLOPs/example of the compiled forward via XLA cost analysis.

    Variables are an EXPLICIT lowering argument: ``jit.lower()`` inlines
    closure-captured weights as HLO literals even when device-resident,
    which blows the axon remote-compile payload past its ~0.5 GB limit
    (vgg19 -> HTTP 413, measured r5); as parameters only their shapes
    travel.  Returns None if the backend exposes no cost analysis."""
    import warnings

    from image_recognition_adversarial_example_attack_tpu.attacks import (
        make_logits_fn,
    )
    from image_recognition_adversarial_example_attack_tpu.models.zoo import (
        load_model,
    )

    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        bundle = load_model(model_name, dtype=dtype, input_size=size)

    def fwd(variables, xx):
        lf = make_logits_fn(bundle.module, variables, bundle.mean,
                            bundle.std,
                            input_dtype=dtype if dtype != jnp.float32
                            else None)
        return lf(xx)

    x = jnp.zeros((batch, size, size, 3), jnp.float32)
    try:
        cost = (jax.jit(fwd).lower(bundle.variables, x).compile()
                .cost_analysis())
        if isinstance(cost, (list, tuple)):  # older jax returns [dict]
            cost = cost[0]
        flops = float(cost["flops"])
    except Exception as e:
        print(f"  cost_analysis unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)
        return None
    return flops / batch / 1e9


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+", default=DEFAULT_MODELS,
                    choices=bench.BENCH_MODELS)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--iters", type=int, default=3,
                    help="pipelined attack iterations for the PGD timing")
    ap.add_argument("--chain_iters", type=int, default=20,
                    help="forwards chained inside the fwd-rate scan")
    args = ap.parse_args()

    print(f"device: {jax.devices()[0]}  batch={args.batch} size={args.size}",
          file=sys.stderr, flush=True)
    for name in args.models:
        rec: dict = {"model": name, "batch": args.batch, "size": args.size}
        try:
            gf = forward_gflops_per_example(name, args.size, args.batch)
            print(f"[{name}] fwd cost: "
                  f"{gf and round(gf, 2)} GF/ex; measuring fwd rate...",
                  file=sys.stderr, flush=True)
            fwd = bench.measure_forward(args.batch, name, args.size,
                                        chain_iters=args.chain_iters)
            print(f"[{name}] fwd {fwd:.0f} img/s; measuring PGD-10...",
                  file=sys.stderr, flush=True)
            pgd = bench.measure(args.batch, args.iters, model_name=name,
                                size=args.size)
            rec.update({
                "fwd_img_per_s": round(fwd, 1),
                "pgd10_ex_per_s": round(pgd, 1),
                "pgd_over_fwd20": round(pgd / (fwd / 20.0), 4),
            })
            if gf is not None:
                # PGD-10 = 10 x (fwd + input-grad chain) ~ 20 fwd-equivalents
                attack_tf = pgd * 20.0 * gf / 1e3
                rec.update({
                    "gflops_per_example_fwd": round(gf, 2),
                    "fwd_tflops_per_s": round(fwd * gf / 1e3, 1),
                    "attack_tflops_per_s": round(attack_tf, 1),
                    "mfu_pct": round(100.0 * attack_tf / V5E_BF16_PEAK_TFLOPS, 1),
                })
        except Exception as e:
            rec["error"] = f"{type(e).__name__}: {e}"[:300]
        print(json.dumps(rec), flush=True)
        jax.clear_caches()


if __name__ == "__main__":
    main()
