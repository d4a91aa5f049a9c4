"""Throughput of every attack in the zoo on the real chip.

One JSON line per attack: examples/sec at batch 128, ``--model`` @224 bf16
(default ResNet-50; any ImageNet family in the zoo — VERDICT r4 #2 wants
the transformer case, where conv-specific assumptions like TI-FGSM's
depthwise translation kernel and the detector's feature taps meet a
ViT/Swin at speed), 10 gradient steps for the iterative attacks (so
PGD-family numbers are comparable to bench.py's headline), CW 100 steps,
Square 200 queries, DeepFool 10 steps x 10 classes, NES/SPSA 10 steps x
16 probe pairs, HSJA 5 iterations x 16 probes.

Usage: python benchmarks/attack_zoo_bench.py [--model vit_b_16]
           [--batch 128] [--iters 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--attacks", nargs="+",
                    default=["fgsm", "pgd", "pgd_l2", "mifgsm", "dim", "tim",
                             "apgd", "cw", "square", "deepfool", "nes",
                             "spsa", "hsja", "ead"])
    ap.add_argument("--model", default="resnet50",
                    help="any ImageNet family in the zoo (bench.BENCH_MODELS)")
    ap.add_argument("--size", type=int, default=224)
    args = ap.parse_args()

    import bench
    from image_recognition_adversarial_example_attack_tpu.attacks import (
        AttackParams,
        run_attack,
    )

    # weights cross the jit boundary as an explicit argument (the relay
    # serializes closure constants into the compile payload; vit_b_16's
    # 344 MB -> HTTP 413 — same fix as bench.build_model)
    apply_fn, variables = bench.build_model(args.model, args.size)

    rng = np.random.RandomState(0)
    x = jnp.asarray(
        rng.rand(args.batch, args.size, args.size, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 1000, size=(args.batch,)).astype(np.int32))
    params = AttackParams(eps=8 / 255, alpha=2 / 255, steps=10,
                          cw_steps=100, square_steps=200,
                          deepfool_steps=10, est_samples=16,
                          hsja_steps=5, hsja_probes=16)

    for name in args.attacks:
        fn = jax.jit(
            lambda v, x, y, k, a=name: run_attack(
                a, lambda xx: apply_fn(v, xx), x, y, params, k)
        )
        key = jax.random.PRNGKey(0)
        try:
            # two fenced warmups like bench.measure (the first post-compile
            # call over the relay is reliably slower than steady state;
            # block_until_ready can return early — bench._fence)
            bench._fence(fn(variables, x, y, key))
            bench._fence(fn(variables, x, y, jax.random.fold_in(key, 999)))
            t0 = time.perf_counter()
            out = None
            for i in range(args.iters):
                out = fn(variables, x, y, jax.random.fold_in(key, i))
            bench._fence(out)
            dt = time.perf_counter() - t0
            print(json.dumps({
                "attack": name, "model": args.model,
                "ex_per_s": round(args.batch * args.iters / dt, 1),
                "batch": args.batch,
                "budget": (params.square_steps if name == "square" else
                           params.cw_steps if name == "cw" else
                           1 if name == "fgsm" else
                           params.deepfool_steps if name == "deepfool" else
                           params.hsja_steps if name == "hsja" else
                           params.cw_steps if name == "ead" else
                           params.steps),
            }))
        except Exception as e:
            print(json.dumps({"attack": name, "model": args.model,
                              "error": f"{type(e).__name__}: {e}"[:200]}))
        sys.stdout.flush()
        jax.clear_caches()


if __name__ == "__main__":
    main()
