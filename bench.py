"""Headline benchmark: PGD-10 adversarial examples/sec/chip, ResNet-50 @ 224².

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "examples/sec/chip", "vs_baseline": N}

vs_baseline is measured against the 5k ex/s/chip north-star target
(BASELINE.json; the reference publishes no throughput numbers — SURVEY.md §6).

The measured program is the full fused attack: 10 iterations of
forward + input-gradient + sign step + eps-ball projection + clip, compiled
once, with the model in bfloat16 (MXU) and attack state in float32.

Multi-chip: with more than one visible device (or --sharded), the batch is
sharded over a 1-D 'data' mesh — the attack is embarrassingly data-parallel
(zero per-step collectives), so aggregate throughput scales linearly and
the reported value stays per-chip.  Validate without hardware on a virtual
mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 ADV_TPU_PLATFORM=cpu \
  python bench.py --sharded --model resnet_tiny --size 64 --iters 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

if os.environ.get("ADV_TPU_PLATFORM") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np


def build_attack(batch: int, model_name: str = "resnet50", size: int = 224,
                 sharded: bool = False):
    """Returns (attack_fn, x, y); with ``sharded`` the batch is device_put
    over a 1-D 'data' mesh spanning every visible device."""
    from image_recognition_adversarial_example_attack_tpu.attacks import make_logits_fn
    from image_recognition_adversarial_example_attack_tpu.attacks.pgd import pgd_linf_attack
    from image_recognition_adversarial_example_attack_tpu.core.constants import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )
    from image_recognition_adversarial_example_attack_tpu.models.resnet import (
        resnet50,
        resnet_tiny,
    )

    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    model = resnet50(dtype=dtype) if model_name == "resnet50" else resnet_tiny(dtype=dtype)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3), jnp.float32)
    )
    logits_fn = make_logits_fn(
        model, variables, IMAGENET_MEAN, IMAGENET_STD,
        input_dtype=dtype if dtype != jnp.float32 else None,
    )

    def attack_fn(x, y, key):
        return pgd_linf_attack(
            logits_fn, x, y, eps=8 / 255, alpha=2 / 255, steps=10, key=key
        )

    rng = np.random.RandomState(0)
    x_np = rng.rand(batch, size, size, 3).astype(np.float32)
    y_np = rng.randint(0, 1000, size=(batch,)).astype(np.int32)

    if sharded:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.asarray(jax.devices()), ("data",))
        xs = NamedSharding(mesh, P("data"))
        ys = NamedSharding(mesh, P("data"))
        attack = jax.jit(attack_fn, in_shardings=(xs, ys, None),
                         out_shardings=xs)
        x = jax.device_put(x_np, xs)
        y = jax.device_put(y_np, ys)
    else:
        attack = jax.jit(attack_fn)
        x, y = jnp.asarray(x_np), jnp.asarray(y_np)
    return attack, x, y


def measure(batch: int, iters: int, warmup: int = 2, **build_kw) -> float:
    """Pipelined steady-state throughput: enqueue all iterations, block once.

    (Per-iteration blocking was measured 10% slower on remote-attached
    chips — it adds a host round-trip per batch that a real pipeline never
    pays. Each iteration here is seconds long, so this timing is accurate.)
    """
    attack, x, y = build_attack(batch, **build_kw)
    key = jax.random.PRNGKey(0)
    for i in range(warmup):
        attack(x, y, jax.random.fold_in(key, i)).block_until_ready()
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = attack(x, y, jax.random.fold_in(key, 100 + i))
    out.block_until_ready()
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=None,
                        help="per-chip batch size (default: 128, the measured optimum)")
    parser.add_argument("--sweep", action="store_true",
                        help="sweep batch sizes instead of the pinned optimum")
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--sharded", action="store_true",
                        help="force the data-mesh path (automatic when >1 device)")
    parser.add_argument("--model", choices=["resnet50", "resnet_tiny"],
                        default="resnet50",
                        help="resnet_tiny is for virtual-mesh validation only")
    parser.add_argument("--size", type=int, default=224)
    args = parser.parse_args()

    n_devices = len(jax.devices())
    sharded = args.sharded or n_devices > 1
    n_chips = n_devices if sharded else 1

    # batch 128/chip measured best on v5e (64: 374, 128: 517, 192: 444,
    # 256: 473, 384-1024: 431-463 ex/s — benchmarks/PROFILE_R2.md);
    # pinning it keeps the driver's run short and compile-count 1.
    per_chip_batches = [args.batch] if args.batch else (
        [64, 128, 192, 256] if args.sweep else [128])
    best = 0.0
    best_batch = 0
    for b in per_chip_batches:
        global_batch = b * n_chips
        try:
            ex_s = measure(global_batch, args.iters, model_name=args.model,
                           size=args.size, sharded=sharded)
        except Exception as e:  # OOM at large batch etc. — keep best so far
            print(f"batch {global_batch}: {type(e).__name__}: {e}", file=sys.stderr)
            continue
        print(f"batch {global_batch} ({b}/chip x {n_chips}): {ex_s:.1f} ex/s aggregate",
              file=sys.stderr)
        if ex_s > best:
            best, best_batch = ex_s, b

    if best <= 0.0:
        print("bench failed: no batch size produced a measurement", file=sys.stderr)
        sys.exit(1)

    # the attack is data-parallel with zero per-step collectives: the
    # honest per-chip number is aggregate / chips (== the measurement
    # itself when unsharded on exactly one chip)
    per_chip = best / n_chips
    print(
        json.dumps(
            {
                "metric": "pgd10_resnet50_224_adv_examples_per_sec_per_chip",
                "value": round(per_chip, 1),
                "unit": "examples/sec/chip",
                "vs_baseline": round(per_chip / 5000.0, 4),
                "aggregate_ex_per_s": round(best, 1),
                "batch": best_batch,
                "sharded": sharded,
                "n_chips": n_chips,
                "devices_visible": n_devices,
                "device": str(jax.devices()[0]),
                "model": args.model,
                "size": args.size,
            }
        )
    )


if __name__ == "__main__":
    main()
