"""Adversarial-training throughput on the CIFAR family (WRN/PreActResNet).

The reference cannot train robust models at all (it consumes a RobustBench
checkpoint); this framework trains them from scratch, and on TPU the whole
optimization step — PGD-k attack on current params + param grads + optax
update — is ONE compiled program (train/adversarial.py).  This benchmark
measures that step end to end.

    python benchmarks/at_bench.py --model wrn28_10 --batch 256 --steps 7

Numbers land in docs/EXPERIMENTS.md.  Batch 256 at 32x32 keeps each
program in the multi-hundred-ms range the relay times reliably
(CLAUDE.md: sub-100ms device timings over the tunnel are not
trustworthy).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("ADV_TPU_PLATFORM") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="wrn28_10",
                    choices=["wrn28_10", "wrn34_10", "preact_resnet18",
                             "wrn_tiny"])
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=7,
                    help="PGD steps inside the training step")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--objective", default="pgd-at",
                    choices=["pgd-at", "trades"])
    args = ap.parse_args()

    from image_recognition_adversarial_example_attack_tpu.models.zoo import (
        load_model,
    )
    from image_recognition_adversarial_example_attack_tpu.train.adversarial import (
        AdvTrainConfig,
        make_trades_step,
        make_train_step,
        train_state_from_bundle,
    )

    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    print(f"device: {jax.devices()[0]}  model: {args.model}  "
          f"batch: {args.batch}  pgd-{args.steps}  {args.objective}")
    bundle = load_model(args.model, dtype=dtype)
    size = bundle.input_size
    cfg = AdvTrainConfig(eps=8 / 255, alpha=2 / 255,
                         attack_steps=args.steps, learning_rate=1e-3,
                         total_steps=1000)
    state = train_state_from_bundle(bundle, cfg)
    make = make_trades_step if args.objective == "trades" else make_train_step
    step = jax.jit(make(cfg, bundle.mean, bundle.std))

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(args.batch, size, size, 3), jnp.float32)
    y = jnp.asarray(rng.randint(0, 10, args.batch), jnp.int32)
    k = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    state, m = step(state, x, y, k)
    jax.block_until_ready(m["loss"])
    print(f"compile+run: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    for i in range(args.iters):
        state, m = step(state, x, y, jax.random.fold_in(k, i + 1))
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / args.iters
    print(f"steady: {dt * 1e3:.1f} ms/step = {args.batch / dt:.0f} ex/s "
          f"(loss {float(m['loss']):.3f})")


if __name__ == "__main__":
    main()
