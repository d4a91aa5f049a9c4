"""On-chip throughput of the certified arm: IBP / CROWN-IBP on cnn7.

Measures, on whatever device JAX provides (the real v5e via the axon
relay, or CPU with ADV_TPU_PLATFORM=cpu):

  - certified-training step throughput for --objective ibp and
    --objective crown-ibp on ibp_cnn7 (the Zhang et al. 2020 benchmark
    net, 32x32 CIFAR shapes), batch 128
  - verification throughput for certify --method ibp / crown-ibp

Steady-state timing only (first call compiles); multi-hundred-ms
program windows, which the relay reports reliably (CLAUDE.md).

    python benchmarks/ibp_bench.py [--batch 128] [--iters 20]
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


def _time(fn, *args, iters):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--model", type=str, default="ibp_cnn7")
    args = p.parse_args()

    from image_recognition_adversarial_example_attack_tpu.defenses.crown_ibp import (
        make_crown_verify_fn,
    )
    from image_recognition_adversarial_example_attack_tpu.defenses.ibp import (
        make_verify_fn,
    )
    from image_recognition_adversarial_example_attack_tpu.models.zoo import (
        load_model,
    )
    from image_recognition_adversarial_example_attack_tpu.train.adversarial import (
        AdvTrainConfig,
        make_ibp_step,
        train_state_from_bundle,
    )

    print(f"device: {jax.devices()[0]}")
    bundle = load_model(args.model)
    spec = bundle.module.spec
    n_params = sum(int(np.prod(v.shape))
                   for v in jax.tree.leaves(bundle.variables["params"]))
    print(f"{args.model}: {n_params / 1e6:.1f}M params, batch {args.batch}")

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(0, 1, (args.batch, 32, 32, 3)).astype(
        np.float32))
    y = jnp.asarray(rng.randint(0, 10, args.batch))
    key = jax.random.PRNGKey(0)

    results = {}
    for bound in ("ibp", "crown"):
        config = AdvTrainConfig(eps=8 / 255, learning_rate=5e-4,
                                ibp_ramp_steps=0, ibp_bound=bound)
        state = train_state_from_bundle(bundle, config)
        # zoo params may be host numpy; a REAL training loop threads the
        # device-side output state, so only step 1 pays the host->device
        # transfer.  Pin the state on device up front or this bench would
        # re-upload the 67 MB dense kernel over the relay EVERY iteration
        # (measured: 1.7 s/call of pure transfer, 25x the actual step).
        state = jax.device_put(state)
        step = jax.jit(make_ibp_step(config, spec, bundle.mean, bundle.std))

        def run(state=state, step=step):
            s, m = step(state, x, y, key)
            return m["loss"]

        t0 = time.perf_counter()
        dt = _time(run, iters=args.iters)
        results[f"train_{bound}"] = args.batch / dt
        print(f"train step ({bound}): {dt * 1e3:.1f} ms/step = "
              f"{args.batch / dt:.0f} ex/s "
              f"(compile+1st {time.perf_counter() - t0 - dt * args.iters:.0f}s)")

    params = bundle.variables["params"]
    for name, make in (("ibp", make_verify_fn),
                       ("crown-ibp", make_crown_verify_fn)):
        verify = jax.jit(make(params, spec, bundle.mean, bundle.std))

        def run(verify=verify):
            return verify(x, y, jnp.float32(8 / 255))["margin"]

        dt = _time(run, iters=args.iters)
        results[f"verify_{name}"] = args.batch / dt
        print(f"verify ({name}): {dt * 1e3:.1f} ms/batch = "
              f"{args.batch / dt:.0f} ex/s")

    import json
    print(json.dumps({k: round(v, 1) for k, v in results.items()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
