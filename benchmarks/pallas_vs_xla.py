"""Microbenchmark: pallas kernels vs XLA-fused jnp for the elementwise paths.

Run on a real TPU: ``python benchmarks/pallas_vs_xla.py``.

This is the measurement behind ops/pallas_ops.py's routing policy: a
standalone elementwise op is bandwidth-bound either way, so pallas wins only
if it avoids extra HBM round-trips; inside the PGD loop XLA fuses the chain
into the conv backward and standalone calls can't compete.

MEASUREMENT CAVEAT (remote-attached TPUs): when the chip is reached through
a relay (axon), client-side wall-clock for sub-millisecond programs is not
trustworthy — ``block_until_ready`` latencies come back faster than HBM
bandwidth allows, i.e. readiness is acknowledged ahead of completion.  Treat
numbers here as relative indications only; programs lasting >100 ms (like
bench.py's PGD-10 at batch 128) time accurately.  On a locally attached TPU
this harness measures truthfully.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    from image_recognition_adversarial_example_attack_tpu.attacks.pgd import pgd_step
    from image_recognition_adversarial_example_attack_tpu.defenses.preprocess import (
        defense_quantization,
    )
    from image_recognition_adversarial_example_attack_tpu.ops import (
        pgd_step_pallas,
        quantize_pallas,
    )

    rng = np.random.RandomState(0)
    shape = (128, 224, 224, 3)
    x = jnp.asarray(rng.rand(*shape), jnp.float32)
    g = jnp.asarray(rng.randn(*shape).astype(np.float32))
    x0 = jnp.asarray(rng.rand(*shape), jnp.float32)
    nbytes = int(np.prod(shape)) * 4

    eps, alpha = 8 / 255, 2 / 255
    xla_step = jax.jit(lambda x, g, x0: pgd_step(x, g, x0, eps, alpha))
    pls_step = jax.jit(lambda x, g, x0: pgd_step_pallas(x, g, x0, eps, alpha))

    t_xla = timeit(xla_step, x, g, x0)
    t_pls = timeit(pls_step, x, g, x0)
    # 3 reads + 1 write
    print(f"pgd_step   XLA: {t_xla*1e3:7.3f} ms  ({4*nbytes/t_xla/1e9:6.1f} GB/s)")
    print(f"pgd_step   PLS: {t_pls*1e3:7.3f} ms  ({4*nbytes/t_pls/1e9:6.1f} GB/s)")

    xla_q = jax.jit(lambda x: defense_quantization(x))
    pls_q = jax.jit(lambda x: quantize_pallas(x))
    t_xla = timeit(xla_q, x)
    t_pls = timeit(pls_q, x)
    print(f"quantize   XLA: {t_xla*1e3:7.3f} ms  ({2*nbytes/t_xla/1e9:6.1f} GB/s)")
    print(f"quantize   PLS: {t_pls*1e3:7.3f} ms  ({2*nbytes/t_pls/1e9:6.1f} GB/s)")


if __name__ == "__main__":
    main()
