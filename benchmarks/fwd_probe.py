"""One timing methodology for end-to-end ResNet-50 forward numbers.

Round-3 committed two bf16 forward numbers that disagree by 1.7x:
ROOFLINE.md had 10,470 img/s (scan-chained program) next to
5,899-6,127 img/s (int8_probe-style PER-CALL timing, where every ~12 ms
forward eats a host->relay round-trip the chained ops never pay).  This
probe measures BOTH methodologies for bf16 AND int8 in ONE process so
the discrepancy is explained by a measured per-call overhead, and the
int8 end-to-end speedup is restated from uncontaminated (chained)
numbers.  (VERDICT r3 next #2.)

Methodologies:
- chained: ``lax.scan`` over ``iters`` full forwards inside ONE compiled
  program; each iteration's input depends on the previous iteration's
  logits (a scalar bump), so XLA cannot CSE or elide any forward.  Total
  device time is multi-second -> trustworthy over the relay (CLAUDE.md
  timing rule).
- per-call: one jitted forward per host call, transfer-fenced (the
  int8_probe harness).  The DIFFERENCE chained-vs-per-call is the relay
  round-trip each call pays.

Run on the real chip (one TPU process at a time):
    python benchmarks/fwd_probe.py [--batch 128] [--iters 40]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if os.environ.get("ADV_TPU_PLATFORM") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def make_forward(model_name: str, size: int, int8: bool):
    from image_recognition_adversarial_example_attack_tpu.attacks import (
        make_logits_fn,
    )
    from image_recognition_adversarial_example_attack_tpu.core.constants import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )
    from image_recognition_adversarial_example_attack_tpu.models.resnet import (
        resnet50,
        resnet_tiny,
    )

    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    make = resnet50 if model_name == "resnet50" else resnet_tiny
    model = make(dtype=dtype, int8=int8)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3), jnp.float32))
    return make_logits_fn(model, variables, IMAGENET_MEAN, IMAGENET_STD,
                          input_dtype=dtype if dtype != jnp.float32 else None)


def fence(out) -> np.ndarray:
    """Sync via a tiny host TRANSFER — plain block_until_ready after an
    untransferred warmup was measured returning instantly over the relay
    (reads as physically-impossible TF/s; see int8_probe.py)."""
    return np.asarray(jnp.ravel(out)[:4])


def time_chained(logits_fn, x, iters: int, repeats: int) -> float:
    """Seconds per forward, measured from ONE compiled scan of ``iters``
    sequentially-dependent forwards."""

    def chain(x0, bump0):
        def body(carry, _):
            x, bump = carry
            logits = logits_fn(x + bump)
            nxt = (jnp.mean(logits.astype(jnp.float32)) * 1e-6).astype(x.dtype)
            return (x, nxt), None

        (xf, bf), _ = lax.scan(body, (x0, bump0), None, length=iters)
        return xf[0, 0, 0, 0] + bf

    f = jax.jit(chain)
    fence(f(x, jnp.asarray(0.0, x.dtype)))  # compile + real sync
    best = float("inf")
    for i in range(1, repeats + 1):
        t0 = time.perf_counter()
        fence(f(x, jnp.asarray(i * 1e-9, x.dtype)))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def time_per_call(logits_fn, x, calls: int) -> float:
    """Seconds per forward, one host call per forward (the harness the
    round-3 int8 table used — includes a relay round-trip per call)."""
    f = jax.jit(lambda xx, i: logits_fn(xx + i))
    fence(f(x, jnp.asarray(0.0, x.dtype)))
    best = float("inf")
    for i in range(1, calls + 1):
        t0 = time.perf_counter()
        fence(f(x, jnp.asarray(i * 1e-9, x.dtype)))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--iters", type=int, default=40,
                    help="forwards chained inside the scan program")
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("--per_call_reps", type=int, default=8)
    ap.add_argument("--model", choices=["resnet50", "resnet_tiny"],
                    default="resnet50")
    args = ap.parse_args()

    b = args.batch
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(b, args.size, args.size, 3).astype(np.float32))
    print(f"device: {jax.devices()[0]}  batch={b} size={args.size}", flush=True)

    rows = {}
    for mode in ("bf16", "int8"):
        fn = make_forward(args.model, args.size, int8=(mode == "int8"))
        tc = time_chained(fn, x, args.iters, args.repeats)
        tp = time_per_call(fn, x, args.per_call_reps)
        rows[mode] = (tc, tp)
        print(f"{mode}: chained {tc * 1e3:7.2f} ms/fwd -> {b / tc:8.0f} img/s"
              f" | per-call {tp * 1e3:7.2f} ms/fwd -> {b / tp:8.0f} img/s"
              f" | relay overhead {1e3 * (tp - tc):6.2f} ms/call", flush=True)

    tc_bf, tp_bf = rows["bf16"]
    tc_i8, tp_i8 = rows["int8"]
    print(f"\nint8 speedup: chained {tc_bf / tc_i8:.2f}x"
          f" | per-call {tp_bf / tp_i8:.2f}x (contaminated by the per-call"
          f" relay overhead — chained is the honest number)", flush=True)


if __name__ == "__main__":
    main()
