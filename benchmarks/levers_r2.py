"""Round-2 perf lever experiments for the PGD-10 bench program (VERDICT #2).

Runs, in ONE TPU process (sequential, one compile each), and prints one
JSON line per experiment:

  base128           re-measure of the round-1 configuration
  batch384..1024    PGD-program batch sizes beyond round 1's 256 sweep
  donate128         buffer donation of the input batch (donate_argnums)
  pad4ch128         3->4 channel stem padding (zero 4th input channel,
                    conv1 kernel zero-padded to 4 input channels)

XLA-flag levers need a fresh process (env XLA_FLAGS) — see
benchmarks/PROFILE_R2.md for those runs and the conclusions.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _data(batch: int):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, 224, 224, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 1000, size=(batch,)).astype(np.int32))
    return x, y


def _measure(attack, x, y, iters: int = 5, warmup: int = 2) -> float:
    key = jax.random.PRNGKey(0)
    for i in range(warmup):
        jax.block_until_ready(attack(x, y, jax.random.fold_in(key, i)))
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = attack(x, y, jax.random.fold_in(key, 100 + i))
    jax.block_until_ready(out)
    return x.shape[0] * iters / (time.perf_counter() - t0)


def _report(name: str, batch: int, ex_s: float) -> None:
    print(json.dumps({"lever": name, "batch": batch, "ex_per_s": round(ex_s, 1)}))
    sys.stdout.flush()


def run_base_and_batches(batches) -> None:
    from bench import build_attack

    for b in batches:
        try:
            attack, x, y = build_attack(b)
            ex_s = _measure(attack, x, y)
            _report("plain", b, ex_s)
        except Exception as e:  # OOM etc.
            print(json.dumps({"lever": "plain", "batch": b,
                              "error": f"{type(e).__name__}: {e}"[:200]}))
        finally:
            jax.clear_caches()


def run_donate(batch: int) -> None:
    """Donate the input batch buffer to the attack program."""
    from image_recognition_adversarial_example_attack_tpu.attacks import make_logits_fn
    from image_recognition_adversarial_example_attack_tpu.attacks.pgd import pgd_linf_attack
    from image_recognition_adversarial_example_attack_tpu.core.constants import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )
    from image_recognition_adversarial_example_attack_tpu.models.resnet import resnet50

    model = resnet50(dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )
    logits_fn = make_logits_fn(
        model, variables, IMAGENET_MEAN, IMAGENET_STD, input_dtype=jnp.bfloat16
    )

    def attack_fn(x, y, key):
        return pgd_linf_attack(
            logits_fn, x, y, eps=8 / 255, alpha=2 / 255, steps=10, key=key
        )

    attack = jax.jit(attack_fn, donate_argnums=(0,))
    x_host, y = _data(batch)
    x_host = np.asarray(x_host)
    key = jax.random.PRNGKey(0)
    # donation consumes x each call: re-put per iteration (that transfer is
    # part of a real pipeline's cost anyway)
    for i in range(2):
        jax.block_until_ready(attack(jnp.asarray(x_host), y, jax.random.fold_in(key, i)))
    t0 = time.perf_counter()
    iters = 5
    out = None
    for i in range(iters):
        out = attack(jnp.asarray(x_host), y, jax.random.fold_in(key, 100 + i))
    jax.block_until_ready(out)
    _report("donate_x", batch, batch * iters / (time.perf_counter() - t0))
    jax.clear_caches()


def run_pad4ch(batch: int) -> None:
    """Zero-pad input + conv1 kernel to 4 channels; attack in 4-ch space,
    gradient sliced back to 3 channels implicitly by jax.grad."""
    from image_recognition_adversarial_example_attack_tpu.attacks import make_logits_fn
    from image_recognition_adversarial_example_attack_tpu.attacks.pgd import pgd_linf_attack
    from image_recognition_adversarial_example_attack_tpu.core.constants import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )
    from image_recognition_adversarial_example_attack_tpu.models.resnet import resnet50

    model = resnet50(dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )
    # pad conv1 kernel [7,7,3,64] -> [7,7,4,64] with a zero input-channel row
    params = variables["params"]
    k = params["conv1"]["kernel"]
    k4 = jnp.pad(k, ((0, 0), (0, 0), (0, 1), (0, 0)))
    variables = {
        **variables,
        "params": {**params, "conv1": {**params["conv1"], "kernel": k4}},
    }
    mean4 = np.append(np.asarray(IMAGENET_MEAN, np.float32), 0.0)
    std4 = np.append(np.asarray(IMAGENET_STD, np.float32), 1.0)
    logits_fn = make_logits_fn(
        model, variables, mean4, std4, input_dtype=jnp.bfloat16
    )

    @jax.jit
    def attack(x4, y, key):
        return pgd_linf_attack(
            logits_fn, x4, y, eps=8 / 255, alpha=2 / 255, steps=10, key=key
        )

    x, y = _data(batch)
    x4 = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    ex_s = _measure(attack, x4, y)
    _report("pad4ch", batch, ex_s)
    jax.clear_caches()


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "batches"):
        run_base_and_batches([128, 384, 512, 768, 1024])
    if which in ("all", "donate"):
        run_donate(128)
    if which in ("all", "pad4ch"):
        run_pad4ch(128)
