"""Does XLA:TPU lower int8 conv/matmul onto the int8 MXU path on v5e?

The v5e datasheet rates 394 TOPS int8 vs 197 TFLOP/s bf16 — IF the
compiler emits the int8 systolic path.  This probe measures a chained
3x3/256ch conv stack and a fat matmul in bf16 vs int8
(``preferred_element_type=int32`` + requantize) at serving-relevant
shapes.  A >=1.5x conv win justifies a real int8 inference path
(per-channel weight quant + dynamic activation quant); a neutral result
gets recorded in PROFILE_R2.md like the Pallas conv probe — measured,
not inferred.

Run on the real chip (one TPU process at a time):
    python benchmarks/int8_probe.py [--iters 80] [--batch 64]
Timing rule (CLAUDE.md): only multi-hundred-ms programs are trustworthy
over the relay, hence the in-program lax.scan chaining.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timeit(fn, x, w, repeats=5):
    """fn(x, w, i): the varying i is MIXED INTO x so no two calls are
    identical, and the sync fence is a tiny host TRANSFER of the result —
    a plain block_until_ready after an un-transferred warmup was measured
    returning instantly over the relay (physically-impossible TF/s)."""
    def fence(out):  # transfer 4 elements — sync without bulk transfer
        return np.asarray(jnp.ravel(out)[:4])

    fence(fn(x, w, 0))  # compile + real sync
    best = float("inf")
    for i in range(1, repeats + 1):
        t0 = time.perf_counter()
        fence(fn(x, w, i))
        best = min(best, time.perf_counter() - t0)
    return best


def conv_chain_bf16(x, w, iters):
    def body(x, _):
        y = lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y, None

    y, _ = lax.scan(body, x, None, length=iters)
    return y


def conv_chain_int8(x, w, iters):
    def body(x, _):
        acc = lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        # requantize for TIMING only: >>7 then a wrapping int8 cast (the
        # accumulator does NOT fit int8 — values wrap mod 256, which is
        # fine here because the probe measures throughput, not numerics;
        # the real inference path in ops/int8.py rescales in float)
        return lax.shift_right_arithmetic(acc, 7).astype(jnp.int8), None

    y, _ = lax.scan(body, x, None, length=iters)
    return y


def matmul_chain(x, w, iters, int8):
    def body(x, _):
        if int8:
            acc = lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            # wrapping requant — timing only, see conv_chain_int8
            return lax.shift_right_arithmetic(acc, 7).astype(jnp.int8), None
        return jnp.dot(x, w), None

    y, _ = lax.scan(body, x, None, length=iters)
    return y


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=80)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--hw", type=int, default=56)
    ap.add_argument("--ch", type=int, default=256)
    ap.add_argument("--mm", type=int, default=4096, help="matmul square dim")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    # ---- conv stack ----
    b, hw, ch, iters = args.batch, args.hw, args.ch, args.iters
    conv_flops = 2.0 * b * hw * hw * ch * ch * 9 * iters
    x8 = jnp.asarray(rng.randint(-64, 64, (b, hw, hw, ch)), jnp.int8)
    w8 = jnp.asarray(rng.randint(-64, 64, (3, 3, ch, ch)), jnp.int8)
    xb = jnp.asarray(rng.randn(b, hw, hw, ch), jnp.bfloat16)
    wb = jnp.asarray(rng.randn(3, 3, ch, ch) * 0.05, jnp.bfloat16)

    f_bf = jax.jit(lambda x, w, i: conv_chain_bf16(
        x + jnp.asarray(i, x.dtype), w, iters))
    f_i8 = jax.jit(lambda x, w, i: conv_chain_int8(
        x + jnp.asarray(i, x.dtype), w, iters))
    t_bf = timeit(f_bf, xb, wb)
    t_i8 = timeit(f_i8, x8, w8)
    print(f"conv3x3 {ch}ch @{hw}^2 B={b} x{iters}:")
    print(f"  bf16: {t_bf * 1e3:8.1f} ms  {conv_flops / t_bf / 1e12:6.1f} TF/s")
    print(f"  int8: {t_i8 * 1e3:8.1f} ms  {conv_flops / t_i8 / 1e12:6.1f} TOP/s"
          f"   speedup {t_bf / t_i8:.2f}x", flush=True)

    # ---- matmul stack ----
    m = args.mm
    mm_flops = 2.0 * m * m * m * iters
    a8 = jnp.asarray(rng.randint(-64, 64, (m, m)), jnp.int8)
    b8 = jnp.asarray(rng.randint(-64, 64, (m, m)), jnp.int8)
    ab = jnp.asarray(rng.randn(m, m), jnp.bfloat16)
    bb = jnp.asarray(rng.randn(m, m) * 0.05, jnp.bfloat16)
    g_bf = jax.jit(lambda x, w, i: matmul_chain(
        x + jnp.asarray(i, x.dtype), w, iters, False))
    g_i8 = jax.jit(lambda x, w, i: matmul_chain(
        x + jnp.asarray(i, x.dtype), w, iters, True))
    t_bf = timeit(g_bf, ab, bb)
    t_i8 = timeit(g_i8, a8, b8)
    print(f"matmul {m}x{m} x{iters}:")
    print(f"  bf16: {t_bf * 1e3:8.1f} ms  {mm_flops / t_bf / 1e12:6.1f} TF/s")
    print(f"  int8: {t_i8 * 1e3:8.1f} ms  {mm_flops / t_i8 / 1e12:6.1f} TOP/s"
          f"   speedup {t_bf / t_i8:.2f}x", flush=True)


if __name__ == "__main__":
    main()
