"""Pallas conv probe: hand-written 3x3 conv vs XLA's conv codegen.

Closes the last open perf claim from rounds 1-2 (VERDICT r2 weak #1 /
next #5): benchmarks/PROFILE_R2.md measured XLA's fused conv stack at
~24% MXU utilization on ResNet-50's small-channel convs and ATTRIBUTED
the remaining throughput gap to XLA conv codegen — but only by
elimination.  This probe makes that claim a measurement: ONE
representative conv (stage-1 bottleneck 3x3, 56x56x64 -> 56x56x64, the
shape class where 24% MXU was observed) hand-written in Pallas as an
explicit im2col + MXU matmul, benchmarked against
``lax.conv_general_dilated`` at batch 128 in bf16 (the model path's
dtype).

Kernel design (per the TPU Pallas guide):
- grid over the batch; per program the padded image [58,58,64] lives in
  VMEM (430 KB bf16), the 3x3x64x64 filter is broadcast to every program;
- im2col = nine shifted [56,56,64] slices concatenated channel-wise to
  [3136, 576] (a layout no-op reshape), one MXU matmul
  [3136,576] x [576,64] with f32 accumulation (preferred_element_type);
- total VMEM/program ~4.9 MB — comfortably under 16 MB, no manual DMA
  needed (pallas_call pipelines the per-program blocks).

The matmul's N=64 occupies half the MXU's 128 lanes, so the SHAPE-level
ceiling is ~50% MXU regardless of scheduling — the point of the probe is
whether hand scheduling beats XLA's 24%, not whether it reaches peak.

Usage (real chip):   python benchmarks/pallas_conv_probe.py
CPU sanity check:    ADV_TPU_PLATFORM=cpu python benchmarks/pallas_conv_probe.py --interpret --batch 2

Results are recorded in benchmarks/PROFILE_R2.md ("Round 3: Pallas conv
probe") — committed win or lose.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time

if os.environ.get("ADV_TPU_PLATFORM") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H = W = 56
C_IN = C_OUT = 64
K = 3


def _conv_kernel(x_ref, w_ref, o_ref, patches_ref):
    """One image: [1,58,58,64] x [3,3,64,64] -> [1,56,56,64].

    The nine shifted slices are STORED into one aligned VMEM scratch
    (direct concat of offset slices hits a Mosaic 'offset mismatch on
    non-concat dimension' limitation — measured, see PROFILE_R2.md r3
    section); the zero-offset scratch then reshapes to the [3136, 576]
    im2col matrix for ONE K=576 MXU matmul.
    """
    for idx, (dy, dx) in enumerate((dy, dx) for dy in range(K)
                                   for dx in range(K)):
        patches_ref[:, :, idx * C_IN:(idx + 1) * C_IN] = (
            x_ref[0, dy:dy + H, dx:dx + W, :])
    patches = patches_ref[:].reshape(H * W, K * K * C_IN)
    w = w_ref[:].reshape(K * K * C_IN, C_OUT)
    acc = jnp.dot(patches, w, preferred_element_type=jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype).reshape(H, W, C_OUT)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_conv3x3(x, w, interpret: bool = False):
    """NHWC 3x3 stride-1 same-pad conv via the Pallas kernel.

    ``x``: [B,56,56,64]; ``w``: [3,3,64,64] (HWIO).  The weight's index
    map pins every grid step to the same (single) block, so the filter is
    loaded to VMEM once, not per image.
    """
    b = x.shape[0]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return pl.pallas_call(
        _conv_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, H + 2, W + 2, C_IN), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K, C_IN, C_OUT), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, C_OUT), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, H, W, C_OUT), x.dtype),
        scratch_shapes=[pltpu.VMEM((H, W, K * K * C_IN), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * H * W * K * K * C_IN * C_OUT,
            bytes_accessed=x.nbytes + w.nbytes + b * H * W * C_OUT * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, w)


@jax.jit
def xla_conv3x3(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _time(fn, *args, iters: int) -> float:
    jax.block_until_ready(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dtype", type=str, default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--interpret", action="store_true",
                    help="Pallas interpreter mode (CPU sanity check)")
    args = ap.parse_args()

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(args.batch, H, W, C_IN), dtype)
    w = jnp.asarray(rng.randn(K, K, C_IN, C_OUT) * 0.05, dtype)

    ours = pallas_conv3x3(x, w, interpret=args.interpret)
    ref = xla_conv3x3(x, w)
    err = float(jnp.max(jnp.abs(ours.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) or 1.0
    rel = err / scale
    assert rel < 3e-2, f"numerics mismatch: rel={rel}"

    flops = 2 * args.batch * H * W * K * K * C_IN * C_OUT
    t_pallas = _time(lambda a, b: pallas_conv3x3(a, b, interpret=args.interpret),
                     x, w, iters=args.iters)
    t_xla = _time(xla_conv3x3, x, w, iters=args.iters)
    peak = 197e12  # v5e bf16 peak FLOP/s
    result = {
        "probe": "pallas_conv3x3_stage1",
        "batch": args.batch,
        "dtype": args.dtype,
        "device": str(jax.devices()[0]),
        "rel_err_vs_xla": rel,
        "pallas_ms": round(t_pallas * 1e3, 3),
        "xla_ms": round(t_xla * 1e3, 3),
        "pallas_tflops": round(flops / t_pallas / 1e12, 2),
        "xla_tflops": round(flops / t_xla / 1e12, 2),
        "pallas_mxu_pct": round(100 * flops / t_pallas / peak, 1),
        "xla_mxu_pct": round(100 * flops / t_xla / peak, 1),
        "speedup_vs_xla": round(t_xla / t_pallas, 3),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
