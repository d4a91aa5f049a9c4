"""Isolate the host-RSS-per-chunk growth seen at dataset scale (r5).

benchmarks/stream_scale_probe.py measured host RSS growing linearly with
image count on the real chip (5,120 imgs -> 6.4 GB, 10,240 -> 9.4 GB,
~110 MB per batch-128 chunk) while the SAME streamed path plateaus on CPU
(leak_bisect: decode-only flat at 310 MB, full attack plateaus at 1.4 GB).
This probe reduces the TPU case to its minimum: a loop of
``host numpy -> jnp.asarray -> trivial jitted program -> dependent fetch``.

Measured on TPU v5e through the axon relay (2026-08-20):

  mode=put    (fresh float32 [128,224,224,3] buffer each iter):
      +73.5 MiB/iter — exactly the uploaded buffer size
  mode=reuse  (np.copyto into ONE preallocated host buffer):
      +73.5 MiB/iter — retention is an internal client copy, not a
      reference to the user's buffer
  mode=delete (explicit jax.Array.delete() + gc.collect()):
      +73.5 MiB/iter — deleting the device array does not release it
  mode=uint8  (ship uint8, convert to f32/255 on device):
      +18.4 MiB/iter — exactly the (4x smaller) uploaded bytes, and
      ~3x faster per-iteration wall time

Conclusion: the relay client (libaxon_pjrt.so — closed, outside this
repo) retains a host-side copy of every uploaded buffer for the life of
the process.  The streaming library itself is constant-memory (bounded
queue, per-sample scalar accumulators; the CPU control plateaus).  On
relay-attached hosts the practical mitigations are (a)
ADV_TPU_TRANSFER_UINT8=1 — 4x fewer retained bytes AND faster transfers
— and (b) budgeting host RAM ~ n_chunks x chunk_bytes: 50k ImageNet-val
at batch 128 uint8 is 391 chunks x 18.4 MiB ~= 7.2 GB.  On directly
attached hosts (PCIe libtpu, GPU, CPU) none of this applies.

Run (ONE TPU process at a time; first compile via relay can take minutes):
    python benchmarks/relay_rss_probe.py put 24
    python benchmarks/relay_rss_probe.py uint8 12
"""

from __future__ import annotations

import gc
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from hostmem import rss_mb

SHAPE = (128, 224, 224, 3)  # one batch-128 eval chunk, 73.5 MiB float32


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "put"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    if mode not in ("put", "reuse", "delete", "uint8"):
        raise SystemExit(f"unknown mode {mode!r}")

    f = jax.jit(lambda x: jnp.sum(x * 1.0001, axis=(1, 2, 3)))
    conv = jax.jit(lambda u: u.astype(jnp.float32) / 255.0)

    rng = np.random.RandomState(0)
    host = rng.rand(*SHAPE).astype(np.float32)
    host_u8 = (host * 255).astype(np.uint8)

    print(f"device={jax.devices()[0]} mode={mode} start_rss={rss_mb():.1f}",
          flush=True)
    samples = []
    for i in range(iters):
        if mode == "reuse":
            np.copyto(host, np.float32(i) * 1e-6)
            x = jnp.asarray(host)
        elif mode == "uint8":
            x = conv(jnp.asarray(host_u8.copy()))
        else:  # put / delete
            a = host + np.float32(i)
            x = jnp.asarray(a)
        t0 = time.perf_counter()
        r = f(x)
        np.asarray(jnp.ravel(r)[:4])  # dependent-fetch fence (CLAUDE.md)
        dt = time.perf_counter() - t0
        if mode == "delete":
            x.delete()
            del x, a
            gc.collect()
        samples.append(rss_mb())
        print(f"  iter={i} rss={samples[-1]:.1f} dt={dt:.2f}", flush=True)
    if len(samples) > 2:
        slope = (samples[-1] - samples[1]) / (len(samples) - 2)
        print(f"end_rss={samples[-1]:.1f} slope={slope:.1f} MiB/iter",
              flush=True)


if __name__ == "__main__":
    main()
