"""Pallas TPU kernels for the attack/defense elementwise hot paths.

Kernels here implement the fused PGD update (sign step + eps-ball projection
+ [0,1] clip), the bit-depth quantization defense, and on-chip uniform noise
generation for the PGD random start (pltpu PRNG, no host key traffic).

Honest engineering note (measured, see benchmarks/pallas_vs_xla.py): for
the PGD loop these elementwise chains FUSE INTO THE CONV BACKWARD under
plain XLA, so a separate pallas_call adds an HBM round-trip and is neutral
at best there.  The kernels earn their keep where fusion isn't available:
standalone defense passes over large batches, and as the building block for
future multi-op fusions XLA won't do (e.g. quantize+noise in one pass).
Attack entry points therefore default to the jnp path; set
``ADV_TPU_USE_PALLAS=1`` to route eligible standalone ops through pallas.

Layout contract: inputs are flattened to [rows, 128] — for 224x224x3
images a row-multiple of 1176x128 exactly (224*224*3 = 150528 = 1176*128),
so blocks tile the VPU lanes with zero padding.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

_LANES = 128
_BLOCK_ROWS = 512  # 512 x 128 f32 = 256 KiB per buffer; 4 buffers << 16 MiB VMEM


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"


def use_pallas() -> bool:
    return os.environ.get("ADV_TPU_USE_PALLAS", "") in ("1", "on", "true") and pallas_available()


def _pad_to_lanes(flat: jnp.ndarray) -> tuple[jnp.ndarray, int]:
    n = flat.shape[0]
    rows = -(-n // _LANES)
    pad = rows * _LANES - n
    if pad:
        flat = jnp.pad(flat, (0, pad))
    return flat.reshape(rows, _LANES), n


def _unpad(x2d: jnp.ndarray, n: int, shape, dtype) -> jnp.ndarray:
    return x2d.reshape(-1)[:n].reshape(shape).astype(dtype)


def _elementwise_pallas_call(kernel, scalars: jnp.ndarray, arrays: tuple,
                             interpret: bool | None):
    """Shared harness for elementwise kernels: flatten each array to
    [rows, 128], tile the grid, scalar-prefetch ``scalars``, unpad.

    All arrays must share a shape; the output matches the first array's
    shape/dtype.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = not pallas_available()

    ref = arrays[0]
    padded = [_pad_to_lanes(a.astype(jnp.float32).reshape(-1)) for a in arrays]
    n = padded[0][1]
    rows = padded[0][0].shape[0]
    block_rows = min(_BLOCK_ROWS, rows)
    tensor_spec = pl.BlockSpec(
        (block_rows, _LANES), lambda i, _s: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(-(-rows // block_rows),),
            in_specs=[tensor_spec] * len(arrays),
            out_specs=tensor_spec,
        ),
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
        interpret=interpret,
    )(scalars, *(p[0] for p in padded))
    return _unpad(out, n, ref.shape, ref.dtype)


# ---------------------------------------------------------------------------
# Fused PGD update: x' = clip01( clip(x + alpha*sign(g), x0-eps, x0+eps) )
# ---------------------------------------------------------------------------

def _pgd_step_kernel(scalars_ref, x_ref, g_ref, x0_ref, out_ref):
    # scalars: [alpha, eps] in SMEM
    alpha = scalars_ref[0]
    eps = scalars_ref[1]
    x = x_ref[...]
    x0 = x0_ref[...]
    stepped = x + alpha * jnp.sign(g_ref[...])
    projected = jnp.clip(stepped, x0 - eps, x0 + eps)
    out_ref[...] = jnp.clip(projected, 0.0, 1.0)


def pgd_step_pallas(
    x_adv: jnp.ndarray,
    grad: jnp.ndarray,
    x_orig: jnp.ndarray,
    eps: float,
    alpha: float,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Pallas version of attacks.pgd.pgd_step (identical semantics)."""
    return _elementwise_pallas_call(
        _pgd_step_kernel,
        jnp.asarray([alpha, eps], jnp.float32),
        (x_adv, grad, x_orig),
        interpret,
    )


# ---------------------------------------------------------------------------
# Bit-depth quantization: round(clip01(x) * (L-1)) / (L-1)
# ---------------------------------------------------------------------------

def _quantize_kernel(scalars_ref, x_ref, out_ref):
    scale = scalars_ref[0]
    x = jnp.clip(x_ref[...], 0.0, 1.0)
    out_ref[...] = jnp.round(x * scale) / scale


def quantize_pallas(
    x: jnp.ndarray, levels: int = 16, interpret: bool | None = None
) -> jnp.ndarray:
    """Pallas version of defenses.preprocess.defense_quantization."""
    return _elementwise_pallas_call(
        _quantize_kernel,
        jnp.asarray([float(levels - 1)], jnp.float32),
        (x,),
        interpret,
    )


# ---------------------------------------------------------------------------
# On-chip uniform noise in [-eps, eps] (PGD random start)
# ---------------------------------------------------------------------------

def _make_uniform_kernel(eps: float):
    def _uniform_kernel(seed_ref, out_ref):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        # per-block seed: base seed + program index keeps blocks decorrelated
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        # prng_random_bits yields int32 on TPU; bitcast to uint32 BEFORE the
        # shift — an arithmetic >> on the signed view would land half the
        # lanes in [-0.5, 0) instead of [0, 0.5).
        bits = pltpu.bitcast(pltpu.prng_random_bits(out_ref.shape), jnp.uint32)
        # take the 24 high bits for an exact float32 mantissa fill; after the
        # logical shift the top byte is zero, so the int32 view is
        # non-negative (Mosaic has no uint32->f32 cast)
        bits24 = pltpu.bitcast(bits >> 8, jnp.int32)
        u01 = bits24.astype(jnp.float32) * (1.0 / (1 << 24))
        out_ref[...] = (u01 * 2.0 - 1.0) * eps

    return _uniform_kernel


def uniform_noise_pallas(
    shape: tuple, eps: float, seed: int, interpret: bool | None = None
) -> jnp.ndarray:
    """Uniform(-eps, eps) noise generated on-chip with the TPU PRNG.

    Replaces jax.random.uniform for the PGD random start when pallas is
    enabled: no threefry bits on the VPU, no key threading into the kernel.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = not pallas_available()
    if interpret:
        # pltpu PRNG primitives have no CPU lowering; keep CPU behavior
        # equivalent (uniform in [-eps, eps]) via the host key path.
        return jax.random.uniform(
            jax.random.PRNGKey(seed), shape, jnp.float32, minval=-eps, maxval=eps
        )

    n = int(np.prod(shape))
    rows = -(-n // _LANES)
    block_rows = min(_BLOCK_ROWS, rows)
    grid = (-(-rows // block_rows),)
    # eps closes over the kernel (compile-time constant); seed stays int32 —
    # smuggling it through float32 would collapse seeds above 2^24.
    seed_arr = jnp.asarray([seed], jnp.int32)
    out = pl.pallas_call(
        _make_uniform_kernel(float(eps)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[],
            out_specs=pl.BlockSpec(
                (block_rows, _LANES), lambda i, _s: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
        interpret=interpret,
    )(seed_arr)
    return out.reshape(-1)[:n].reshape(shape)
