"""Dataset-scale streaming proof on real hardware (VERDICT r4 #7).

The 50k-ImageNet-val design claim (eval/streaming.py) had only been
exercised to 512 images on the real chip.  This probe drives the SAME
streamed path the CLIs use (eval/streaming.py::stream_suite_attack with
the EvalBatchPipeline background decoder and the production placer) over
thousands of images and reports the three things that can break at scale
but not in a 4-chunk smoke: steady throughput, chunk-time variance (relay
jitter / queue dynamics), and host RSS over time (the constant-memory
claim — RSS must plateau, not grow with N).

The image set is synthesized by jittering the reference assets
(/root/reference/picture — random crop + flip per copy, unique pixels per
file so the decode path does real work), since no large dataset can exist
in this zero-egress container.

Run on the real chip (ONE TPU process at a time):
    python benchmarks/stream_scale_probe.py --n 5120 --chunk 128
    ADV_TPU_TRANSFER_UINT8=1 python benchmarks/stream_scale_probe.py ...

CPU smoke:
    ADV_TPU_PLATFORM=cpu python benchmarks/stream_scale_probe.py \
        --n 64 --chunk 16 --model resnet_tiny --size 64 --steps 2
"""

from __future__ import annotations

import argparse
import json
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

import bench

SOURCE_DIR = Path("/root/reference/picture")


from hostmem import rss_mb  # noqa: E402 — after the sys.path insert


def synthesize_dataset(out_dir: Path, n: int, seed: int = 0) -> list[Path]:
    """n jittered JPEG copies of the reference pictures (256px shorter
    side, random crop + flip per copy).  Reused across runs when the
    count already matches — synthesis of 5k images takes minutes."""
    from PIL import Image

    existing = sorted(out_dir.glob("im_*.jpg"))
    if len(existing) == n:
        print(f"reusing {n} images in {out_dir}", file=sys.stderr)
        return existing
    out_dir.mkdir(parents=True, exist_ok=True)
    for old in existing:
        old.unlink()
    sources = [p for p in sorted(SOURCE_DIR.iterdir())
               if p.suffix.lower() in (".jpg", ".jpeg", ".png")]
    if not sources:
        raise SystemExit(f"no source images in {SOURCE_DIR}")
    rng = np.random.RandomState(seed)
    loaded = []
    for p in sources:
        im = Image.open(p).convert("RGB")
        s = 256 / min(im.size)
        loaded.append(im.resize((max(257, int(im.width * s)),
                                 max(257, int(im.height * s)))))
    paths = []
    for i in range(n):
        im = loaded[i % len(loaded)]
        x0 = rng.randint(0, im.width - 256 + 1)
        y0 = rng.randint(0, im.height - 256 + 1)
        crop = im.crop((x0, y0, x0 + 256, y0 + 256))
        if rng.rand() < 0.5:
            crop = crop.transpose(Image.FLIP_LEFT_RIGHT)
        dst = out_dir / f"im_{i:05d}.jpg"
        crop.save(dst, quality=88)
        paths.append(dst)
        if (i + 1) % 1000 == 0:
            print(f"  synthesized {i + 1}/{n}", file=sys.stderr)
    return paths


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5120)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--model", default="resnet50")
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--image_dir", type=Path,
                    default=Path("/tmp/adv_tpu_stream_scale"))
    args = ap.parse_args()

    from image_recognition_adversarial_example_attack_tpu.attacks.pgd import (
        pgd_linf_attack,
    )
    from image_recognition_adversarial_example_attack_tpu.eval.metrics import (
        ssim_per_sample,
    )
    from image_recognition_adversarial_example_attack_tpu.eval.streaming import (
        make_placer,
        stream_suite_attack,
    )

    paths = synthesize_dataset(args.image_dir, args.n)
    logits_fn = bench.build_logits_fn(args.model, args.size)

    attack = jax.jit(lambda x, y, k: pgd_linf_attack(
        logits_fn, x, y, eps=8 / 255, alpha=2 / 255, steps=args.steps,
        key=k))
    clean_fn = jax.jit(lambda xx: (
        jnp.argmax(logits_fn(xx), -1),
        jnp.max(jax.nn.softmax(logits_fn(xx), -1), -1)))

    @jax.jit
    def metrics_fn(xc, xa, yy):
        diff = xa - xc
        flat = diff.reshape(diff.shape[0], -1)
        logits_adv = logits_fn(xa)
        probs = jax.nn.softmax(logits_adv, -1)
        return {
            "succ": jnp.argmax(logits_adv, -1) != yy,
            "linf": jnp.max(jnp.abs(flat), -1),
            "l2": jnp.sqrt(jnp.sum(jnp.square(flat), -1)),
            "changed": jnp.mean(
                (jnp.abs(flat) > 1.0 / 255.0).astype(jnp.float32), -1),
            "ssim": ssim_per_sample(xc, xa),
            "sq_sum": jnp.sum(jnp.square(flat), -1),
            "conf": jnp.max(probs, -1),
        }

    base_place = make_placer()
    rss_samples: list[float] = []
    chunk_wall: list[float] = []  # arrival time of each chunk at place()

    def place(x_np):
        rss_samples.append(rss_mb())
        chunk_wall.append(time.perf_counter())
        return base_place(x_np)

    print(f"device: {jax.devices()[0]}  n={len(paths)} chunk={args.chunk} "
          f"transfer_uint8={os.environ.get('ADV_TPU_TRANSFER_UINT8', '')}",
          file=sys.stderr, flush=True)
    rss0 = rss_mb()
    t0 = time.perf_counter()
    res = stream_suite_attack(attack, metrics_fn, clean_fn, paths,
                              jax.random.PRNGKey(0), chunk_size=args.chunk,
                              size=args.size, place=place)
    wall = time.perf_counter() - t0

    ct = np.asarray(res["chunk_times_s"])
    # end-to-end per-chunk cadence (decode + transfer + clean fwd + attack
    # + metrics), excluding the compile chunk
    gaps = np.diff(np.asarray(chunk_wall))[1:] if len(chunk_wall) > 2 else []
    steady_wall = wall - ct[0]
    record = {
        "count": int(res["count"]),
        "chunks": len(ct),
        "chunk_size": args.chunk,
        "model": args.model,
        "asr": round(float(np.mean(res["succ"])), 4),
        "linf_max": round(float(np.max(res["linf"])), 5),
        "wall_s": round(wall, 1),
        "img_per_s_total": round(res["count"] / wall, 1),
        "img_per_s_steady": round(
            (res["count"] - args.chunk) / steady_wall, 1),
        "attack_chunk_s": {
            "compile_run": round(float(ct[0]), 2),
            **({"mean": round(float(np.mean(ct[1:])), 4),
                "std": round(float(np.std(ct[1:])), 4),
                "min": round(float(np.min(ct[1:])), 4),
                "max": round(float(np.max(ct[1:])), 4)}
               if len(ct) > 1 else {}),
        },
        "chunk_cadence_s": {
            "mean": round(float(np.mean(gaps)), 4) if len(gaps) else None,
            "std": round(float(np.std(gaps)), 4) if len(gaps) else None,
            "max": round(float(np.max(gaps)), 4) if len(gaps) else None,
        },
        "rss_mb": {
            "start": round(rss0, 1),
            "first_chunk": round(rss_samples[0], 1),
            "mid": round(rss_samples[len(rss_samples) // 2], 1),
            "end": round(rss_samples[-1], 1),
            "max": round(max(rss_samples), 1),
        },
        "transfer_uint8": os.environ.get("ADV_TPU_TRANSFER_UINT8", ""),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
