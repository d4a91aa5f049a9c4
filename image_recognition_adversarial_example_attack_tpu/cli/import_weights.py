"""Offline weight-import CLI: torchvision ``.pth`` -> Flax msgpack cache.

The reference downloads weights at import time (ResNet.py:13) — impossible
on an air-gapped TPU fleet.  This tool is the one-time conversion step:

    python -m image_recognition_adversarial_example_attack_tpu.cli.import_weights \\
        resnet50 /path/to/resnet50-weights.pth

After this, every CLI finds ``$ADV_TPU_WEIGHTS_DIR/<model>.msgpack`` and
runs with pretrained behavior.  ``--verify`` additionally runs a forward
pass on a white image and prints the top-5 class ids as a conversion
smoke signal.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Convert torch weights to the Flax cache")
    parser.add_argument("model", type=str, help="zoo model name (e.g. resnet50)")
    parser.add_argument("checkpoint", type=str, help="path to the .pth/.pt state dict")
    parser.add_argument("--out", type=str, default=None,
                        help="output .msgpack path (default: weights dir)")
    parser.add_argument("--verify", action="store_true",
                        help="run a forward pass after conversion")
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    ckpt = Path(args.checkpoint)
    if not ckpt.is_file():
        raise SystemExit(f"checkpoint not found: {ckpt}")

    from ..models.zoo import load_model, save_variables, weights_dir

    bundle = load_model(args.model, weights=ckpt, cache_converted=False)
    if bundle.source != "converted":
        raise SystemExit(f"conversion failed (source={bundle.source})")

    out = Path(args.out) if args.out else weights_dir() / f"{args.model}.msgpack"
    save_variables(bundle.variables, out)
    print(f"converted {ckpt} -> {out}")

    if args.verify:
        import jax
        import jax.numpy as jnp
        import numpy as np

        from ..attacks.api import make_logits_fn

        lf = make_logits_fn(bundle.module, bundle.variables, bundle.mean, bundle.std)
        x = jnp.ones((1, bundle.input_size, bundle.input_size, 3), jnp.float32)
        probs = np.asarray(jax.nn.softmax(jax.jit(lf)(x), -1))[0]
        top5 = np.argsort(-probs)[:5]
        print("verify: top-5 on a white image:",
              [(int(i), round(float(probs[i]), 4)) for i in top5])
    return 0


if __name__ == "__main__":
    sys.exit(main())
