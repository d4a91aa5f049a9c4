"""TPU-native adversarial attack & defense framework.

A ground-up JAX/XLA/Flax/pjit re-design of the capabilities of the PyTorch
reference ``picklerick422/Image-recognition-adversarial-example-attack``:

- ImageNet classifiers (ResNet-50 primary; VGG19, ViT-B/16, Swin-T,
  DenseNet-121, EfficientNet-B0 for black-box transfer studies), as Flax
  modules in NHWC layout with bfloat16 compute on the MXU.
- White-box attacks in [0,1] pixel space: FGSM, PGD-L-inf and CW-L2
  (tanh-space Adam), each compiled as ONE fused XLA program
  (forward+backward, step, epsilon-ball projection, [0,1] clip inside a
  ``lax.fori_loop``/``lax.scan``), batched over images and shardable over a
  ``jax.sharding.Mesh``.
- Defense harness: spatial smoothing, bit-depth quantization, optional
  host-side JPEG round-trip, and a ResNet stage-3 feature-statistics
  adversarial detector with quantile calibration.
- Black-box transferability sweeps, metrics (SSIM/PSNR/Lp/FFT), trajectory
  capture, matplotlib/seaborn visualization and JSON reports, and CLI
  surfaces mirroring the reference scripts.

The reference keeps images in [0,1] pixel space everywhere and applies
ImageNet normalization only immediately before the model forward
(reference: attack.py:10-17); this package keeps the same architectural
invariant so epsilon/alpha remain directly comparable to the 8/255
literature convention.
"""

__version__ = "0.1.0"

from . import core  # noqa: F401
