"""Pretrained-weights parity tests (weight-gated; skip on air-gapped hosts).

These are the accuracy-parity oracles from the reference's published
transcripts (实验结果.md; see BASELINE.md rows 1-4).  They run only when
converted ResNet-50 weights exist (``weights/resnet50.msgpack`` or ``.pth``
— see cli/import_weights.py) AND the reference image is available; the rest
of the suite never depends on weights.

Oracle values (BASELINE.md):
- clean top-1 on picture/example.jpg: giant panda (class 388), p≈0.9996
- PGD eps=8/255 alpha=2/255 steps=10: misclassified (reference: class 805)
- CW c=1 lr=0.01: misclassified
"""

from pathlib import Path

import numpy as np
import pytest

WEIGHTS = [Path("weights/resnet50.msgpack"), Path("weights/resnet50.pth")]
EXAMPLE = Path("/root/reference/picture/example.jpg")

pytestmark = pytest.mark.skipif(
    not (any(w.is_file() for w in WEIGHTS) and EXAMPLE.is_file()),
    reason="pretrained resnet50 weights not present (import via cli.import_weights)",
)


@pytest.fixture(scope="module")
def pretrained():
    import jax
    import jax.numpy as jnp

    from image_recognition_adversarial_example_attack_tpu.attacks import make_logits_fn
    from image_recognition_adversarial_example_attack_tpu.core.images import load_image
    from image_recognition_adversarial_example_attack_tpu.models.zoo import load_model

    bundle = load_model("resnet50")
    assert bundle.source in ("cache", "converted")
    lf = make_logits_fn(bundle.module, bundle.variables, bundle.mean, bundle.std)
    x = jnp.asarray(load_image(EXAMPLE))
    return lf, x


def test_clean_top1_is_giant_panda(pretrained):
    import jax

    lf, x = pretrained
    probs = np.asarray(jax.nn.softmax(jax.jit(lf)(x), -1))[0]
    top1 = int(probs.argmax())
    assert top1 == 388, f"expected giant panda (388), got {top1}"
    assert probs[top1] > 0.99  # reference: 0.9996


def test_pgd_8_255_fools_the_model(pretrained):
    import jax
    import jax.numpy as jnp

    from image_recognition_adversarial_example_attack_tpu.attacks.pgd import (
        pgd_linf_attack,
    )

    lf, x = pretrained
    y = jnp.argmax(lf(x), -1)
    x_adv = jax.jit(
        lambda x, y, k: pgd_linf_attack(lf, x, y, eps=8 / 255, alpha=2 / 255,
                                        steps=10, key=k)
    )(x, y, jax.random.PRNGKey(0))
    pred_adv = int(jnp.argmax(lf(x_adv), -1)[0])
    assert pred_adv != int(y[0])  # reference: 388 -> 805 (soccer ball)


def test_cw_fools_the_model(pretrained):
    import jax
    import jax.numpy as jnp

    from image_recognition_adversarial_example_attack_tpu.attacks.cw import cw_l2_attack

    lf, x = pretrained
    y = jnp.argmax(lf(x), -1)
    res = jax.jit(lambda x, y: cw_l2_attack(lf, x, y, c=1.0, steps=200, lr=0.01))(x, y)
    assert bool(res.success[0])
