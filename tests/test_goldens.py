"""Golden-artifact tests (the reference's verification style, SURVEY.md §4):
deterministic adversarial outputs regenerated and diffed against committed
goldens within tolerance.

Goldens are tiny-model adversarial PNGs produced with fixed seeds; they are
regenerated via ``python tests/test_goldens.py --regen`` and committed.
"""

import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

GOLDEN_DIR = Path(__file__).parent / "goldens"


def _generate():
    """Deterministic adversarial images from the tiny model."""
    import jax
    import jax.numpy as jnp

    from image_recognition_adversarial_example_attack_tpu.attacks import (
        apgd_ce_attack,
        apgd_dlr_attack,
        apgd_targeted_attack,
        boundary_attack,
        cw_l2_attack,
        deepfool_attack,
        dim_attack,
        ead_attack,
        fab_targeted_attack,
        fgsm_attack,
        hsja_attack,
        jsma_attack,
        make_logits_fn,
        mifgsm_attack,
        nes_attack,
        pgd_linf_attack,
        simba_attack,
        spatial_attack,
        spsa_attack,
        square_attack,
        square_l2_attack,
        stadv_attack,
        tim_attack,
    )
    from image_recognition_adversarial_example_attack_tpu.core.constants import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )
    from image_recognition_adversarial_example_attack_tpu.models.tiny import make_tiny

    model, variables = make_tiny(seed=0, image_size=16)
    lf = make_logits_fn(model, variables, IMAGENET_MEAN, IMAGENET_STD)

    # deterministic input image (not random noise: structured gradient)
    h = w = 16
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    x = np.stack([yy / h, xx / w, (yy + xx) / (h + w)], axis=-1)[None]
    x = jnp.asarray(x)
    y = jnp.argmax(lf(x), -1)
    key = jax.random.PRNGKey(0)

    out = {
        "adv_fgsm": fgsm_attack(lf, x, y, eps=8 / 255),
        "adv_pgd": pgd_linf_attack(lf, x, y, eps=8 / 255, alpha=2 / 255,
                                   steps=10, key=key),
        "adv_cw": cw_l2_attack(lf, x, y, c=10.0, steps=50, lr=0.05).x_adv,
        # beyond-reference attack family, same fixed seeds
        "adv_mifgsm": mifgsm_attack(lf, x, y, eps=8 / 255, alpha=2 / 255,
                                    steps=10),
        "adv_dim": dim_attack(lf, x, y, eps=8 / 255, alpha=2 / 255,
                              steps=10, key=key),
        "adv_tim": tim_attack(lf, x, y, eps=8 / 255, alpha=2 / 255,
                              steps=10, kernel_size=3),
        "adv_apgd": apgd_ce_attack(lf, x, y, eps=8 / 255, steps=20, key=key),
        "adv_square": square_attack(lf, x, y, eps=8 / 255, steps=40, key=key),
        "adv_deepfool": deepfool_attack(lf, x, steps=20, num_classes=8),
        "adv_nes": nes_attack(lf, x, y, eps=8 / 255, alpha=2 / 255, steps=5,
                              key=key, n_samples=8),
        "adv_spsa": spsa_attack(lf, x, y, eps=8 / 255, alpha=2 / 255, steps=5,
                                key=key, n_samples=8),
        "adv_hsja": hsja_attack(lf, x, y, steps=3, n_probes=8,
                                init_trials=8, key=key),
        "adv_ead": ead_attack(lf, x, y, c=50.0, beta=1e-3, steps=60,
                              lr=0.05).x_adv,
        # round-3 AutoAttack completion + L2 protocol, same fixed seeds
        "adv_apgd_dlr": apgd_dlr_attack(lf, x, y, eps=8 / 255, steps=20,
                                        key=key),
        "adv_apgd_t": apgd_targeted_attack(lf, x, y, eps=8 / 255, steps=10,
                                           n_targets=2, key=key)[0],
        "adv_fab": fab_targeted_attack(lf, x, y, eps=8 / 255, steps=10,
                                       n_targets=2, key=key),
        "adv_apgd_l2": apgd_ce_attack(lf, x, y, eps=1.0, steps=20, key=key,
                                      norm="l2"),
        "adv_fab_l2": fab_targeted_attack(lf, x, y, eps=1.0, steps=10,
                                          n_targets=2, key=key, norm="l2"),
        "adv_square_l2": square_l2_attack(lf, x, y, eps=1.0, steps=40,
                                          key=key),
        # spatial (non-Lp) attack, deterministic zero-flow init
        "adv_stadv": stadv_attack(lf, x, y, steps=60, lr=0.03,
                                  tau=0.01).x_adv,
        # decision-based walk needs a misclassified warm start (the tiny
        # model's decision region swallows the noise-init distribution)
        "adv_boundary": boundary_attack(
            lf, x, y, steps=40, key=key,
            x_init=pgd_linf_attack(lf, x, y, eps=0.2, alpha=0.05, steps=20,
                                   key=key)),
        "adv_simba": simba_attack(lf, x, y, steps=60, eps=0.3, key=key),
        # L0 greedy saliency (deterministic: no key consumed)
        "adv_jsma": jsma_attack(lf, x, y, steps=20, theta=1.0),
        # worst-case rotation+translation (random part keyed, grid exact)
        "adv_spatial": spatial_attack(lf, x, y, candidates=8, grid_rot=3,
                                      grid_trans=3, key=key).x_adv,
    }
    return {k: np.asarray(v)[0] for k, v in out.items()}


@pytest.mark.slow
def test_goldens_match():
    assert GOLDEN_DIR.is_dir(), "goldens missing — run: python tests/test_goldens.py --regen"
    generated = _generate()
    for name, arr in generated.items():
        golden_path = GOLDEN_DIR / f"{name}.png"
        assert golden_path.is_file(), f"missing golden {golden_path}"
        golden = np.asarray(Image.open(golden_path), np.float32) / 255.0
        # one uint8 quantum of tolerance + tiny numeric drift allowance
        assert np.abs(golden - arr).max() <= 2.0 / 255.0, name


if __name__ == "__main__":
    if "--regen" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")  # goldens are CPU-generated

        from image_recognition_adversarial_example_attack_tpu.core.images import (
            save_image_01,
        )

        GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
        for name, arr in _generate().items():
            save_image_01(arr, GOLDEN_DIR / f"{name}.png")
            print("wrote", GOLDEN_DIR / f"{name}.png")
