"""MART training objective (train/adversarial.py::make_mart_step): loss
decomposition, robustness learned on the toy task, the misclassification
weighting's defining property, and the CLI objective wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_recognition_adversarial_example_attack_tpu.train import (
    AdvTrainConfig,
    make_mart_step,
    train_state_from_bundle,
)


class _Bundle:
    def __init__(self, module, variables):
        self.module = module
        self.variables = variables


def _toy_data(n=64, size=16, seed=0):
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 2, size=(n,)).astype(np.int32)
    base = np.where(y[:, None, None, None] == 0, 0.25, 0.75)
    x = np.clip(base + rng.uniform(-0.08, 0.08, (n, size, size, 3)), 0, 1)
    return jnp.asarray(x, jnp.float32), jnp.asarray(y)


@pytest.fixture(scope="module")
def mart_trained():
    from image_recognition_adversarial_example_attack_tpu.models.tiny import (
        make_tiny,
    )

    model, variables = make_tiny(seed=0, image_size=16, num_classes=2)
    config = AdvTrainConfig(eps=8 / 255, alpha=2 / 255, attack_steps=3,
                            learning_rate=5e-3, mart_beta=5.0)
    state = train_state_from_bundle(_Bundle(model, variables), config)
    step = jax.jit(make_mart_step(config))

    x, y = _toy_data()
    key = jax.random.PRNGKey(0)
    state, first = step(state, x, y, key)
    last = first
    for i in range(60):
        state, last = step(state, x, y, jax.random.fold_in(key, i))
    return state, first, last, x, y, config


def test_loss_decomposition_and_decrease(mart_trained):
    _, first, last, *_ = mart_trained
    for m in (first, last):
        np.testing.assert_allclose(
            float(m["loss"]),
            float(m["bce_loss"]) + 5.0 * float(m["weighted_kl"]),
            rtol=1e-5,
        )
        assert float(m["weighted_kl"]) >= 0.0  # KL and (1-p_y) nonnegative
        # boosted CE >= plain CE >= 0; with a runner-up term it stays >0
        assert float(m["bce_loss"]) > 0.0
    assert float(last["loss"]) < float(first["loss"])


def test_learns_robustly(mart_trained):
    from image_recognition_adversarial_example_attack_tpu.attacks import (
        make_logits_fn,
    )
    from image_recognition_adversarial_example_attack_tpu.attacks.pgd import (
        pgd_linf_attack,
    )
    from image_recognition_adversarial_example_attack_tpu.core.constants import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )
    from image_recognition_adversarial_example_attack_tpu.models.tiny import (
        make_tiny,
    )

    state, _, last, x, y, config = mart_trained
    assert float(last["adv_accuracy"]) > 0.9
    model, _ = make_tiny(seed=0, image_size=16, num_classes=2)
    variables = {"params": state.params, **state.extra_variables}
    lf = make_logits_fn(model, variables, IMAGENET_MEAN, IMAGENET_STD)
    x_adv = pgd_linf_attack(lf, x, y, eps=config.eps, alpha=config.alpha,
                            steps=10, key=jax.random.PRNGKey(7))
    robust_acc = float(jnp.mean(jnp.argmax(lf(x_adv), -1) == y))
    assert robust_acc > 0.9


def test_misclassification_weighting():
    """The KL regularizer must weight by the CLEAN misclassification
    probability: a state that classifies cleanly with high confidence
    yields weighted_kl << the raw KL between clean and adv predictions.
    Verified by reconstructing the two factors from the model directly."""
    from image_recognition_adversarial_example_attack_tpu.attacks import (
        make_logits_fn,
    )
    from image_recognition_adversarial_example_attack_tpu.core.constants import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )
    from image_recognition_adversarial_example_attack_tpu.models.tiny import (
        make_tiny,
    )

    model, variables = make_tiny(seed=0, image_size=16, num_classes=2)
    config = AdvTrainConfig(eps=8 / 255, alpha=2 / 255, attack_steps=2,
                            learning_rate=5e-3, mart_beta=5.0)
    state = train_state_from_bundle(_Bundle(model, variables), config)
    step = jax.jit(make_mart_step(config))
    x, y = _toy_data(n=32)
    key = jax.random.PRNGKey(3)
    for i in range(40):
        state, m = step(state, x, y, jax.random.fold_in(key, i))
    # trained state: clean predictions confident -> (1-p_y) ~ 0
    lf = make_logits_fn(model, {"params": state.params,
                                **state.extra_variables},
                        IMAGENET_MEAN, IMAGENET_STD)
    p = jax.nn.softmax(lf(x), -1)
    py = jnp.take_along_axis(p, y[:, None], -1)[:, 0]
    assert float(jnp.mean(1.0 - py)) < 0.1
    assert float(m["weighted_kl"]) < 0.1


@pytest.mark.slow
def test_mart_cli_smoke(tmp_path, capsys):
    from PIL import Image

    from image_recognition_adversarial_example_attack_tpu.cli.adversarial_train import (
        main,
    )

    rng = np.random.RandomState(0)
    for cls in ("a", "b"):
        d = tmp_path / "data" / cls
        d.mkdir(parents=True)
        level = 60 if cls == "a" else 190
        for i in range(3):
            arr = np.clip(level + rng.randint(-20, 20, (64, 64, 3)), 0, 255)
            Image.fromarray(arr.astype(np.uint8)).save(d / f"{i}.jpg")
    out = tmp_path / "mart_tiny.msgpack"
    rc = main(["--data_dir", str(tmp_path / "data"), "--model", "resnet_tiny",
               "--objective", "mart", "--epochs", "1", "--batch_size", "4",
               "--attack_steps", "2", "--mart_beta", "3.0",
               "--out", str(out)])
    assert rc == 0
    assert out.is_file()
    assert "loss=" in capsys.readouterr().out
