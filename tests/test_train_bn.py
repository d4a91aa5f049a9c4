"""train_bn (batch-statistics BN) + precise-BN export calibration."""

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_recognition_adversarial_example_attack_tpu.core.constants import (
    CIFAR10_MEAN,
    CIFAR10_STD,
)
from image_recognition_adversarial_example_attack_tpu.models.wideresnet import (
    wrn_tiny,
)
from image_recognition_adversarial_example_attack_tpu.models.zoo import (
    ModelBundle,
)
from image_recognition_adversarial_example_attack_tpu.train.adversarial import (
    AdvTrainConfig,
    calibrate_batch_stats,
    make_eval_step,
    make_train_step,
    train_state_from_bundle,
)


def _bundle():
    module = wrn_tiny(num_classes=10)
    variables = jax.device_get(
        module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))))
    return ModelBundle(name="wrn_tiny", module=module, variables=variables,
                       source="random", mean=CIFAR10_MEAN.copy(),
                       std=CIFAR10_STD.copy(), input_size=32)


def _x(b=8, seed=0):
    return jnp.asarray(np.random.RandomState(seed).rand(b, 32, 32, 3),
                       jnp.float32)


@pytest.mark.slow
def test_train_mode_uses_batch_statistics():
    """With train_bn the forward normalizes by the batch's own stats, so
    it must differ from the frozen-stats forward at identical params."""
    bundle = _bundle()
    x, y = _x(), jnp.zeros((8,), jnp.int32)
    frozen = train_state_from_bundle(bundle, AdvTrainConfig())
    live = train_state_from_bundle(bundle, AdvTrainConfig(train_bn=True))
    ev_frozen = jax.jit(make_eval_step(bundle.mean, bundle.std))
    ev_live = jax.jit(make_eval_step(bundle.mean, bundle.std))
    a = float(ev_frozen(frozen, x, y)["clean_accuracy"])
    b = float(ev_live(live, x, y)["clean_accuracy"])
    # accuracies may coincide; compare the raw training losses instead
    step = make_train_step(AdvTrainConfig(train_bn=True, attack_steps=0),
                           bundle.mean, bundle.std)
    step_f = make_train_step(AdvTrainConfig(attack_steps=0),
                             bundle.mean, bundle.std)
    _, m_live = jax.jit(step)(live, x, y, jax.random.PRNGKey(1))
    _, m_frozen = jax.jit(step_f)(frozen, x, y, jax.random.PRNGKey(1))
    assert not np.isclose(float(m_live["loss"]), float(m_frozen["loss"]),
                          atol=1e-6)
    del a, b


def test_train_bn_rejected_for_non_bn_family():
    from image_recognition_adversarial_example_attack_tpu.models.resnet import (
        resnet_tiny,
    )

    module = resnet_tiny(num_classes=10)
    variables = jax.device_get(
        module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))))
    # resnet has BN but no train_bn switch — fine-tuning family
    bundle = ModelBundle(name="resnet_tiny", module=module,
                         variables=variables, source="random", input_size=32)
    with pytest.raises(ValueError, match="train_bn"):
        train_state_from_bundle(bundle, AdvTrainConfig(train_bn=True))


@pytest.mark.slow
def test_precise_bn_calibration_converges_to_batch_stats():
    """Calibrating on ONE repeated batch drives the running stats to that
    batch's statistics, so the eval-mode forward converges to the
    train-mode forward on that batch."""
    bundle = _bundle()
    x = _x(16, seed=3)
    cfg = AdvTrainConfig(train_bn=True, attack_steps=0, learning_rate=1e-3)
    state = train_state_from_bundle(bundle, cfg)

    # a couple of parameter updates so stats are not trivially at init
    step = jax.jit(make_train_step(cfg, bundle.mean, bundle.std))
    y = jnp.asarray(np.arange(16) % 10, jnp.int32)
    for i in range(2):
        state, _ = step(state, x, y, jax.random.PRNGKey(i))

    before = state.extra_variables["batch_stats"]
    extra = calibrate_batch_stats(state, x, bundle.mean, bundle.std,
                                  batch_size=16, min_batches=60)
    after = extra["batch_stats"]
    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         before, after)
    assert max(jax.tree_util.tree_leaves(diffs)) > 1e-3  # stats moved

    # eval-mode (calibrated stats) ~ train-mode (batch stats) on that batch
    from image_recognition_adversarial_example_attack_tpu.train.adversarial import (
        _apply_model,
    )
    from image_recognition_adversarial_example_attack_tpu.core.normalize import (
        normalize_batch,
    )

    xn = normalize_batch(x, bundle.mean, bundle.std)
    live = _apply_model(state, state.params, xn)
    frozen_state = state.replace(extra_variables=extra, train_bn=False)
    # rebuild an eval-mode apply on the calibrated stats
    eval_module = wrn_tiny(num_classes=10)
    cal = eval_module.apply({"params": state.params, **extra}, xn)
    np.testing.assert_allclose(np.asarray(cal), np.asarray(live),
                               atol=0.15)
    del frozen_state


@pytest.mark.slow
def test_cli_train_bn_end_to_end(tmp_path, capsys):
    """--train_bn trains, calibrates at export, and the saved checkpoint
    carries non-init running statistics."""
    from flax import serialization

    from image_recognition_adversarial_example_attack_tpu.cli.adversarial_train import (
        main,
    )

    d = tmp_path / "cifar-10-batches-py"
    d.mkdir()
    rng = np.random.RandomState(0)
    with open(d / "data_batch_1", "wb") as f:
        pickle.dump({b"data": rng.randint(0, 256, (24, 3072)).astype(np.uint8),
                     b"labels": rng.randint(0, 10, (24,)).tolist()}, f)
    out = tmp_path / "wrn_bn.msgpack"
    rc = main([
        "--cifar10_dir", str(tmp_path), "--model", "wrn_tiny",
        "--train_bn", "--epochs", "1", "--batch_size", "8",
        "--attack_steps", "1", "--lr", "1e-3", "--out", str(out),
    ])
    assert rc == 0
    assert "Calibrating BatchNorm" in capsys.readouterr().out

    module = wrn_tiny(num_classes=10)
    template = jax.device_get(
        module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))))
    loaded = serialization.from_bytes(template, out.read_bytes())
    moved = jax.tree_util.tree_leaves(
        jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     loaded["batch_stats"], template["batch_stats"]))
    assert max(moved) > 1e-3  # stats are calibrated, not the init values

    # and the exported checkpoint loads into the standard eval-mode model
    logits = module.apply(loaded, _x(4, seed=9))
    assert logits.shape == (4, 10)
    assert bool(jnp.all(jnp.isfinite(logits)))
