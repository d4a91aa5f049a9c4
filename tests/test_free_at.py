"""Free adversarial training (Shafahi et al. 2019): replayed batches with
a carried perturbation, one compiled program per batch."""

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
    make_free_step,
    train_state_from_bundle,
)

EPS = 8 / 255


def _setup(replays=3, **cfg_kw):
    module = wrn_tiny(num_classes=10)
    variables = jax.device_get(
        module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))))
    bundle = ModelBundle(name="wrn_tiny", module=module, variables=variables,
                         source="random", mean=CIFAR10_MEAN.copy(),
                         std=CIFAR10_STD.copy(), input_size=32)
    config = AdvTrainConfig(eps=EPS, free_replays=replays,
                            learning_rate=1e-3, **cfg_kw)
    state = train_state_from_bundle(bundle, config)
    step = jax.jit(make_free_step(config, bundle.mean, bundle.std))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(8, 32, 32, 3), jnp.float32)
    y = jnp.asarray(rng.randint(0, 10, 8), jnp.int32)
    return state, step, x, y


@pytest.mark.slow
def test_replays_update_params_and_carry_delta():
    state, step, x, y = _setup(replays=3)
    delta0 = jnp.zeros(x.shape, jnp.float32)
    state, metrics, delta = step(state, x, y, jax.random.PRNGKey(0), delta0)
    # m optimizer updates per batch
    assert int(state.step) == 3
    # the carried perturbation lives in the eps ball and is nonzero
    assert float(jnp.max(jnp.abs(delta))) <= EPS + 1e-6
    assert float(jnp.max(jnp.abs(delta))) > 0.0
    assert np.isfinite(float(metrics["loss"]))

    # loss falls when the same batch trains repeatedly
    losses = [float(metrics["loss"])]
    for _ in range(4):
        state, metrics, delta = step(state, x, y, jax.random.PRNGKey(0),
                                     delta)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


def test_deterministic():
    state, step, x, y = _setup(replays=2)
    d0 = jnp.zeros(x.shape, jnp.float32)
    s1, m1, d1 = step(state, x, y, jax.random.PRNGKey(0), d0)
    s2, m2, d2 = step(state, x, y, jax.random.PRNGKey(7), d0)  # key unused
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    assert float(m1["loss"]) == float(m2["loss"])


def test_grad_accum_rejected():
    with pytest.raises(ValueError, match="grad_accum"):
        _setup(replays=2, grad_accum=2)


@pytest.mark.slow
def test_composes_with_train_bn_and_ema():
    state, step, x, y = _setup(replays=2, train_bn=True, ema_decay=0.99)
    d0 = jnp.zeros(x.shape, jnp.float32)
    state, metrics, delta = step(state, x, y, jax.random.PRNGKey(0), d0)
    assert int(state.step) == 2
    assert state.ema_params is not None
    # EMA shadow moved off the raw params' starting point
    diff = jax.tree_util.tree_reduce(
        lambda acc, t: acc + float(jnp.sum(jnp.abs(t))),
        jax.tree.map(lambda a, b: a - b, state.ema_params, state.params),
        0.0)
    assert diff > 0.0


@pytest.mark.slow
def test_cli_free_objective(tmp_path, capsys):
    import pickle

    from image_recognition_adversarial_example_attack_tpu.cli.adversarial_train import (
        main,
    )

    d = tmp_path / "cifar-10-batches-py"
    d.mkdir()
    rng = np.random.RandomState(0)
    with open(d / "data_batch_1", "wb") as f:
        pickle.dump({b"data": rng.randint(0, 256, (24, 3072)).astype(np.uint8),
                     b"labels": rng.randint(0, 10, (24,)).tolist()}, f)
    out = tmp_path / "wrn_free.msgpack"
    rc = main([
        "--cifar10_dir", str(tmp_path), "--model", "wrn_tiny",
        "--objective", "free", "--free_replays", "2", "--epochs", "1",
        "--batch_size", "8", "--lr", "1e-3", "--out", str(out),
    ])
    assert rc == 0
    assert out.is_file()

    with pytest.raises(SystemExit, match="grad_accum"):
        main(["--cifar10_dir", str(tmp_path), "--model", "wrn_tiny",
              "--objective", "free", "--grad_accum", "2",
              "--out", str(out)])
