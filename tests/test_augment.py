"""train/augment.py: seeded in-step augmentation (crop / flip / cutout)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_recognition_adversarial_example_attack_tpu.train.augment import (
    AugmentConfig,
    make_augment_fn,
    random_crop,
    random_cutout,
    random_flip,
)

KEY = jax.random.PRNGKey(7)


def _batch(b=6, h=16, w=16, c=3, seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).uniform(0, 1, (b, h, w, c)).astype(
            np.float32))


def test_disabled_policy_returns_none():
    assert make_augment_fn(AugmentConfig()) is None


def test_shapes_range_and_determinism():
    x = _batch()
    aug = make_augment_fn(AugmentConfig(pad=2, flip=True, cutout=4))
    a1 = aug(KEY, x)
    a2 = aug(KEY, x)
    assert a1.shape == x.shape
    assert float(a1.min()) >= 0.0 and float(a1.max()) <= 1.0
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    a3 = aug(jax.random.PRNGKey(8), x)
    assert not np.array_equal(np.asarray(a1), np.asarray(a3))


def test_flip_is_original_or_mirror_per_sample():
    x = _batch(b=32)
    out = np.asarray(random_flip(KEY, x))
    xn = np.asarray(x)
    kinds = set()
    for i in range(xn.shape[0]):
        if np.array_equal(out[i], xn[i]):
            kinds.add("orig")
        elif np.array_equal(out[i], xn[i][:, ::-1, :]):
            kinds.add("mirror")
        else:
            raise AssertionError(f"sample {i} is neither original nor mirror")
    assert kinds == {"orig", "mirror"}  # p=0.5 over 32 samples


def test_crop_matches_a_shifted_window_of_padded_input():
    pad = 3
    x = _batch(b=4)
    out = np.asarray(random_crop(KEY, x, pad))
    xp = np.pad(np.asarray(x), ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    h, w = x.shape[1], x.shape[2]
    for i in range(x.shape[0]):
        hits = [
            (dy, dx)
            for dy in range(2 * pad + 1)
            for dx in range(2 * pad + 1)
            if np.array_equal(out[i], xp[i, dy:dy + h, dx:dx + w])
        ]
        assert hits, f"sample {i}: crop is not any pad-window of the input"


def test_cutout_zeroes_at_most_length_sq_pixels():
    length = 5
    x = jnp.ones((8, 16, 16, 3), jnp.float32)
    out = np.asarray(random_cutout(KEY, x, length))
    zeros_per_img = (out == 0.0).all(axis=-1).sum(axis=(1, 2))
    assert (zeros_per_img >= 1).all()
    assert (zeros_per_img <= length * length).all()
    # the zeroed region is one axis-aligned rectangle
    for i in range(out.shape[0]):
        mask = (out[i] == 0.0).all(axis=-1)
        rows = np.flatnonzero(mask.any(axis=1))
        cols = np.flatnonzero(mask.any(axis=0))
        assert mask[rows[0]:rows[-1] + 1, cols[0]:cols[-1] + 1].all()


class _Bundle:
    def __init__(self, module, variables):
        self.module = module
        self.variables = variables
        self.name = "ibp_tiny"


def _tiny_state(config):
    from image_recognition_adversarial_example_attack_tpu.models.zoo import (
        load_model,
    )
    from image_recognition_adversarial_example_attack_tpu.train.adversarial import (
        train_state_from_bundle,
    )

    bundle = load_model("ibp_tiny")
    return bundle, train_state_from_bundle(bundle, config)


@pytest.mark.slow
def test_train_step_with_augmentation_runs_and_is_deterministic():
    from image_recognition_adversarial_example_attack_tpu.train.adversarial import (
        AdvTrainConfig,
        make_train_step,
    )

    x = _batch(b=4, h=32, w=32)
    y = jnp.asarray([0, 1, 0, 1])
    config = AdvTrainConfig(eps=2 / 255, attack_steps=2, learning_rate=1e-3,
                            aug_pad=4, aug_flip=True, aug_cutout=8)
    bundle, state = _tiny_state(config)
    step = jax.jit(make_train_step(config, jnp.zeros(3), jnp.ones(3)))
    s1, m1 = step(state, x, y, KEY)
    s2, m2 = step(state, x, y, KEY)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]))
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), s1.params, s2.params)


@pytest.mark.slow
def test_disabled_augmentation_is_bitwise_unchanged():
    """aug all-off must not even split the key — params match a config
    that never heard of augmentation."""
    from image_recognition_adversarial_example_attack_tpu.train.adversarial import (
        AdvTrainConfig,
        make_train_step,
    )

    x = _batch(b=4, h=32, w=32)
    y = jnp.asarray([0, 1, 0, 1])
    base = AdvTrainConfig(eps=2 / 255, attack_steps=2, learning_rate=1e-3)
    bundle, state = _tiny_state(base)
    step_base = jax.jit(make_train_step(base, jnp.zeros(3), jnp.ones(3)))
    s_base, _ = step_base(state, x, y, KEY)
    explicit_off = AdvTrainConfig(eps=2 / 255, attack_steps=2,
                                  learning_rate=1e-3, aug_pad=0,
                                  aug_flip=False, aug_cutout=0)
    step_off = jax.jit(make_train_step(explicit_off, jnp.zeros(3),
                                       jnp.ones(3)))
    s_off, _ = step_off(state, x, y, KEY)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), s_base.params, s_off.params)


@pytest.mark.slow
def test_augment_composes_with_grad_accum():
    """Augmentation happens on the FULL batch before micro-batching, so
    accum=1 and accum=4 see identical augmented pixels (ibp objective:
    deterministic inner bound, so params must match exactly)."""
    from image_recognition_adversarial_example_attack_tpu.models.zoo import (
        load_model,
    )
    from image_recognition_adversarial_example_attack_tpu.train.adversarial import (
        AdvTrainConfig,
        make_ibp_step,
        train_state_from_bundle,
    )

    bundle = load_model("ibp_tiny")
    x = _batch(b=8, h=32, w=32)
    y = jnp.asarray([0, 1] * 4)
    states = []
    for accum in (1, 4):
        config = AdvTrainConfig(eps=2 / 255, learning_rate=5e-3,
                                ibp_ramp_steps=0, grad_accum=accum,
                                aug_pad=4, aug_flip=True)
        state = train_state_from_bundle(bundle, config)
        step = jax.jit(make_ibp_step(config, bundle.module.spec,
                                     jnp.zeros(3), jnp.ones(3)))
        state, _ = step(state, x, y, KEY)
        states.append(state)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-5),
        states[0].params, states[1].params)


@pytest.mark.slow
def test_adversarial_train_cli_augment_flag(tmp_path, capsys):
    from PIL import Image

    from image_recognition_adversarial_example_attack_tpu.cli.adversarial_train import (
        main,
    )

    rng = np.random.RandomState(0)
    for name, base in (("class_a", 0.25), ("class_b", 0.75)):
        d = tmp_path / "data" / name
        d.mkdir(parents=True)
        for i in range(4):
            arr = np.clip(base + rng.uniform(-0.08, 0.08, (32, 32, 3)), 0, 1)
            Image.fromarray((arr * 255).astype(np.uint8)).save(d / f"{i}.png")

    out = tmp_path / "aug.msgpack"
    rc = main(["--data_dir", str(tmp_path / "data"), "--model", "resnet_tiny",
               "--epochs", "2", "--batch_size", "8", "--attack_steps", "1",
               "--augment", "crop-flip", "--cutout", "6",
               "--out", str(out)])
    assert rc == 0
    assert out.is_file()
    assert "epoch 2/2" in capsys.readouterr().out
