"""Test harness: force CPU with 8 virtual devices (multi-chip without a pod).

Must run before any jax backend initialization.  The container's
sitecustomize registers the axon TPU plugin; ``jax.config.update`` below
overrides platform selection as long as no computation has happened yet.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_model():
    from image_recognition_adversarial_example_attack_tpu.models.tiny import make_tiny

    return make_tiny(seed=0, image_size=16, num_classes=8)


@pytest.fixture(scope="session")
def tiny_logits_fn(tiny_model):
    from image_recognition_adversarial_example_attack_tpu.attacks import make_logits_fn
    from image_recognition_adversarial_example_attack_tpu.core.constants import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )

    model, variables = tiny_model
    return make_logits_fn(model, variables, IMAGENET_MEAN, IMAGENET_STD)


@pytest.fixture(scope="session")
def tiny_resnet():
    import jax.numpy as jnp

    from image_recognition_adversarial_example_attack_tpu.models.resnet import resnet_tiny

    model = resnet_tiny()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    return model, variables


@pytest.fixture()
def rng_key():
    return jax.random.PRNGKey(42)


@pytest.fixture()
def image_batch():
    rng = np.random.RandomState(0)
    return np.asarray(rng.uniform(0.2, 0.8, size=(4, 16, 16, 3)), np.float32)
