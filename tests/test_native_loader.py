"""Native C++ loader: parity with the PIL path + fallback behavior.

Skipped when the toolchain can't build the shared object (the wrapper
degrades to PIL silently either way).
"""

import numpy as np
import pytest
from PIL import Image

from image_recognition_adversarial_example_attack_tpu.core.images import load_image_batch
from image_recognition_adversarial_example_attack_tpu.utils.native_loader import (
    load_image_batch_native,
    native_available,
)

pytestmark = pytest.mark.skipif(not native_available(), reason="native loader unavailable")


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    d = tmp_path_factory.mktemp("njpg")
    rng = np.random.RandomState(0)
    paths = []
    # deliberately odd sizes: landscape, portrait, square, large-ish
    for i, (w, h) in enumerate([(400, 300), (301, 403), (256, 256), (1280, 960)]):
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        p = d / f"img_{i}.jpg"
        Image.fromarray(arr).save(p, quality=92)
        paths.append(p)
    return paths


def test_matches_pil_within_one_quantum(jpegs):
    a = load_image_batch_native(jpegs)
    b = np.concatenate(
        [load_image_batch([p]) for p in jpegs], axis=0
    )
    assert a.shape == b.shape == (4, 224, 224, 3)
    # intermediate quantization differs (PIL resamples in uint8 fixed point,
    # the native loader in float) — one uint8 quantum of slack
    assert np.abs(a - b).max() <= 1.0 / 255.0 + 1e-6


def test_thread_count_invariance(jpegs):
    a1 = load_image_batch_native(jpegs, n_threads=1)
    a4 = load_image_batch_native(jpegs, n_threads=4)
    np.testing.assert_array_equal(a1, a4)


def test_fallback_for_non_jpeg(tmp_path):
    png = tmp_path / "x.png"
    Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(png)
    out = load_image_batch_native([png])
    assert out.shape == (1, 224, 224, 3)
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_env_routing(jpegs, monkeypatch):
    monkeypatch.setenv("ADV_TPU_NATIVE_LOADER", "1")
    a = load_image_batch(jpegs)
    monkeypatch.delenv("ADV_TPU_NATIVE_LOADER")
    b = load_image_batch(jpegs)
    assert np.abs(a - b).max() <= 1.0 / 255.0 + 1e-6
