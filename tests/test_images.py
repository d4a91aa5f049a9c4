"""Image IO/preprocessing tests (the risky parity area — SURVEY.md §7)."""

import numpy as np
import pytest
from PIL import Image

from image_recognition_adversarial_example_attack_tpu.core.images import (
    list_images,
    load_image,
    load_image_batch,
    pad_batch,
    preprocess_pil,
    save_image_01,
)


@pytest.fixture()
def jpg(tmp_path):
    rng = np.random.RandomState(0)
    arr = (rng.rand(300, 400, 3) * 255).astype(np.uint8)
    p = tmp_path / "img.jpg"
    Image.fromarray(arr).save(p, quality=95)
    return p


class TestPreprocess:
    def test_output_geometry_and_range(self, jpg):
        x = load_image(jpg)
        assert x.shape == (1, 224, 224, 3)
        assert x.dtype == np.float32
        assert 0.0 <= x.min() and x.max() <= 1.0

    def test_shorter_side_rule(self):
        """Landscape: height (shorter) -> 256, width scales by aspect."""
        img = Image.new("RGB", (400, 300), (255, 0, 0))
        arr = preprocess_pil(img)
        assert arr.shape == (224, 224, 3)
        # solid color survives resize+crop exactly
        np.testing.assert_allclose(arr[..., 0], 1.0, atol=1e-6)
        np.testing.assert_allclose(arr[..., 1], 0.0, atol=1e-6)

    def test_portrait_and_square(self):
        for size in ((300, 400), (256, 256), (224, 224)):
            arr = preprocess_pil(Image.new("RGB", size, (0, 128, 0)))
            assert arr.shape == (224, 224, 3)

    def test_center_crop_is_centered(self):
        """A horizontal gradient image: crop must take the middle columns."""
        w, h = 512, 256
        grad = np.tile(np.linspace(0, 255, w, dtype=np.uint8), (h, 1))
        img = Image.fromarray(np.stack([grad] * 3, axis=-1))
        arr = preprocess_pil(img)  # shorter side 256 already; crop middle 224
        # middle column of the crop should be ~middle of the gradient
        mid = arr[112, 112, 0]
        assert abs(mid - 0.5) < 0.02

    def test_grayscale_converted_to_rgb(self, tmp_path):
        p = tmp_path / "gray.png"
        Image.fromarray(np.zeros((64, 64), np.uint8)).save(p)
        x = load_image(p)
        assert x.shape == (1, 224, 224, 3)


class TestSaveRoundtrip:
    def test_uint8_roundtrip_error_bound(self, tmp_path):
        rng = np.random.RandomState(1)
        x = rng.rand(224, 224, 3).astype(np.float32)
        p = tmp_path / "out.png"
        save_image_01(x, p)
        back = np.asarray(Image.open(p), np.float32) / 255.0
        assert np.abs(back - x).max() <= 0.5 / 255.0 + 1e-6

    def test_accepts_batch_dim_and_clips(self, tmp_path):
        x = np.full((1, 8, 8, 3), 1.5, np.float32)
        p = tmp_path / "clip.png"
        save_image_01(x, p)
        back = np.asarray(Image.open(p))
        assert back.max() == 255

    def test_creates_parent_dirs(self, tmp_path):
        p = tmp_path / "a" / "b" / "c.png"
        save_image_01(np.zeros((4, 4, 3), np.float32), p)
        assert p.is_file()


class TestBatching:
    def test_load_batch_and_padding(self, tmp_path):
        rng = np.random.RandomState(2)
        paths = []
        for i in range(3):
            p = tmp_path / f"{i}.png"
            Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(p)
            paths.append(p)
        x = load_image_batch(paths)
        assert x.shape == (3, 224, 224, 3)
        padded, n = pad_batch(x, 4)
        assert padded.shape[0] == 4 and n == 3
        np.testing.assert_array_equal(padded[3], x[2])  # last-image repeat
        same, n2 = pad_batch(x, 3)
        assert same.shape[0] == 3 and n2 == 3

    def test_empty_batch_raises(self):
        with pytest.raises(ValueError):
            load_image_batch([])

    def test_list_images_filters_and_sorts(self, tmp_path):
        for name in ("b.jpg", "a.png", "c.txt", "d.jpeg", "e.bmp"):
            (tmp_path / name).write_bytes(b"x")
        names = [p.name for p in list_images(tmp_path)]
        assert names == ["a.png", "b.jpg", "d.jpeg", "e.bmp"]


def test_load_image_bytes_matches_load_image_at_every_size(tmp_path):
    """Serve's image_b64 route decodes through load_image_bytes; it must
    produce EXACTLY load_image's pixels at every model input size (the
    round-4 bug: the b64 path kept the default 256 resize at every crop,
    so b64 and path requests to a non-224 model saw different images)."""
    from image_recognition_adversarial_example_attack_tpu.core.images import (
        load_image,
        load_image_bytes,
    )
    from PIL import Image
    import numpy as np

    rng = np.random.RandomState(9)
    p = tmp_path / "x.png"
    Image.fromarray((rng.rand(90, 70, 3) * 255).astype(np.uint8)).save(p)
    raw = p.read_bytes()
    for size in (16, 32, 224):
        a = load_image(p, size=size)[0]
        b = load_image_bytes(raw, size=size)
        assert b.shape == (size, size, 3)
        np.testing.assert_array_equal(a, b)
