"""Grad-CAM explanation tests (eval/explain.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_recognition_adversarial_example_attack_tpu.core.constants import (
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from image_recognition_adversarial_example_attack_tpu.eval.explain import (
    cam_shift_iou,
    make_gradcam_fn,
    upsample_cam,
)


@pytest.fixture(scope="module")
def resnet64():
    from image_recognition_adversarial_example_attack_tpu.models.resnet import (
        resnet_tiny,
    )

    model = resnet_tiny()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return model, variables


def _batch(n=2, hw=64, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.uniform(0.1, 0.9, size=(n, hw, hw, 3)), jnp.float32)


class TestForwardSplit:
    def test_split_matches_call(self, resnet64):
        """features_last + head_from_features must BE __call__ (the CAM
        gradient is only meaningful through an exact split)."""
        model, variables = resnet64
        x = _batch()
        whole = model.apply(variables, x)
        feats = model.apply(variables, x, method=type(model).features_last)
        split = model.apply(variables, feats,
                            method=type(model).head_from_features)
        np.testing.assert_allclose(np.asarray(whole), np.asarray(split),
                                   rtol=1e-6, atol=1e-6)

    def test_non_conv_model_raises(self, tiny_model):
        model, variables = tiny_model
        with pytest.raises(ValueError, match="features_last"):
            make_gradcam_fn(model, variables, IMAGENET_MEAN, IMAGENET_STD)

    @pytest.mark.parametrize("family", ["wrn", "preact"])
    @pytest.mark.slow
    def test_cifar_families_split_and_cam(self, family):
        """The CIFAR families expose the same forward split; their CAM is
        well-formed at 32x32."""
        if family == "wrn":
            from image_recognition_adversarial_example_attack_tpu.models.wideresnet import (
                wrn_tiny,
            )

            model = wrn_tiny()
        else:
            from image_recognition_adversarial_example_attack_tpu.models.preactresnet import (
                PreActResNet,
            )

            model = PreActResNet(stage_sizes=(1, 1, 1, 1))
        x = _batch(n=2, hw=32, seed=7)
        variables = model.init(jax.random.PRNGKey(0), x)
        whole = model.apply(variables, x)
        feats = model.apply(variables, x, method=type(model).features_last)
        split = model.apply(variables, feats,
                            method=type(model).head_from_features)
        np.testing.assert_allclose(np.asarray(whole), np.asarray(split),
                                   rtol=1e-6, atol=1e-6)
        fn = jax.jit(make_gradcam_fn(model, variables,
                                     IMAGENET_MEAN, IMAGENET_STD))
        cam = np.asarray(fn(x, jnp.asarray([0, 3], jnp.int32)))
        assert cam.shape == (2,) + feats.shape[1:3]
        assert cam.min() >= 0.0 and cam.max() <= 1.0 + 1e-6


class TestGradCam:
    def test_shape_range_and_peak(self, resnet64):
        model, variables = resnet64
        fn = jax.jit(make_gradcam_fn(model, variables,
                                     IMAGENET_MEAN, IMAGENET_STD))
        x = _batch(n=3)
        y = jnp.asarray([0, 4, 9], jnp.int32)
        cam = np.asarray(fn(x, y))
        feats = model.apply(variables, x, method=type(model).features_last)
        assert cam.shape == (3,) + feats.shape[1:3]
        assert cam.min() >= 0.0 and cam.max() <= 1.0 + 1e-6
        # per-sample normalization: every non-degenerate map peaks at 1
        for i in range(3):
            peak = cam[i].max()
            assert peak == pytest.approx(1.0, abs=1e-5) or peak == 0.0

    def test_batch_consistency(self, resnet64):
        """CAM of a batch equals per-sample CAMs (the summed class score
        keeps per-sample gradients decoupled)."""
        model, variables = resnet64
        fn = jax.jit(make_gradcam_fn(model, variables,
                                     IMAGENET_MEAN, IMAGENET_STD))
        x = _batch(n=2, seed=3)
        y = jnp.asarray([1, 7], jnp.int32)
        both = np.asarray(fn(x, y))
        one = np.asarray(fn(x[:1], y[:1]))
        two = np.asarray(fn(x[1:], y[1:]))
        np.testing.assert_allclose(both[0], one[0], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(both[1], two[0], rtol=1e-5, atol=1e-6)

    def test_class_dependence(self, resnet64):
        """Different target classes give different attention maps."""
        model, variables = resnet64
        fn = jax.jit(make_gradcam_fn(model, variables,
                                     IMAGENET_MEAN, IMAGENET_STD))
        x = _batch(n=1, seed=5)
        cams = [np.asarray(fn(x, jnp.asarray([c], jnp.int32)))[0]
                for c in range(4)]
        distinct = any(not np.allclose(cams[0], c, atol=1e-6)
                       for c in cams[1:])
        assert distinct


class TestCamMetrics:
    def test_upsample_shape_and_range(self):
        cam = jnp.asarray(np.random.RandomState(0).rand(2, 4, 4),
                          jnp.float32)
        up = np.asarray(upsample_cam(cam, 32, 32))
        assert up.shape == (2, 32, 32)
        assert up.min() >= -1e-6 and up.max() <= 1.0 + 1e-6

    def test_iou_identical_is_one(self):
        cam = jnp.asarray(np.random.RandomState(1).rand(2, 8, 8),
                          jnp.float32)
        iou = np.asarray(cam_shift_iou(cam, cam))
        np.testing.assert_allclose(iou, 1.0)

    def test_iou_disjoint_is_zero(self):
        a = np.zeros((1, 8, 8), np.float32)
        b = np.zeros((1, 8, 8), np.float32)
        a[0, :2, :2] = 1.0  # top-left hot
        b[0, -2:, -2:] = 1.0  # bottom-right hot
        iou = np.asarray(cam_shift_iou(jnp.asarray(a), jnp.asarray(b),
                                       quantile=0.9))
        np.testing.assert_allclose(iou, 0.0)

    def test_iou_scale_invariant(self):
        """IoU uses each map's own quantile super-level set, so per-sample
        rescaling must not change it."""
        rng = np.random.RandomState(2)
        a = jnp.asarray(rng.rand(2, 8, 8), jnp.float32)
        b = jnp.asarray(rng.rand(2, 8, 8), jnp.float32)
        base = np.asarray(cam_shift_iou(a, b))
        scaled = np.asarray(cam_shift_iou(a * 0.3, b * 5.0))
        np.testing.assert_allclose(base, scaled)
