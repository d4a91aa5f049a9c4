"""int8 quantized inference (ops/int8.py + the model zoo's int8 flag)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from image_recognition_adversarial_example_attack_tpu.ops.int8 import (
    int8_conv_general_dilated,
    int8_dot_general,
    quantize_symmetric,
)


class TestQuantize:
    def test_per_tensor_roundtrip_bound(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(4, 8, 8, 3).astype(np.float32))
        q, s = quantize_symmetric(x, axes=None)
        assert q.dtype == jnp.int8
        step = float(jnp.ravel(s)[0])
        assert step > 0
        # symmetric quant error is at most half a step
        err = jnp.max(jnp.abs(x - q.astype(jnp.float32) * s))
        assert float(err) <= step / 2 + 1e-7

    def test_per_channel_scales(self):
        rng = np.random.RandomState(1)
        w = rng.randn(3, 3, 8, 16).astype(np.float32)
        w[..., 0] *= 100.0  # one loud output channel must not crush the rest
        q, s = quantize_symmetric(jnp.asarray(w), axes=(0, 1, 2))
        assert s.shape == (1, 1, 1, 16)
        recon = q.astype(np.float32) * np.asarray(s)
        step = np.asarray(s).reshape(-1)
        for c in range(16):
            assert np.abs(w[..., c] - recon[..., c]).max() <= step[c] / 2 + 1e-7

    def test_zero_tensor_safe(self):
        q, s = quantize_symmetric(jnp.zeros((4, 4)), axes=None)
        assert float(jnp.max(jnp.abs(q))) == 0
        assert np.isfinite(float(jnp.ravel(s)[0]))


class TestInt8Conv:
    def _args(self, groups=1, ci=8, co=16):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(2, 12, 12, ci).astype(np.float32))
        w = jnp.asarray((rng.randn(3, 3, ci // groups, co) * 0.2).astype(np.float32))
        kw = dict(window_strides=(1, 1), padding=((1, 1), (1, 1)),
                  dimension_numbers=("NHWC", "HWIO", "NHWC"),
                  feature_group_count=groups)
        return x, w, kw

    def test_matches_float_conv(self):
        x, w, kw = self._args()
        got = int8_conv_general_dilated(x, w, kw["window_strides"], kw["padding"],
                                        dimension_numbers=kw["dimension_numbers"])
        ref = lax.conv_general_dilated(x, w, kw["window_strides"], kw["padding"],
                                       dimension_numbers=kw["dimension_numbers"])
        denom = float(jnp.max(jnp.abs(ref))) + 1e-9
        assert float(jnp.max(jnp.abs(got - ref))) / denom < 0.05

    def test_depthwise_groups(self):
        x, w, kw = self._args(groups=8, ci=8, co=8)
        got = int8_conv_general_dilated(
            x, w, kw["window_strides"], kw["padding"],
            dimension_numbers=kw["dimension_numbers"],
            feature_group_count=8)
        ref = lax.conv_general_dilated(
            x, w, kw["window_strides"], kw["padding"],
            dimension_numbers=kw["dimension_numbers"], feature_group_count=8)
        denom = float(jnp.max(jnp.abs(ref))) + 1e-9
        assert float(jnp.max(jnp.abs(got - ref))) / denom < 0.05

    def test_gradient_is_float_vjp(self):
        """The backward pass must be EXACTLY the float conv's VJP at the
        same point (straight-through at op granularity)."""
        x, w, kw = self._args()

        def q_loss(x, w):
            return jnp.sum(jnp.sin(int8_conv_general_dilated(
                x, w, kw["window_strides"], kw["padding"],
                dimension_numbers=kw["dimension_numbers"])))

        def f_loss(x, w):
            return jnp.sum(jnp.sin(lax.conv_general_dilated(
                x, w, kw["window_strides"], kw["padding"],
                dimension_numbers=kw["dimension_numbers"])))

        gq = jax.grad(q_loss, argnums=(0, 1))(x, w)
        gf = jax.grad(f_loss, argnums=(0, 1))(x, w)
        # cotangents differ (sin' at slightly different primals) but the
        # linear operator is the float conv's: same structure, near-equal
        for a, b in zip(gq, gf):
            cos = float(jnp.sum(a * b) /
                        (jnp.linalg.norm(a) * jnp.linalg.norm(b) + 1e-12))
            assert cos > 0.99


class TestInt8Dot:
    def test_dense_case_matches(self):
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(4, 32).astype(np.float32))
        w = jnp.asarray((rng.randn(32, 10) * 0.3).astype(np.float32))
        dims = (((1,), (0,)), ((), ()))
        got = int8_dot_general(x, w, dims)
        ref = lax.dot_general(x, w, dims)
        denom = float(jnp.max(jnp.abs(ref))) + 1e-9
        assert float(jnp.max(jnp.abs(got - ref))) / denom < 0.05

    def test_non_dense_contraction_falls_back_exact(self):
        rng = np.random.RandomState(4)
        a = jnp.asarray(rng.randn(2, 3, 4).astype(np.float32))
        b = jnp.asarray(rng.randn(2, 4, 5).astype(np.float32))
        dims = (((2,), (1,)), ((0,), (0,)))  # batched matmul
        got = int8_dot_general(a, b, dims)
        ref = lax.dot_general(a, b, dims)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.slow
class TestInt8Models:
    @pytest.fixture(scope="class")
    def batch32(self):
        rng = np.random.RandomState(5)
        return jnp.asarray(rng.uniform(0.1, 0.9, (4, 32, 32, 3)).astype(np.float32))

    @pytest.mark.parametrize("family,factory", [
        ("resnet", "resnet_tiny"),
        ("vgg", "vgg_tiny"),
        ("densenet", "densenet_tiny"),
        ("efficientnet", "efficientnet_tiny"),
        ("mobilenet", "mobilenet_tiny"),
        ("vit", "vit_tiny"),
        ("swin", "swin_tiny_test"),
    ])
    def test_family_int8_agrees_with_float(self, family, factory, batch32):
        import importlib

        mod = importlib.import_module(
            f"image_recognition_adversarial_example_attack_tpu.models.{family}")
        fac = getattr(mod, factory)
        m = fac()
        v = m.init(jax.random.PRNGKey(0), batch32[:1])
        mq = fac(int8=True)
        a = m.apply(v, batch32)
        b = mq.apply(v, batch32)
        assert a.shape == b.shape
        denom = float(jnp.max(jnp.abs(a))) + 1e-9
        assert float(jnp.max(jnp.abs(a - b))) / denom < 0.1
        assert float((a.argmax(-1) == b.argmax(-1)).mean()) == 1.0

    def test_attack_runs_on_quantized_model(self, batch32):
        """Quantized-model robustness is evaluable: PGD differentiates
        through the int8 forward via the float VJP."""
        from image_recognition_adversarial_example_attack_tpu.attacks import (
            make_logits_fn, pgd_linf_attack)
        from image_recognition_adversarial_example_attack_tpu.core.constants import (
            IMAGENET_MEAN, IMAGENET_STD)
        from image_recognition_adversarial_example_attack_tpu.models.resnet import (
            resnet_tiny)

        m = resnet_tiny()
        v = m.init(jax.random.PRNGKey(0), batch32[:1])
        lf = make_logits_fn(resnet_tiny(int8=True), v, IMAGENET_MEAN, IMAGENET_STD)
        y = jnp.argmax(lf(batch32), -1)
        x_adv = pgd_linf_attack(lf, batch32, y, eps=8 / 255, alpha=2 / 255,
                                steps=3, key=jax.random.PRNGKey(1))
        assert float(jnp.max(jnp.abs(x_adv - batch32))) <= 8 / 255 + 1e-6
        assert float(jnp.min(x_adv)) >= 0 and float(jnp.max(x_adv)) <= 1

    def test_per_example_isolation(self, batch32):
        """The activation quantization grid is per-example: a sample's
        logits must be BITWISE identical whether it is classified alone or
        co-batched with an extreme-activation neighbor (serve.py's
        per-request isolation and the --max_batch chunking contract)."""
        from image_recognition_adversarial_example_attack_tpu.models.resnet import (
            resnet_tiny)

        m = resnet_tiny(int8=True)
        v = resnet_tiny().init(jax.random.PRNGKey(0), batch32[:1])
        alone = m.apply(v, batch32[:1])
        loud = jnp.concatenate([batch32[:1], jnp.ones_like(batch32[:1]) * 50.0], 0)
        np.testing.assert_array_equal(
            np.asarray(alone), np.asarray(m.apply(v, loud)[:1]))

    def test_zoo_flag_and_error_path(self, batch32):
        import warnings

        from image_recognition_adversarial_example_attack_tpu.models import (
            load_model)
        from image_recognition_adversarial_example_attack_tpu.models import zoo

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            b = load_model("resnet_tiny", input_size=32, int8=True)
        assert b.module.int8 is True
        assert b.apply(batch32).shape == (4, 10)
        # a factory without the int8 kwarg gets the friendly error —
        # but ONLY when int8 was requested (plain loads pass TypeErrors
        # through untranslated)
        zoo.register("_no_int8_test")(lambda dtype: zoo.resnet_tiny(dtype=dtype))
        try:
            with pytest.raises(ValueError, match="int8"):
                with warnings.catch_warnings():
                    warnings.simplefilter("ignore")
                    load_model("_no_int8_test", input_size=32, int8=True)
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                assert load_model("_no_int8_test", input_size=32).module is not None
        finally:
            zoo._REGISTRY.pop("_no_int8_test", None)
