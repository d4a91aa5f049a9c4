"""Device-side differentiable JPEG (defenses/jpeg_dct.py): PIL fidelity,
gradient flow, SPMD fusion, and the adaptive-attack capability it exists
for (Athalye et al. 2018: preprocessing defenses must be attacked
through, not around)."""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from image_recognition_adversarial_example_attack_tpu.defenses.jpeg_dct import (
    jpeg_dct_roundtrip,
)
from image_recognition_adversarial_example_attack_tpu.defenses.preprocess import (
    DefenseConfig,
    defend_input,
)


def _pil_jpeg(x01: np.ndarray, q: int) -> np.ndarray:
    buf = io.BytesIO()
    Image.fromarray((x01 * 255).round().astype(np.uint8)).save(
        buf, "JPEG", quality=q)
    return np.asarray(Image.open(io.BytesIO(buf.getvalue())),
                      np.float32) / 255.0


@pytest.fixture(scope="module")
def natural_image():
    """Low-frequency content + mild noise: realistic compression behavior."""
    rng = np.random.RandomState(0)
    base = (rng.rand(8, 8, 3) * 255).astype(np.uint8)
    img = np.asarray(Image.fromarray(base).resize((64, 64), Image.BILINEAR),
                     np.float32) / 255.0
    return np.clip(img + rng.randn(64, 64, 3) * 0.02, 0, 1).astype(np.float32)


class TestCodecFidelity:
    @pytest.mark.parametrize("q", [30, 75, 95])
    def test_close_to_pil_at_same_quality(self, natural_image, q):
        """Measured ~1.2/255 MAE from libjpeg across qualities (triangular
        chroma upsampling + float DCT); compression LOSS matches PIL's."""
        pil = _pil_jpeg(natural_image, q)
        ours = np.asarray(jpeg_dct_roundtrip(
            jnp.asarray(natural_image[None]), quality=q))[0]
        assert np.abs(ours - pil).mean() < 0.01
        loss_ours = np.abs(ours - natural_image).mean()
        loss_pil = np.abs(pil - natural_image).mean()
        assert abs(loss_ours - loss_pil) < 0.005

    def test_quality_orders_distortion(self, natural_image):
        x = jnp.asarray(natural_image[None])
        d = {q: float(jnp.abs(jpeg_dct_roundtrip(x, q) - x).mean())
             for q in (10, 50, 95)}
        assert d[10] > d[50] > d[95] > 0.0

    def test_odd_shapes_pad_and_crop(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.rand(2, 50, 44, 3), jnp.float32)
        out = jpeg_dct_roundtrip(x, 75)
        assert out.shape == (2, 50, 44, 3)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
        with pytest.raises(ValueError):
            jpeg_dct_roundtrip(jnp.zeros((2, 16, 16, 1)), 75)

    def test_jit_and_determinism(self, natural_image):
        x = jnp.asarray(natural_image[None])
        f = jax.jit(lambda x: jpeg_dct_roundtrip(x, 75))
        np.testing.assert_array_equal(np.asarray(f(x)), np.asarray(f(x)))
        np.testing.assert_allclose(np.asarray(f(x)),
                                   np.asarray(jpeg_dct_roundtrip(x, 75)),
                                   atol=1e-6)


class TestDifferentiability:
    def test_gradient_flows_and_is_identity_through_rounding(self,
                                                             natural_image):
        """STE: exact rounded values forward, useful gradients backward."""
        x = jnp.asarray(natural_image[None])
        g = jax.grad(lambda x: jnp.sum(jpeg_dct_roundtrip(x, 75)))(x)
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.abs(g).sum()) > 1.0  # not a dead zero gradient

    def test_adaptive_attack_through_the_defense(self, tiny_logits_fn):
        """PGD differentiated THROUGH defend_input(jpeg_mode='dct') must
        fool the DEFENDED pipeline — the capability the differentiable
        codec exists for."""
        from image_recognition_adversarial_example_attack_tpu.attacks.pgd import (
            pgd_linf_attack,
        )

        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.uniform(0.2, 0.8, (4, 32, 32, 3)), jnp.float32)
        cfg = DefenseConfig(use_jpeg=True, jpeg_quality=75, jpeg_mode="dct")

        def defended_logits(xx):
            return tiny_logits_fn(defend_input(xx, cfg))

        y = jnp.argmax(defended_logits(x), -1)
        x_adv = jax.jit(lambda x, y, k: pgd_linf_attack(
            defended_logits, x, y, eps=8 / 255, alpha=2 / 255, steps=10,
            key=k))(x, y, jax.random.PRNGKey(0))
        fooled = float(jnp.mean(
            jnp.argmax(defended_logits(x_adv), -1) != y))
        assert fooled >= 0.5
        assert float(jnp.max(jnp.abs(x_adv - x))) <= 8 / 255 + 1e-6


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dct_jpeg_cell_stays_sharded():
    """Unlike the host codec (io_callback aborts SPMD programs), the DCT
    codec keeps the JPEG defense inside ONE sharded program."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from image_recognition_adversarial_example_attack_tpu.parallel.mesh import (
        make_mesh,
    )

    mesh = make_mesh(n_data=8, n_model=1)
    cfg = DefenseConfig(use_jpeg=True, jpeg_quality=60, jpeg_mode="dct")
    rng = np.random.RandomState(3)
    x_np = rng.rand(16, 32, 32, 3).astype(np.float32)
    x_sh = jax.device_put(jnp.asarray(x_np),
                          NamedSharding(mesh, P("data")))
    f = jax.jit(lambda x: defend_input(x, cfg))
    out_sh = np.asarray(f(x_sh))          # would abort with io_callback
    out = np.asarray(f(jnp.asarray(x_np)))
    np.testing.assert_allclose(out_sh, out, atol=1e-5)


@pytest.mark.slow
def test_defense_cli_jpeg_dct_mode(tmp_path, capsys):
    from image_recognition_adversarial_example_attack_tpu.cli.defense_experiments import (
        main,
    )

    rng = np.random.RandomState(4)
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(3):
        Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(
            d / f"i{i}.jpg")
    rc = main(["--image_dir", str(d), "--attacks", "fgsm",
               "--eps_list", "0.03137", "--steps", "2",
               "--model", "resnet_tiny", "--use_jpeg", "--jpeg_mode", "dct",
               "--viz_samples", "2", "--detector_threshold", "2.0",
               "--output_dir", str(tmp_path / "out")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "attack=fgsm" in out


class TestAdaptiveEvaluation:
    """--adaptive: attacks generated against the defended pipeline."""

    @pytest.mark.slow
    def test_adaptive_cell_counters_and_defense_degradation(self,
                                                            tiny_resnet):
        """The adaptive attacker must hurt the defense at least as much as
        the oblivious one (gradients flow through the STE chain), with
        all counter invariants intact."""
        import jax

        from image_recognition_adversarial_example_attack_tpu.core.constants import (
            IMAGENET_MEAN,
            IMAGENET_STD,
        )
        from image_recognition_adversarial_example_attack_tpu.defenses.detector import (
            make_features_fn,
        )
        from image_recognition_adversarial_example_attack_tpu.eval.defense_eval import (
            DefenseEvalConfig,
            aggregate_stats,
            make_defense_eval_fn,
        )

        model, variables = tiny_resnet
        lf = lambda xx: model.apply(variables, xx)  # noqa: E731
        ffn = make_features_fn(model, variables, IMAGENET_MEAN, IMAGENET_STD)
        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.rand(8, 32, 32, 3), jnp.float32)
        y = jnp.argmax(lf(x), -1)
        key = jax.random.PRNGKey(0)

        stats = {}
        for adaptive in (False, True):
            cfg = DefenseEvalConfig(attack_name="pgd", eps=8 / 255,
                                    alpha=2 / 255, steps=10,
                                    adaptive=adaptive)
            fn = make_defense_eval_fn(lf, ffn, cfg)
            out = fn(x, y, 2.0, key)
            stats[adaptive] = aggregate_stats(out, n_valid=8)
            bypass = np.asarray(out["detector_attack_success"])
            succ = np.asarray(out["attack_success"])
            flag = np.asarray(out["detector_flags_adv"])
            np.testing.assert_array_equal(bypass, succ * (1 - flag))
        # defended accuracy under the adaptive attack <= oblivious attack
        assert (stats[True]["defense_preproc_success"]
                <= stats[False]["defense_preproc_success"])

    def test_split_jpeg_factory_rejects_adaptive(self, tiny_resnet):
        from image_recognition_adversarial_example_attack_tpu.core.constants import (
            IMAGENET_MEAN,
            IMAGENET_STD,
        )
        from image_recognition_adversarial_example_attack_tpu.defenses.detector import (
            make_features_fn,
        )
        from image_recognition_adversarial_example_attack_tpu.eval.defense_eval import (
            DefenseEvalConfig,
            make_defense_eval_fn_split_jpeg,
        )

        model, variables = tiny_resnet
        lf = lambda xx: model.apply(variables, xx)  # noqa: E731
        ffn = make_features_fn(model, variables, IMAGENET_MEAN, IMAGENET_STD)
        cfg = DefenseEvalConfig(attack_name="pgd", eps=8 / 255, alpha=2 / 255,
                                steps=2, adaptive=True,
                                defense=DefenseConfig(use_jpeg=True))
        with pytest.raises(ValueError, match="adaptive"):
            make_defense_eval_fn_split_jpeg(lf, ffn, cfg)

    @pytest.mark.slow
    def test_defense_cli_adaptive(self, tmp_path, capsys):
        from image_recognition_adversarial_example_attack_tpu.cli.defense_experiments import (
            main,
        )

        rng = np.random.RandomState(6)
        d = tmp_path / "imgs"
        d.mkdir()
        for i in range(3):
            Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(
                d / f"i{i}.jpg")
        rc = main(["--image_dir", str(d), "--attacks", "pgd",
                   "--eps_list", "0.03137", "--steps", "3",
                   "--model", "resnet_tiny", "--adaptive",
                   "--use_jpeg", "--jpeg_mode", "dct",
                   "--viz_samples", "0", "--detector_threshold", "2.0",
                   "--output_dir", str(tmp_path / "out")])
        assert rc == 0
        out = capsys.readouterr().out
        assert "ADAPTIVE (through the defense)" in out
        assert "attack=pgd" in out


class TestHostJpegBPDA:
    """Review-r3b regressions: the host-codec BPDA path must be
    differentiable (io_callback may never see a JVP tracer), and the
    adaptive+host+mesh incompatibility fails fast."""

    def test_adaptive_gradient_through_host_codec(self, tiny_logits_fn):
        cfg = DefenseConfig(use_jpeg=True, jpeg_quality=75, jpeg_mode="host")
        rng = np.random.RandomState(7)
        x = jnp.asarray(rng.uniform(0.2, 0.8, (2, 32, 32, 3)), jnp.float32)

        def defended(xx):
            return jnp.sum(tiny_logits_fn(defend_input(xx, cfg)))

        g = jax.grad(defended)(x)  # crashed pre-fix: 'IO callbacks do not
        assert bool(jnp.all(jnp.isfinite(g)))       # support JVP'
        assert float(jnp.abs(g).sum()) > 0.0

    @pytest.mark.slow
    def test_cli_rejects_adaptive_host_jpeg_on_mesh_before_work(self,
                                                                tmp_path):
        if len(jax.devices()) < 2:
            pytest.skip("needs a multi-device mesh")
        from image_recognition_adversarial_example_attack_tpu.cli.defense_experiments import (
            main,
        )

        d = tmp_path / "imgs"
        d.mkdir()
        Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(d / "a.jpg")
        with pytest.raises(SystemExit, match="jpeg_mode dct"):
            main(["--image_dir", str(d), "--attacks", "pgd",
                  "--eps_list", "0.03", "--steps", "1",
                  "--model", "resnet_tiny", "--adaptive", "--use_jpeg",
                  "--viz_samples", "0",
                  "--output_dir", str(tmp_path / "o")])
