"""Model-zoo tests: init/forward shapes, gradient flow, converter round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_recognition_adversarial_example_attack_tpu.models.densenet import densenet_tiny
from image_recognition_adversarial_example_attack_tpu.models.efficientnet import (
    efficientnet_tiny,
)
from image_recognition_adversarial_example_attack_tpu.models.mobilenet import mobilenet_tiny
from image_recognition_adversarial_example_attack_tpu.models.resnet import resnet_tiny
from image_recognition_adversarial_example_attack_tpu.models.swin import swin_tiny_test
from image_recognition_adversarial_example_attack_tpu.models.vgg import vgg_tiny
from image_recognition_adversarial_example_attack_tpu.models.vit import vit_tiny

TINY_FACTORIES = {
    "resnet": resnet_tiny,
    "vgg": vgg_tiny,
    "vit": vit_tiny,
    "swin": swin_tiny_test,
    "densenet": densenet_tiny,
    "efficientnet": efficientnet_tiny,
    "mobilenet": mobilenet_tiny,
}


@pytest.mark.parametrize("name", sorted(TINY_FACTORIES))
@pytest.mark.slow
def test_forward_shape_and_grad_flow(name):
    """Every architecture: correct logits shape, finite input gradients
    (the property every attack depends on)."""
    model = TINY_FACTORIES[name](num_classes=10)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    logits = model.apply(variables, x)
    assert logits.shape == (2, 10)
    assert logits.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(logits)))

    def loss(xx):
        lg = model.apply(variables, xx)
        return -jnp.sum(jax.nn.log_softmax(lg)[:, 0])

    g = jax.grad(loss)(x)
    assert g.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(g)))
    assert bool(jnp.any(g != 0))


def test_resnet50_full_structure():
    """Full ResNet-50: parameter count matches torchvision (25,557,032)."""
    from image_recognition_adversarial_example_attack_tpu.models.resnet import resnet50

    model = resnet50()
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    )
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(variables["params"]))
    assert n_params == 25_557_032


def test_vgg19_full_param_count():
    """Full VGG19 == torchvision's 143,667,240 params."""
    from image_recognition_adversarial_example_attack_tpu.models.vgg import vgg19

    model = vgg19()
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    )
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(variables["params"]))
    assert n_params == 143_667_240


def test_vit_b16_full_param_count():
    """Full ViT-B/16 == torchvision's 86,567,656 params."""
    from image_recognition_adversarial_example_attack_tpu.models.vit import vit_b_16

    model = vit_b_16()
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    )
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(variables["params"]))
    assert n_params == 86_567_656


def test_swin_t_full_param_count():
    """Full Swin-T == torchvision's 28,288,354 params."""
    from image_recognition_adversarial_example_attack_tpu.models.swin import swin_t

    model = swin_t()
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    )
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(variables["params"]))
    assert n_params == 28_288_354


def test_densenet121_full_param_count():
    """Full DenseNet-121 == torchvision's 7,978,856 params."""
    from image_recognition_adversarial_example_attack_tpu.models.densenet import densenet121

    model = densenet121()
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    )
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(variables["params"]))
    assert n_params == 7_978_856


def test_efficientnet_b0_full_param_count():
    """Full EfficientNet-B0 == torchvision's 5,288,548 params."""
    from image_recognition_adversarial_example_attack_tpu.models.efficientnet import (
        efficientnet_b0,
    )

    model = efficientnet_b0()
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    )
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(variables["params"]))
    assert n_params == 5_288_548


def test_mobilenet_v2_full_param_count():
    """Full MobileNetV2 == torchvision's 3,504,872 params."""
    from image_recognition_adversarial_example_attack_tpu.models.mobilenet import (
        mobilenet_v2,
    )

    model = mobilenet_v2()
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    )
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(variables["params"]))
    assert n_params == 3_504_872


class TestConverter:
    @pytest.mark.slow
    def test_resnet_roundtrip_synthetic(self):
        """A synthetic torchvision-keyed state dict converts into exactly the
        flax init structure (shape-checked leaf by leaf)."""
        import torch

        from image_recognition_adversarial_example_attack_tpu.models import convert
        from image_recognition_adversarial_example_attack_tpu.models.resnet import ResNet

        model = ResNet(stage_sizes=(1, 1), num_classes=4, width=4)
        template = jax.device_get(
            model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        )

        # build the torch-style dict from the template's own shapes
        sd = {}

        def walk(params, stats, torch_prefix_map):
            for flax_name, torch_name in torch_prefix_map:
                node_p = params
                for k in flax_name.split("/"):
                    node_p = node_p[k]
                if "kernel" in node_p:  # conv/dense
                    kern = np.asarray(node_p["kernel"])
                    if kern.ndim == 4:
                        sd[f"{torch_name}.weight"] = torch.tensor(
                            kern.transpose(3, 2, 0, 1)
                        )
                    else:
                        sd[f"{torch_name}.weight"] = torch.tensor(kern.T)
                    if "bias" in node_p:
                        sd[f"{torch_name}.bias"] = torch.tensor(np.asarray(node_p["bias"]))
                else:  # batchnorm
                    sd[f"{torch_name}.weight"] = torch.tensor(np.asarray(node_p["scale"]))
                    sd[f"{torch_name}.bias"] = torch.tensor(np.asarray(node_p["bias"]))
                    node_s = stats
                    for k in flax_name.split("/"):
                        node_s = node_s[k]
                    sd[f"{torch_name}.running_mean"] = torch.tensor(np.asarray(node_s["mean"]))
                    sd[f"{torch_name}.running_var"] = torch.tensor(np.asarray(node_s["var"]))
                    sd[f"{torch_name}.num_batches_tracked"] = torch.tensor(0)

        pairs = [("conv1", "conv1"), ("bn1", "bn1"), ("fc", "fc")]
        for stage in (1, 2):
            base_f, base_t = f"layer{stage}_0", f"layer{stage}.0"
            for mod in ("conv1", "bn1", "conv2", "bn2", "conv3", "bn3"):
                pairs.append((f"{base_f}/{mod}", f"{base_t}.{mod}"))
            pairs.append((f"{base_f}/downsample_conv", f"{base_t}.downsample.0"))
            pairs.append((f"{base_f}/downsample_bn", f"{base_t}.downsample.1"))

        walk(template["params"], template["batch_stats"], pairs)

        converted = convert.convert_state_dict(sd, convert.resnet_rename)
        convert.assert_tree_shapes_match(converted, template)

        # values must round-trip exactly (fc kernel transpose etc.)
        out_ref = model.apply(template, jnp.ones((1, 32, 32, 3)))
        out_conv = model.apply(converted, jnp.ones((1, 32, 32, 3)))
        np.testing.assert_allclose(np.asarray(out_conv), np.asarray(out_ref), atol=1e-6)

    def test_robust_prefix_stripping(self):
        from image_recognition_adversarial_example_attack_tpu.models.convert import (
            resnet_rename,
        )

        assert resnet_rename("module.model.layer1.0.downsample.0") == "layer1_0/downsample_conv"
        assert resnet_rename("model.conv1") == "conv1"

    def test_mismatch_detection(self):
        from image_recognition_adversarial_example_attack_tpu.models import convert

        with pytest.raises(ValueError):
            convert.assert_tree_shapes_match({"params": {}}, {"params": {"conv": {}}})


@pytest.mark.slow
def test_zoo_listing_and_random_fallback():
    from image_recognition_adversarial_example_attack_tpu.models.zoo import (
        list_models,
        load_model,
    )

    names = list_models()
    for required in ("resnet50", "resnet50_robust", "vgg19", "vit_b_16", "swin_t",
                     "densenet121", "efficientnet_b0"):
        assert required in names

    with pytest.warns(UserWarning, match="no weights found"):
        bundle = load_model("resnet_tiny", input_size=32)
    assert bundle.source == "random"
    out = bundle.module.apply(bundle.variables, jnp.zeros((1, 32, 32, 3)))
    assert out.shape == (1, 1000) or out.shape[0] == 1


class TestRenameRules:
    def test_vit(self):
        from image_recognition_adversarial_example_attack_tpu.models.convert import vit_rename

        assert vit_rename("encoder.layers.encoder_layer_3.self_attention.out_proj") == \
            "encoder_layer_3/self_attention/out"
        assert vit_rename("encoder.layers.encoder_layer_0.mlp.0") == "encoder_layer_0/mlp_linear_1"
        assert vit_rename("encoder.layers.encoder_layer_0.mlp.linear_2") == "encoder_layer_0/mlp_linear_2"
        assert vit_rename("encoder.ln") == "ln"
        assert vit_rename("encoder") == ""  # pos_embedding parent
        assert vit_rename("heads.head") == "head"
        assert vit_rename("conv_proj") == "conv_proj"

    def test_swin(self):
        from image_recognition_adversarial_example_attack_tpu.models.convert import swin_rename

        assert swin_rename("features.0.0") == "patch_conv"
        assert swin_rename("features.0.2") == "patch_norm"
        assert swin_rename("features.1.0.attn.qkv") == "stage1_block0/attn/qkv"
        assert swin_rename("features.5.3.mlp.3") == "stage3_block3/mlp_3"
        assert swin_rename("features.2.reduction") == "merge1/reduction"
        assert swin_rename("features.6.norm") == "merge3/norm"
        assert swin_rename("head") == "head"

    def test_densenet(self):
        from image_recognition_adversarial_example_attack_tpu.models.convert import densenet_rename

        assert densenet_rename("features.conv0") == "features_conv0"
        assert densenet_rename("features.denseblock2.denselayer5.conv1") == \
            "denseblock2_denselayer5/conv1"
        assert densenet_rename("features.transition1.norm") == "transition1/norm"
        assert densenet_rename("features.norm5") == "features_norm5"
        assert densenet_rename("classifier") == "classifier"

    def test_efficientnet(self):
        from image_recognition_adversarial_example_attack_tpu.models.convert import (
            efficientnet_rename,
        )

        assert efficientnet_rename("features.0.0") == "stem_conv"
        assert efficientnet_rename("features.0.1") == "stem_bn"
        assert efficientnet_rename("features.1.0.block.0.0") == "stage1_block0/dw_conv"
        assert efficientnet_rename("features.1.0.block.1.fc1") == "stage1_block0/se/fc1"
        assert efficientnet_rename("features.2.1.block.0.1") == "stage2_block1/expand_bn"
        assert efficientnet_rename("features.2.1.block.2.fc2") == "stage2_block1/se/fc2"
        assert efficientnet_rename("features.2.1.block.3.0") == "stage2_block1/project_conv"
        assert efficientnet_rename("features.8.1") == "head_bn"
        assert efficientnet_rename("classifier.1") == "classifier"

    def test_mobilenet(self):
        from image_recognition_adversarial_example_attack_tpu.models.convert import (
            mobilenet_rename,
        )

        assert mobilenet_rename("features.0.0") == "stem_conv"
        assert mobilenet_rename("features.0.1") == "stem_bn"
        # block 1 has no expansion: conv.0 = dw CNA, conv.1/.2 = project
        assert mobilenet_rename("features.1.conv.0.0") == "block1/dw_conv"
        assert mobilenet_rename("features.1.conv.0.1") == "block1/dw_bn"
        assert mobilenet_rename("features.1.conv.1") == "block1/project_conv"
        assert mobilenet_rename("features.1.conv.2") == "block1/project_bn"
        # blocks 2..17: conv.0 = expand CNA, conv.1 = dw CNA, conv.2/.3
        assert mobilenet_rename("features.2.conv.0.0") == "block2/expand_conv"
        assert mobilenet_rename("features.2.conv.1.1") == "block2/dw_bn"
        assert mobilenet_rename("features.17.conv.2") == "block17/project_conv"
        assert mobilenet_rename("features.17.conv.3") == "block17/project_bn"
        assert mobilenet_rename("features.18.0") == "head_conv"
        assert mobilenet_rename("classifier.1") == "classifier"


@pytest.mark.slow
def test_zoo_msgpack_cache_roundtrip(tmp_path, monkeypatch):
    """save_variables -> load_model cache hit reproduces exact outputs."""
    import jax
    import jax.numpy as jnp

    from image_recognition_adversarial_example_attack_tpu.models.zoo import (
        load_model,
        save_variables,
    )

    monkeypatch.setenv("ADV_TPU_WEIGHTS_DIR", str(tmp_path))
    with pytest.warns(UserWarning):
        b1 = load_model("resnet_tiny", input_size=32)
    save_variables(b1.variables, tmp_path / "resnet_tiny.msgpack")

    b2 = load_model("resnet_tiny", input_size=32)  # no warning: cache hit
    assert b2.source == "cache"
    x = jnp.ones((1, 32, 32, 3))
    np.testing.assert_allclose(
        np.asarray(b1.module.apply(b1.variables, x)),
        np.asarray(b2.module.apply(b2.variables, x)),
        atol=0,
    )
