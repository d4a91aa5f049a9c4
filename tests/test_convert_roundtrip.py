"""Full converter round-trips for ViT and Swin on synthesized torch-style
state dicts (miniature configs, real torchvision key patterns).

The rename rules are string-tested in test_models.py; these tests prove the
END-TO-END property that matters: a torchvision-keyed checkpoint converts
into exactly the flax template structure AND reproduces the flax model's
outputs after the layout transforms (qkv fusion, transposes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from image_recognition_adversarial_example_attack_tpu.models import convert
from image_recognition_adversarial_example_attack_tpu.models.swin import SwinTransformer
from image_recognition_adversarial_example_attack_tpu.models.vit import ViT


def _fill_from_template(template_params: dict, template_stats: dict | None,
                        entries: list) -> dict:
    """Build a torch state dict whose values are the template's own arrays
    (so converted output must equal the template bitwise)."""
    sd = {}

    def get(node, path):
        for k in path.split("/"):
            node = node[k]
        return node

    for torch_key, flax_path, kind in entries:
        if kind == "conv":
            kern = np.asarray(get(template_params, flax_path + "/kernel"))
            sd[torch_key + ".weight"] = torch.tensor(kern.transpose(3, 2, 0, 1))
            sd[torch_key + ".bias"] = torch.tensor(
                np.asarray(get(template_params, flax_path + "/bias")))
        elif kind == "dense":
            kern = np.asarray(get(template_params, flax_path + "/kernel"))
            sd[torch_key + ".weight"] = torch.tensor(kern.T)
            node = get(template_params, flax_path)
            if "bias" in node:
                sd[torch_key + ".bias"] = torch.tensor(np.asarray(node["bias"]))
        elif kind == "ln":
            sd[torch_key + ".weight"] = torch.tensor(
                np.asarray(get(template_params, flax_path + "/scale")))
            sd[torch_key + ".bias"] = torch.tensor(
                np.asarray(get(template_params, flax_path + "/bias")))
        elif kind == "qkv":
            # template is head-aligned [D, 3, H, hd]; torch MHA packs it
            # [3D, D] row-major by (part, head, hd) — the inverse of
            # convert.conform_qkv_layout
            kern = np.asarray(get(template_params, flax_path + "/qkv/kernel"))
            sd[torch_key + ".in_proj_weight"] = torch.tensor(
                kern.reshape(kern.shape[0], -1).T)
            sd[torch_key + ".in_proj_bias"] = torch.tensor(np.asarray(
                get(template_params, flax_path + "/qkv/bias")).reshape(-1))
        elif kind == "qkv_linear":
            # swin's qkv is a plain Linear [3C, C] — same packed layout
            kern = np.asarray(get(template_params, flax_path + "/kernel"))
            sd[torch_key + ".weight"] = torch.tensor(
                kern.reshape(kern.shape[0], -1).T)
            sd[torch_key + ".bias"] = torch.tensor(np.asarray(
                get(template_params, flax_path + "/bias")).reshape(-1))
        elif kind == "param":
            sd[torch_key] = torch.tensor(np.asarray(get(template_params, flax_path)))
        else:
            raise ValueError(kind)
    return sd


@pytest.mark.slow
def test_vit_converter_roundtrip():
    model = ViT(patch_size=8, dim=16, depth=2, num_heads=2, mlp_dim=32,
                num_classes=5, image_size=32)
    template = jax.device_get(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    )
    p = template["params"]

    entries = [
        ("conv_proj", "conv_proj", "conv"),
        ("class_token", "class_token", "param"),
        ("encoder.pos_embedding", "pos_embedding", "param"),
        ("encoder.ln", "ln", "ln"),
        ("heads.head", "head", "dense"),
    ]
    for i in range(2):
        base_t = f"encoder.layers.encoder_layer_{i}"
        base_f = f"encoder_layer_{i}"
        entries += [
            (f"{base_t}.ln_1", f"{base_f}/ln_1", "ln"),
            (f"{base_t}.self_attention", f"{base_f}/self_attention", "qkv"),
            (f"{base_t}.self_attention.out_proj", f"{base_f}/self_attention/out", "dense"),
            (f"{base_t}.ln_2", f"{base_f}/ln_2", "ln"),
            (f"{base_t}.mlp.0", f"{base_f}/mlp_linear_1", "dense"),
            (f"{base_t}.mlp.3", f"{base_f}/mlp_linear_2", "dense"),
        ]
    sd = _fill_from_template(p, None, entries)

    converted = convert.convert_state_dict(sd, convert.vit_rename)
    converted = convert.conform_qkv_layout(converted, template)
    convert.assert_tree_shapes_match(converted, template)

    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(model.apply(converted, x)),
        np.asarray(model.apply(template, x)),
        atol=1e-6,
    )


@pytest.mark.slow
def test_swin_converter_roundtrip():
    model = SwinTransformer(patch_size=2, embed_dim=8, depths=(2, 2),
                            num_heads=(2, 2), window=4, num_classes=5)
    template = jax.device_get(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    )
    p = template["params"]

    entries = [
        ("features.0.0", "patch_conv", "conv"),
        ("features.0.2", "patch_norm", "ln"),
        ("norm", "norm", "ln"),
        ("head", "head", "dense"),
        ("features.2.norm", "merge1/norm", "ln"),
        ("features.2.reduction", "merge1/reduction", "dense"),
    ]
    for stage, feat_idx in ((1, "1"), (2, "3")):
        for blk in range(2):
            base_t = f"features.{feat_idx}.{blk}"
            base_f = f"stage{stage}_block{blk}"
            entries += [
                (f"{base_t}.norm1", f"{base_f}/norm1", "ln"),
                (f"{base_t}.attn.qkv", f"{base_f}/attn/qkv", "qkv_linear"),
                (f"{base_t}.attn.proj", f"{base_f}/attn/proj", "dense"),
                (f"{base_t}.attn.relative_position_bias_table",
                 f"{base_f}/attn/relative_position_bias_table", "param"),
                (f"{base_t}.norm2", f"{base_f}/norm2", "ln"),
                (f"{base_t}.mlp.0", f"{base_f}/mlp_0", "dense"),
                (f"{base_t}.mlp.3", f"{base_f}/mlp_3", "dense"),
            ]
    sd = _fill_from_template(p, None, entries)
    # buffers that must be skipped by the converter
    sd["features.1.0.attn.relative_position_index"] = torch.zeros(16 * 16, dtype=torch.long)

    converted = convert.convert_state_dict(sd, convert.swin_rename)
    converted = convert.conform_qkv_layout(converted, template)
    convert.assert_tree_shapes_match(converted, template)

    x = jnp.asarray(np.random.RandomState(1).rand(2, 32, 32, 3), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(model.apply(converted, x)),
        np.asarray(model.apply(template, x)),
        atol=1e-6,
    )


def _bn_entries(sd, template, torch_key, flax_path):
    def get(node, path):
        for k in path.split("/"):
            node = node[k]
        return node

    p = get(template["params"], flax_path)
    s = get(template["batch_stats"], flax_path)
    sd[torch_key + ".weight"] = torch.tensor(np.asarray(p["scale"]))
    sd[torch_key + ".bias"] = torch.tensor(np.asarray(p["bias"]))
    sd[torch_key + ".running_mean"] = torch.tensor(np.asarray(s["mean"]))
    sd[torch_key + ".running_var"] = torch.tensor(np.asarray(s["var"]))
    sd[torch_key + ".num_batches_tracked"] = torch.tensor(0)


def _conv_nobias(sd, template, torch_key, flax_path):
    def get(node, path):
        for k in path.split("/"):
            node = node[k]
        return node

    kern = np.asarray(get(template["params"], flax_path + "/kernel"))
    sd[torch_key + ".weight"] = torch.tensor(kern.transpose(3, 2, 0, 1))


@pytest.mark.slow
def test_densenet_converter_roundtrip():
    from image_recognition_adversarial_example_attack_tpu.models.densenet import DenseNet

    model = DenseNet(block_config=(2, 2), growth_rate=4, init_features=8,
                     num_classes=5)
    template = jax.device_get(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    )
    sd = {}
    _conv_nobias(sd, template, "features.conv0", "features_conv0")
    _bn_entries(sd, template, "features.norm0", "features_norm0")
    for b in (1, 2):
        for l in (1, 2):
            base_t = f"features.denseblock{b}.denselayer{l}"
            base_f = f"denseblock{b}_denselayer{l}"
            _bn_entries(sd, template, f"{base_t}.norm1", f"{base_f}/norm1")
            _conv_nobias(sd, template, f"{base_t}.conv1", f"{base_f}/conv1")
            _bn_entries(sd, template, f"{base_t}.norm2", f"{base_f}/norm2")
            _conv_nobias(sd, template, f"{base_t}.conv2", f"{base_f}/conv2")
    _bn_entries(sd, template, "features.transition1.norm", "transition1/norm")
    _conv_nobias(sd, template, "features.transition1.conv", "transition1/conv")
    _bn_entries(sd, template, "features.norm5", "features_norm5")
    kern = np.asarray(template["params"]["classifier"]["kernel"])
    sd["classifier.weight"] = torch.tensor(kern.T)
    sd["classifier.bias"] = torch.tensor(np.asarray(template["params"]["classifier"]["bias"]))

    converted = convert.convert_state_dict(sd, convert.densenet_rename)
    convert.assert_tree_shapes_match(converted, template)
    x = jnp.asarray(np.random.RandomState(2).rand(2, 32, 32, 3), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(model.apply(converted, x)),
        np.asarray(model.apply(template, x)), atol=1e-6)


@pytest.mark.slow
def test_efficientnet_converter_roundtrip():
    from image_recognition_adversarial_example_attack_tpu.models.efficientnet import (
        EfficientNet,
        MBConvSpec,
    )

    plan = (
        MBConvSpec(1, 3, 1, 8, 8, 1),   # stage 1: no expansion
        MBConvSpec(6, 3, 2, 8, 16, 1),  # stage 2: expansion
    )
    model = EfficientNet(plan=plan, stem_ch=8, head_ch=16, num_classes=5)
    template = jax.device_get(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    )
    sd = {}
    _conv_nobias(sd, template, "features.0.0", "stem_conv")
    _bn_entries(sd, template, "features.0.1", "stem_bn")

    def se(sd, torch_base, flax_base):
        def get(node, path):
            for k in path.split("/"):
                node = node[k]
            return node

        for fc in ("fc1", "fc2"):
            node = get(template["params"], f"{flax_base}/se/{fc}")
            kern = np.asarray(node["kernel"])
            sd[f"{torch_base}.{fc}.weight"] = torch.tensor(kern.transpose(3, 2, 0, 1))
            sd[f"{torch_base}.{fc}.bias"] = torch.tensor(np.asarray(node["bias"]))

    # stage 1 block 0 (no expand): block.0=dw, block.1=se, block.2=project
    _conv_nobias(sd, template, "features.1.0.block.0.0", "stage1_block0/dw_conv")
    _bn_entries(sd, template, "features.1.0.block.0.1", "stage1_block0/dw_bn")
    se(sd, "features.1.0.block.1", "stage1_block0")
    _conv_nobias(sd, template, "features.1.0.block.2.0", "stage1_block0/project_conv")
    _bn_entries(sd, template, "features.1.0.block.2.1", "stage1_block0/project_bn")
    # stage 2 block 0 (expand): 0=expand, 1=dw, 2=se, 3=project
    _conv_nobias(sd, template, "features.2.0.block.0.0", "stage2_block0/expand_conv")
    _bn_entries(sd, template, "features.2.0.block.0.1", "stage2_block0/expand_bn")
    _conv_nobias(sd, template, "features.2.0.block.1.0", "stage2_block0/dw_conv")
    _bn_entries(sd, template, "features.2.0.block.1.1", "stage2_block0/dw_bn")
    se(sd, "features.2.0.block.2", "stage2_block0")
    _conv_nobias(sd, template, "features.2.0.block.3.0", "stage2_block0/project_conv")
    _bn_entries(sd, template, "features.2.0.block.3.1", "stage2_block0/project_bn")

    _conv_nobias(sd, template, "features.8.0", "head_conv")
    _bn_entries(sd, template, "features.8.1", "head_bn")
    kern = np.asarray(template["params"]["classifier"]["kernel"])
    sd["classifier.1.weight"] = torch.tensor(kern.T)
    sd["classifier.1.bias"] = torch.tensor(np.asarray(template["params"]["classifier"]["bias"]))

    converted = convert.convert_state_dict(sd, convert.efficientnet_rename)
    convert.assert_tree_shapes_match(converted, template)
    x = jnp.asarray(np.random.RandomState(3).rand(2, 32, 32, 3), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(model.apply(converted, x)),
        np.asarray(model.apply(template, x)), atol=1e-6)


@pytest.mark.slow
def test_mobilenet_converter_roundtrip():
    from image_recognition_adversarial_example_attack_tpu.models.mobilenet import (
        IRSpec,
        MobileNetV2,
    )

    # block1 = no expansion (like torchvision features.1), block2 = expansion
    plan = (IRSpec(1, 1, 8, 8), IRSpec(6, 2, 8, 16))
    model = MobileNetV2(plan=plan, stem_ch=8, head_ch=16, num_classes=5)
    template = jax.device_get(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    )
    sd = {}
    _conv_nobias(sd, template, "features.0.0", "stem_conv")
    _bn_entries(sd, template, "features.0.1", "stem_bn")
    # block 1 (no expand): conv.0 = dw CNA, conv.1/.2 = project conv/bn
    _conv_nobias(sd, template, "features.1.conv.0.0", "block1/dw_conv")
    _bn_entries(sd, template, "features.1.conv.0.1", "block1/dw_bn")
    _conv_nobias(sd, template, "features.1.conv.1", "block1/project_conv")
    _bn_entries(sd, template, "features.1.conv.2", "block1/project_bn")
    # block 2 (expand): conv.0 = expand CNA, conv.1 = dw CNA, conv.2/.3
    _conv_nobias(sd, template, "features.2.conv.0.0", "block2/expand_conv")
    _bn_entries(sd, template, "features.2.conv.0.1", "block2/expand_bn")
    _conv_nobias(sd, template, "features.2.conv.1.0", "block2/dw_conv")
    _bn_entries(sd, template, "features.2.conv.1.1", "block2/dw_bn")
    _conv_nobias(sd, template, "features.2.conv.2", "block2/project_conv")
    _bn_entries(sd, template, "features.2.conv.3", "block2/project_bn")
    # head sits at features.18 in the full model; the renamer keys on the
    # literal index, so synthesize it there
    _conv_nobias(sd, template, "features.18.0", "head_conv")
    _bn_entries(sd, template, "features.18.1", "head_bn")
    kern = np.asarray(template["params"]["classifier"]["kernel"])
    sd["classifier.1.weight"] = torch.tensor(kern.T)
    sd["classifier.1.bias"] = torch.tensor(
        np.asarray(template["params"]["classifier"]["bias"]))

    converted = convert.convert_state_dict(sd, convert.mobilenet_rename)
    convert.assert_tree_shapes_match(converted, template)
    x = jnp.asarray(np.random.RandomState(3).rand(2, 32, 32, 3), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(model.apply(converted, x)),
        np.asarray(model.apply(template, x)), atol=1e-6)
