"""ConvNeXt-Tiny (ninth zoo family): structure, converter, int8, TP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from image_recognition_adversarial_example_attack_tpu.core.constants import (
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from image_recognition_adversarial_example_attack_tpu.models import convert
from image_recognition_adversarial_example_attack_tpu.models.convnext import (
    ConvNeXt,
    convnext_micro,
    convnext_tiny,
)


class TestStructure:
    @pytest.mark.slow
    def test_forward_shape_and_grad_flow(self):
        model = convnext_micro(num_classes=10)
        x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3),
                        jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x[:1])
        logits = model.apply(variables, x)
        assert logits.shape == (2, 10)
        assert logits.dtype == jnp.float32
        assert bool(jnp.all(jnp.isfinite(logits)))

        def loss(xx):
            lg = model.apply(variables, xx)
            return -jnp.sum(jax.nn.log_softmax(lg)[:, 0])

        g = jax.grad(loss)(x)
        assert bool(jnp.all(jnp.isfinite(g))) and bool(jnp.any(g != 0))

    def test_full_param_count_matches_torchvision(self):
        """Full ConvNeXt-Tiny == torchvision's 28,589,128 params."""
        model = convnext_tiny()
        variables = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 224, 224, 3))))
        n = sum(int(np.prod(l.shape))
                for l in jax.tree_util.tree_leaves(variables["params"]))
        assert n == 28_589_128
        assert "batch_stats" not in variables  # BN-free family

    def test_features_stage3_tap(self):
        """Detector tap: stage-3-equivalent NHWC map, head dead-code-able."""
        model = convnext_micro(num_classes=10)
        x = jnp.asarray(np.random.RandomState(1).rand(2, 32, 32, 3),
                        jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x[:1])
        feats = model.apply(variables, x,
                            method=type(model).features_stage3)
        assert feats.ndim == 4 and feats.shape[0] == 2
        assert feats.dtype == jnp.float32

    def test_zoo_registration(self):
        from image_recognition_adversarial_example_attack_tpu.models.zoo import (
            list_models,
        )

        assert "convnext_tiny" in list_models()
        assert "convnext_tiny" in convert.RENAMES


class TestRename:
    def test_rename_rules(self):
        r = convert.convnext_rename
        assert r("features.0.0") == "stem_conv"
        assert r("features.0.1") == "stem_ln"
        assert r("features.1.0.block.0") == "stage1_0/dwconv"
        assert r("features.1.2.block.2") == "stage1_2/ln"
        assert r("features.3.1.block.3") == "stage2_1/mlp_linear_1"
        assert r("features.5.8.block.5") == "stage3_8/mlp_linear_2"
        assert r("features.7.0.block.0") == "stage4_0/dwconv"
        assert r("features.5.4") == "stage3_4"  # layer_scale lives here
        assert r("features.2.0") == "down1_ln"
        assert r("features.2.1") == "down1_conv"
        assert r("features.6.1") == "down3_conv"
        assert r("classifier.0") == "head_ln"
        assert r("classifier.2") == "classifier"


@pytest.mark.slow
def test_converter_roundtrip():
    """Synthesized torchvision-keyed checkpoint converts into exactly the
    flax template and reproduces its outputs (incl. the [dim,1,1] ->
    [dim] layer_scale reshape and the exact-erf GELU path)."""
    model = ConvNeXt(depths=(1, 2), dims=(8, 16), num_classes=5)
    template = jax.device_get(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))))
    p = template["params"]

    def get(path):
        node = p
        for k in path.split("/"):
            node = node[k]
        return np.asarray(node)

    sd = {}

    def add_conv(tk, fk):
        sd[tk + ".weight"] = torch.tensor(get(fk + "/kernel").transpose(3, 2, 0, 1))
        sd[tk + ".bias"] = torch.tensor(get(fk + "/bias"))

    def add_ln(tk, fk):
        sd[tk + ".weight"] = torch.tensor(get(fk + "/scale"))
        sd[tk + ".bias"] = torch.tensor(get(fk + "/bias"))

    def add_dense(tk, fk):
        sd[tk + ".weight"] = torch.tensor(get(fk + "/kernel").T)
        sd[tk + ".bias"] = torch.tensor(get(fk + "/bias"))

    add_conv("features.0.0", "stem_conv")
    add_ln("features.0.1", "stem_ln")
    # stage1 = features.1 (1 block), down1 = features.2, stage2 = features.3
    for tv_idx, stage, depth in ((1, 1, 1), (3, 2, 2)):
        for j in range(depth):
            base_t, base_f = f"features.{tv_idx}.{j}", f"stage{stage}_{j}"
            add_conv(f"{base_t}.block.0", f"{base_f}/dwconv")
            add_ln(f"{base_t}.block.2", f"{base_f}/ln")
            add_dense(f"{base_t}.block.3", f"{base_f}/mlp_linear_1")
            add_dense(f"{base_t}.block.5", f"{base_f}/mlp_linear_2")
            # torch stores layer_scale as [dim, 1, 1]
            sd[f"{base_t}.layer_scale"] = torch.tensor(
                get(f"{base_f}/layer_scale").reshape(-1, 1, 1))
    add_ln("features.2.0", "down1_ln")
    add_conv("features.2.1", "down1_conv")
    add_ln("classifier.0", "head_ln")
    add_dense("classifier.2", "classifier")

    converted = convert.convert_state_dict(sd, convert.convnext_rename)
    convert.assert_tree_shapes_match(converted, template)
    x = jnp.asarray(np.random.RandomState(2).rand(2, 32, 32, 3), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(model.apply(converted, x)),
        np.asarray(model.apply(template, x)), atol=1e-6)


class TestInt8:
    @pytest.mark.slow
    def test_int8_agrees_with_float(self):
        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.uniform(0.1, 0.9, (4, 32, 32, 3)).astype(np.float32))
        m = convnext_micro()
        v = m.init(jax.random.PRNGKey(0), x[:1])
        mq = convnext_micro(int8=True)
        a = m.apply(v, x)
        b = mq.apply(v, x)
        denom = float(jnp.max(jnp.abs(a))) + 1e-9
        assert float(jnp.max(jnp.abs(a - b))) / denom < 0.1
        assert float((a.argmax(-1) == b.argmax(-1)).mean()) == 1.0


class TestTensorParallel:
    @pytest.mark.slow
    def test_tp_forward_matches_replicated(self):
        """The existing mlp_linear/stage-conv TP rules cover ConvNeXt's
        dominant tensors with no new rules; sharded == replicated."""
        from image_recognition_adversarial_example_attack_tpu.attacks import (
            make_logits_fn,
        )
        from image_recognition_adversarial_example_attack_tpu.parallel.mesh import (
            make_mesh,
            shard_batch,
            shard_model_variables,
        )

        mesh8 = make_mesh(n_data=4, n_model=2)
        model = convnext_micro(num_classes=8)
        size = 32
        variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                        jnp.zeros((1, size, size, 3)))
        placed = shard_model_variables(variables, mesh8, tensor_parallel=True)
        shard_fracs = []

        def collect(pth, leaf):
            if hasattr(leaf, "addressable_shards"):
                shard_fracs.append(leaf.addressable_shards[0].data.size
                                   / leaf.size)
            return leaf

        jax.tree_util.tree_map_with_path(collect, placed)
        assert min(shard_fracs) <= 0.5, "nothing partitioned for convnext"

        lf_tp = make_logits_fn(model, placed, IMAGENET_MEAN, IMAGENET_STD)
        lf = make_logits_fn(model, variables, IMAGENET_MEAN, IMAGENET_STD)
        rng = np.random.RandomState(4)
        x_np = rng.rand(8, size, size, 3).astype(np.float32)
        got = np.asarray(jax.jit(lf_tp)(shard_batch(x_np, mesh8)))
        want = np.asarray(jax.jit(lf)(jnp.asarray(x_np)))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_attack_and_defense_eval_on_convnext():
    """The family slots into the standard evaluation unit (attack +
    defense + detector via the features_stage3 tap) unchanged."""
    from image_recognition_adversarial_example_attack_tpu.attacks import (
        make_logits_fn,
    )
    from image_recognition_adversarial_example_attack_tpu.defenses.detector import (
        make_features_fn,
    )
    from image_recognition_adversarial_example_attack_tpu.eval.defense_eval import (
        STAT_KEYS,
        DefenseEvalConfig,
        make_defense_eval_fn,
    )

    model = convnext_micro(num_classes=10)
    x = jnp.asarray(np.random.RandomState(6).rand(4, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    lf = make_logits_fn(model, variables, IMAGENET_MEAN, IMAGENET_STD)
    ff = make_features_fn(model, variables, IMAGENET_MEAN, IMAGENET_STD)
    y = jnp.argmax(lf(x), -1)
    cfg = DefenseEvalConfig(attack_name="pgd", eps=8 / 255, alpha=2 / 255,
                            steps=3)
    out = make_defense_eval_fn(lf, ff, cfg)(x, y, 1.0, jax.random.PRNGKey(1))
    for k in STAT_KEYS:
        v = np.asarray(out[k])
        assert v.shape == (4,) and set(np.unique(v)) <= {0, 1}
    assert float(jnp.max(jnp.abs(out["x_adv"] - x))) <= 8 / 255 + 1e-6
