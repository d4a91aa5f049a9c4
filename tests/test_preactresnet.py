"""PreActResNet-18 (CIFAR family #2): structure, torch parity, zoo meta."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from image_recognition_adversarial_example_attack_tpu.core.constants import (
    CIFAR10_MEAN,
    CIFAR10_STD,
)
from image_recognition_adversarial_example_attack_tpu.models import convert
from image_recognition_adversarial_example_attack_tpu.models.preactresnet import (
    PreActResNet,
    preact_resnet18,
)


# --- torch reference (kuangliu/pytorch-cifar lineage as vendored by
# RobustBench: shortcut on the pre-activated input, final bn + linear) ----

class _TorchPreActBlock(tnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.bn1 = tnn.BatchNorm2d(cin)
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        if stride != 1 or cin != cout:
            self.shortcut = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, 0, bias=False))

    def forward(self, x):
        pre = F.relu(self.bn1(x))
        sc = self.shortcut(pre) if hasattr(self, "shortcut") else x
        out = self.conv1(pre)
        out = self.conv2(F.relu(self.bn2(out)))
        return out + sc


class _TorchPreActResNet18(tnn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 3, 1, 1, bias=False)
        cins = (64, 64, 128, 256)
        couts = (64, 128, 256, 512)
        for s, (cin, cout) in enumerate(zip(cins, couts), start=1):
            stride = 1 if s == 1 else 2
            setattr(self, f"layer{s}", tnn.Sequential(
                _TorchPreActBlock(cin, cout, stride),
                _TorchPreActBlock(cout, cout, 1)))
        self.bn = tnn.BatchNorm2d(512)
        self.linear = tnn.Linear(512, num_classes)

    def forward(self, x):
        out = self.conv1(x)
        for s in range(1, 5):
            out = getattr(self, f"layer{s}")(out)
        out = F.relu(self.bn(out))
        out = out.mean(dim=(2, 3))
        return self.linear(out)


class TestStructure:
    @pytest.mark.slow
    def test_forward_shape_and_grad_flow(self):
        model = preact_resnet18(num_classes=10)
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

    def test_param_count_matches_torch(self):
        """Same trainable-parameter count as the torch reference topology
        (BN running stats excluded on both sides)."""
        tm = _TorchPreActResNet18()
        want = sum(p.numel() for p in tm.parameters())
        model = preact_resnet18()
        variables = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3))))
        n = sum(int(np.prod(l.shape))
                for l in jax.tree_util.tree_leaves(variables["params"]))
        assert n == want == 11_172_170

    def test_spatial_plan_and_features_tap(self):
        model = preact_resnet18()
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        feats = model.apply(variables, x,
                            method=type(model).features_stage3)
        assert feats.shape == (1, 8, 8, 256)  # 32-32-16-8 after 3 stages
        assert feats.dtype == jnp.float32

    def test_zoo_registration_and_meta(self):
        from image_recognition_adversarial_example_attack_tpu.models.zoo import (
            list_models,
            model_meta,
        )

        assert "preact_resnet18" in list_models()
        assert "preact_resnet18" in convert.RENAMES
        meta = model_meta("preact_resnet18")
        assert meta["input_size"] == 32
        np.testing.assert_array_equal(meta["mean"], CIFAR10_MEAN)
        np.testing.assert_array_equal(meta["std"], CIFAR10_STD)


class TestRename:
    def test_rename_rules(self):
        r = convert.preactresnet_rename
        assert r("conv1") == "conv1"
        assert r("layer1.0.bn1") == "layer1_0/bn1"
        assert r("layer2.0.shortcut.0") == "layer2_0/shortcut_0"
        assert r("layer4.1.conv2") == "layer4_1/conv2"
        assert r("bn") == "bn"
        assert r("linear") == "linear"
        assert r("module.model.layer3.0.bn2") == "layer3_0/bn2"


@pytest.mark.slow
def test_torch_numeric_parity():
    """Randomized torch PreActResNet-18 state_dict converts to flax
    variables that reproduce its eval-mode logits."""
    torch.manual_seed(0)
    tm = _TorchPreActResNet18().float().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0.0, 0.2)

    converted = convert.convert_state_dict(tm.state_dict(),
                                           convert.preactresnet_rename)
    fm = preact_resnet18()
    template = jax.device_get(
        fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))))
    convert.assert_tree_shapes_match(converted, template)

    x = np.random.RandomState(3).rand(4, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(fm.apply(converted, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_attack_smoke():
    from image_recognition_adversarial_example_attack_tpu.attacks import (
        AttackParams,
        make_logits_fn,
        run_attack,
    )

    model = preact_resnet18(num_classes=10)
    x = jnp.asarray(np.random.RandomState(7).rand(2, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    lf = make_logits_fn(model, variables, CIFAR10_MEAN, CIFAR10_STD)
    y = jnp.argmax(lf(x), -1)
    eps = 8 / 255
    x_adv = run_attack("fgsm", lf, x, y, AttackParams(eps=eps),
                       jax.random.PRNGKey(1))
    assert float(jnp.max(jnp.abs(x_adv - x))) <= eps + 1e-6
    assert float(x_adv.min()) >= 0.0 and float(x_adv.max()) <= 1.0
