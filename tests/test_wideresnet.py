"""WideResNet (CIFAR family): structure, converter torch-parity, zoo meta.

The WRN is the robustness literature's standard small-image backbone; the
torch numeric-parity test below instantiates the Madry/RobustBench
reference block structure in torch directly (torchvision has no WRN-CIFAR)
so the converter is checked against real torch BatchNorm/conv semantics.
"""

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
from image_recognition_adversarial_example_attack_tpu.models.wideresnet import (
    WideResNet,
    wrn28_10,
    wrn_tiny,
)


class TestStructure:
    def test_forward_shape_and_grad_flow(self):
        model = wrn_tiny(num_classes=10)
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

    def test_wrn28_10_param_count(self):
        """WRN-28-10/CIFAR-10 == 36,479,194 trainable params (the count the
        Madry-lab/RobustBench implementation reports)."""
        model = wrn28_10()
        variables = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3))))
        n = sum(int(np.prod(l.shape))
                for l in jax.tree_util.tree_leaves(variables["params"]))
        assert n == 36_479_194

    def test_spatial_plan(self):
        """No stem downsampling at 32x32: groups run at 32/16/8."""
        model = wrn_tiny(num_classes=10)
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        feats = model.apply(variables, x,
                            method=type(model).features_stage3)
        assert feats.shape[1:3] == (16, 16)  # after 2 of 3 groups

    def test_features_stage3_tap(self):
        model = wrn_tiny(num_classes=10)
        x = jnp.asarray(np.random.RandomState(1).rand(2, 32, 32, 3),
                        jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x[:1])
        feats = model.apply(variables, x,
                            method=type(model).features_stage3)
        assert feats.ndim == 4 and feats.shape[0] == 2
        assert feats.dtype == jnp.float32

    def test_zoo_registration_and_meta(self):
        from image_recognition_adversarial_example_attack_tpu.models.zoo import (
            list_models,
            model_meta,
        )

        for name in ("wrn28_10", "wrn34_10", "wrn_tiny", "wrn28_10_robust"):
            assert name in list_models()
        for name in ("wrn28_10", "wrn34_10", "wrn28_10_robust"):
            assert name in convert.RENAMES
        meta = model_meta("wrn28_10")
        assert meta["input_size"] == 32
        np.testing.assert_array_equal(meta["mean"], CIFAR10_MEAN)
        np.testing.assert_array_equal(meta["std"], CIFAR10_STD)
        robust = model_meta("wrn28_10_robust")
        np.testing.assert_array_equal(robust["mean"], np.zeros(3))
        np.testing.assert_array_equal(robust["std"], np.ones(3))
        # ImageNet families keep their convention
        r50 = model_meta("resnet50")
        assert r50["input_size"] == 224

    @pytest.mark.slow
    def test_load_model_uses_meta(self):
        from image_recognition_adversarial_example_attack_tpu.models.zoo import (
            load_model,
        )

        with pytest.warns(UserWarning):
            bundle = load_model("wrn_tiny")
        assert bundle.input_size == 32
        np.testing.assert_array_equal(bundle.mean, CIFAR10_MEAN)
        logits = bundle.apply(jnp.zeros((1, 32, 32, 3), jnp.float32))
        assert logits.shape == (1, 10)


class TestRename:
    def test_rename_rules(self):
        r = convert.wideresnet_rename
        assert r("conv1") == "conv1"
        assert r("block1.layer.0.bn1") == "block1_0/bn1"
        assert r("block1.layer.0.convShortcut") == "block1_0/convShortcut"
        assert r("block2.layer.3.conv2") == "block2_3/conv2"
        assert r("block3.layer.0.conv1") == "block3_0/conv1"
        assert r("bn1") == "bn1"
        assert r("fc") == "fc"
        # DataParallel / RobustBench wrappers strip
        assert r("module.model.block1.layer.1.bn2") == "block1_1/bn2"


# --- torch reference implementation (Madry/RobustBench wide_resnet.py
# block semantics and state_dict naming) -----------------------------------

class _TorchBlock(tnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.bn1 = tnn.BatchNorm2d(cin)
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.equal = cin == cout and stride == 1
        if not self.equal:
            self.convShortcut = tnn.Conv2d(cin, cout, 1, stride, 0,
                                           bias=False)

    def forward(self, x):
        pre = F.relu(self.bn1(x))
        out = self.conv1(pre)
        out = self.conv2(F.relu(self.bn2(out)))
        return out + (x if self.equal else self.convShortcut(pre))


class _TorchGroup(tnn.Module):
    def __init__(self, n, cin, cout, stride):
        super().__init__()
        self.layer = tnn.Sequential(*[
            _TorchBlock(cin if i == 0 else cout, cout,
                        stride if i == 0 else 1)
            for i in range(n)])

    def forward(self, x):
        return self.layer(x)


class _TorchWRN(tnn.Module):
    def __init__(self, depth=10, widen=1, num_classes=10):
        super().__init__()
        n = (depth - 4) // 6
        w = [16, 16 * widen, 32 * widen, 64 * widen]
        self.conv1 = tnn.Conv2d(3, 16, 3, 1, 1, bias=False)
        self.block1 = _TorchGroup(n, w[0], w[1], 1)
        self.block2 = _TorchGroup(n, w[1], w[2], 2)
        self.block3 = _TorchGroup(n, w[2], w[3], 2)
        self.bn1 = tnn.BatchNorm2d(w[3])
        self.fc = tnn.Linear(w[3], num_classes)

    def forward(self, x):
        out = self.block3(self.block2(self.block1(self.conv1(x))))
        out = F.relu(self.bn1(out))
        out = out.mean(dim=(2, 3))
        return self.fc(out)


@pytest.mark.slow
def test_torch_numeric_parity():
    """A randomized torch WRN's state_dict converts to flax variables that
    reproduce its eval-mode logits (real BN running stats exercised)."""
    torch.manual_seed(0)
    tm = _TorchWRN(depth=10, widen=1, num_classes=10).float().eval()
    # randomize BN running stats so the batch_stats conversion is load-bearing
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0.0, 0.2)

    converted = convert.convert_state_dict(tm.state_dict(),
                                           convert.wideresnet_rename)
    fm = WideResNet(depth=10, widen=1, num_classes=10)
    template = jax.device_get(
        fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))))
    convert.assert_tree_shapes_match(converted, template)

    x = np.random.RandomState(3).rand(4, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(fm.apply(converted, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


class TestAttackAndTP:
    def test_pgd_on_wrn(self):
        """The attack stack runs unchanged at 32x32 with CIFAR norm."""
        from image_recognition_adversarial_example_attack_tpu.attacks import (
            AttackParams,
            make_logits_fn,
            run_attack,
        )

        model = wrn_tiny(num_classes=10)
        x = jnp.asarray(np.random.RandomState(7).rand(4, 32, 32, 3),
                        jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x[:1])
        lf = make_logits_fn(model, variables, CIFAR10_MEAN, CIFAR10_STD)
        y = jnp.argmax(lf(x), -1)
        eps = 8 / 255
        x_adv = run_attack("pgd", lf, x, y,
                           AttackParams(eps=eps, alpha=2 / 255, steps=5),
                           jax.random.PRNGKey(1))
        assert float(jnp.max(jnp.abs(x_adv - x))) <= eps + 1e-6
        assert float(x_adv.min()) >= 0.0 and float(x_adv.max()) <= 1.0

    @pytest.mark.slow
    def test_tp_forward_matches_replicated(self):
        """The generic block-conv TP rule partitions WRN kernels; the
        sharded forward matches the replicated one."""
        from image_recognition_adversarial_example_attack_tpu.attacks import (
            make_logits_fn,
        )
        from image_recognition_adversarial_example_attack_tpu.parallel.mesh import (
            make_mesh,
            shard_batch,
            shard_model_variables,
        )

        mesh8 = make_mesh(n_data=4, n_model=2)
        model = wrn_tiny(num_classes=10)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                        jnp.zeros((1, 32, 32, 3)))
        placed = shard_model_variables(variables, mesh8,
                                       tensor_parallel=True)
        shard_fracs = []

        def collect(pth, leaf):
            if hasattr(leaf, "addressable_shards"):
                shard_fracs.append(leaf.addressable_shards[0].data.size
                                   / leaf.size)
            return leaf

        jax.tree_util.tree_map_with_path(collect, placed)
        assert min(shard_fracs) <= 0.5, "nothing partitioned for WRN"

        lf_tp = make_logits_fn(model, placed, CIFAR10_MEAN, CIFAR10_STD)
        lf = make_logits_fn(model, variables, CIFAR10_MEAN, CIFAR10_STD)
        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.rand(8, 32, 32, 3), jnp.float32)
        with mesh8:
            got = jax.jit(lf_tp)(shard_batch(x, mesh8))
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(jax.jit(lf)(x)),
                                   atol=2e-5)
