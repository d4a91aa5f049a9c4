"""Multi-chip semantics on a faked 8-device CPU mesh (SURVEY.md §4 item 3).

Asserts the property that matters for scale-out: sharded execution over the
('data','model') mesh produces the SAME results (attack outputs, eval
counters) as single-device execution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from image_recognition_adversarial_example_attack_tpu.attacks import make_logits_fn
from image_recognition_adversarial_example_attack_tpu.attacks.pgd import pgd_linf_attack
from image_recognition_adversarial_example_attack_tpu.core.constants import (
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from image_recognition_adversarial_example_attack_tpu.defenses.detector import (
    make_features_fn,
)
from image_recognition_adversarial_example_attack_tpu.eval.defense_eval import (
    DefenseEvalConfig,
    evaluate_defenses_batch,
)
from image_recognition_adversarial_example_attack_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
    shard_model_variables,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(n_data=4, n_model=2)


@pytest.fixture(scope="module")
def setup(tiny_resnet):
    model, variables = tiny_resnet
    lf = make_logits_fn(model, variables, IMAGENET_MEAN, IMAGENET_STD)
    ff = make_features_fn(model, variables, IMAGENET_MEAN, IMAGENET_STD)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(16, 32, 32, 3), np.float32)
    y = jnp.argmax(lf(x), -1)
    return model, variables, lf, ff, x, y


class TestMesh:
    def test_mesh_shapes(self):
        assert dict(make_mesh().shape) == {"data": 8, "model": 1}
        assert dict(make_mesh(n_model=2).shape) == {"data": 4, "model": 2}
        with pytest.raises(ValueError):
            make_mesh(n_data=16, n_model=1)

    def test_shard_batch_placement(self, mesh8):
        x = shard_batch(np.zeros((8, 4, 4, 3), np.float32), mesh8)
        assert x.sharding.spec == P("data")

    def test_tp_head_sharding(self, mesh8, tiny_resnet):
        model, variables = tiny_resnet
        placed = shard_model_variables(variables, mesh8, tensor_parallel=True)
        fc = placed["params"]["fc"]["kernel"]
        assert fc.sharding.spec == P(None, "model")
        conv = placed["params"]["conv1"]["kernel"]
        assert conv.sharding.spec == P()  # replicated


class TestShardedEquality:
    def test_pgd_sharded_equals_single_device(self, mesh8, setup):
        """Bitwise-equal adversarial batches sharded vs unsharded."""
        _, _, lf, _, x, y = setup
        key = jax.random.PRNGKey(7)

        def attack(x, y, k):
            return pgd_linf_attack(lf, x, y, eps=8 / 255, alpha=2 / 255,
                                   steps=4, key=k)

        ref = jax.jit(attack)(x, y, key)

        xs = data_sharding(mesh8)
        sharded = jax.jit(attack, in_shardings=(xs, NamedSharding(mesh8, P("data")), None),
                          out_shardings=xs)(shard_batch(np.asarray(x), mesh8),
                                            jax.device_put(y, NamedSharding(mesh8, P("data"))),
                                            key)
        np.testing.assert_allclose(np.asarray(sharded), np.asarray(ref),
                                   rtol=0, atol=1e-6)

    def test_uap_sharded_equals_single_device(self, mesh8, setup):
        """The shared-delta gradient is a batch SUM — under a data-sharded
        batch XLA lowers it to a psum, and the trained delta must match the
        single-device run (attacks/uap.py's data-parallel claim)."""
        from image_recognition_adversarial_example_attack_tpu.attacks import (
            uap_attack,
        )

        _, _, lf, _, x, y = setup
        key = jax.random.PRNGKey(5)

        def train(x, y, k):
            res = uap_attack(lf, x, y, eps=8 / 255, alpha=2 / 255,
                             epochs=3, key=k)
            return res.delta, res.loss_per_epoch

        ref_delta, ref_loss = jax.jit(train)(x, y, key)

        xs = data_sharding(mesh8)
        got_delta, got_loss = jax.jit(
            train,
            in_shardings=(xs, NamedSharding(mesh8, P("data")), None),
            out_shardings=None,
        )(shard_batch(np.asarray(x), mesh8),
          jax.device_put(y, NamedSharding(mesh8, P("data"))), key)
        np.testing.assert_allclose(np.asarray(got_delta),
                                   np.asarray(ref_delta), rtol=0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_loss),
                                   np.asarray(ref_loss), rtol=0, atol=1e-5)

    def test_eval_counters_sharded_equal(self, mesh8, setup):
        """The six defense counters agree between sharded and single-device
        execution (the psum-reduced cross-chip path)."""
        _, _, lf, ff, x, y = setup
        cfg = DefenseEvalConfig(attack_name="fgsm", eps=8 / 255, alpha=2 / 255,
                                steps=2, cw_steps=2)
        key = jax.random.PRNGKey(3)

        def cell(x, y, thr, k):
            out = evaluate_defenses_batch(lf, ff, x, y, thr, cfg, k)
            return {k2: jnp.sum(v) for k2, v in out.items() if k2 != "x_adv"}

        ref = jax.jit(cell)(x, y, 1.0, key)

        xs = data_sharding(mesh8)
        got = jax.jit(
            cell,
            in_shardings=(xs, NamedSharding(mesh8, P("data")), None, None),
            out_shardings=None,
        )(shard_batch(np.asarray(x), mesh8),
          jax.device_put(y, NamedSharding(mesh8, P("data"))), 1.0, key)

        for k2 in ref:
            assert int(ref[k2]) == int(got[k2]), k2

    @pytest.mark.slow
    def test_split_jpeg_sharded_equals_fused_single_device(self, mesh8, setup):
        """A JPEG-bearing cell on the mesh (two sharded programs around the
        host codec stage) produces exactly the fused single-device counters
        (eval/defense_eval.py::make_defense_eval_fn_split_jpeg)."""
        from image_recognition_adversarial_example_attack_tpu.defenses.preprocess import (
            DefenseConfig,
        )
        from image_recognition_adversarial_example_attack_tpu.eval.defense_eval import (
            make_defense_eval_fn,
            make_defense_eval_fn_split_jpeg,
        )

        _, _, lf, ff, x, y = setup
        cfg = DefenseEvalConfig(
            attack_name="pgd", eps=8 / 255, alpha=2 / 255, steps=2, cw_steps=2,
            defense=DefenseConfig(use_jpeg=True, jpeg_quality=60),
        )
        key = jax.random.PRNGKey(5)

        fused = make_defense_eval_fn(lf, ff, cfg)
        ref = fused(x, y, jnp.float32(1.0), key)

        split = make_defense_eval_fn_split_jpeg(lf, ff, cfg)
        got = split(shard_batch(np.asarray(x), mesh8),
                    jax.device_put(y, NamedSharding(mesh8, P("data"))),
                    jnp.float32(1.0), key)

        assert set(got) == set(ref)
        for k2 in ref:
            np.testing.assert_array_equal(np.asarray(got[k2]), np.asarray(ref[k2]), err_msg=k2)

    def test_tp_logits_match_replicated(self, mesh8, setup):
        """Tensor-parallel head produces the same logits as replication."""
        model, variables, _, _, x, _ = setup
        repl = jax.device_put(variables, replicated_sharding(mesh8))
        tp = shard_model_variables(variables, mesh8, tensor_parallel=True)

        def fwd(v, x):
            return model.apply(v, x)

        out_repl = jax.jit(fwd)(repl, x)
        out_tp = jax.jit(fwd)(tp, x)
        np.testing.assert_allclose(np.asarray(out_tp), np.asarray(out_repl),
                                   rtol=1e-5, atol=1e-5)


class TestEngine:
    def test_pad_and_unpad_roundtrip(self, mesh8):
        from image_recognition_adversarial_example_attack_tpu.eval.engine import Engine

        eng = Engine(mesh=mesh8)
        x_np = np.random.RandomState(0).rand(6, 8, 8, 3).astype(np.float32)
        batch = eng.batch_from_array(x_np)
        assert batch.padded_size == 8  # padded to data-axis multiple (4 -> 8)
        assert batch.n_valid == 6
        out = eng.unpad(batch.x, batch)
        np.testing.assert_allclose(out, x_np, atol=0)

    def test_engine_no_mesh(self):
        from image_recognition_adversarial_example_attack_tpu.eval.engine import Engine

        eng = Engine(mesh=None, use_mesh=False)
        x_np = np.random.RandomState(0).rand(3, 8, 8, 3).astype(np.float32)
        batch = eng.batch_from_array(x_np)
        assert batch.padded_size == 3 and batch.n_valid == 3


class TestRealTensorParallel:
    """VERDICT r2 next #4: ViT qkv/MLP and ResNet stage-conv kernels must
    ACTUALLY partition over 'model' and still agree with the replicated
    forward (GSPMD inserts the collectives)."""

    @pytest.fixture(scope="class")
    def vit(self):
        from image_recognition_adversarial_example_attack_tpu.models.vit import (
            vit_tiny,
        )

        model = vit_tiny(num_classes=8)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                        jnp.zeros((1, 32, 32, 3)))
        return model, variables

    def test_vit_specs(self, mesh8, vit):
        model, variables = vit
        placed = shard_model_variables(variables, mesh8, tensor_parallel=True)
        blk = placed["params"]["encoder_layer_0"]
        # head-aligned [D, 3, H, hd] layout, sharded on the head axis
        # (benchmarks/tp_qkv_probe.py: 7 collective-permutes/block cheaper
        # than the packed contiguous split)
        assert blk["self_attention"]["qkv"]["kernel"].sharding.spec == P(
            None, None, "model", None)
        assert blk["self_attention"]["qkv"]["bias"].sharding.spec == P(
            None, "model", None)
        assert blk["self_attention"]["out"]["kernel"].sharding.spec == P("model", None)
        assert blk["mlp_linear_1"]["kernel"].sharding.spec == P(None, "model")
        assert blk["mlp_linear_1"]["bias"].sharding.spec == P("model")
        assert blk["mlp_linear_2"]["kernel"].sharding.spec == P("model", None)
        assert placed["params"]["head"]["kernel"].sharding.spec == P(None, "model")
        # patchify + layernorms stay replicated
        assert placed["params"]["conv_proj"]["kernel"].sharding.spec == P()
        assert blk["ln_1"]["scale"].sharding.spec == P()

    def test_vit_kernels_actually_partition(self, mesh8, vit):
        """Per-shard memory of the dominant tensors is 1/n_model — the
        'model too big for one chip's replication' criterion."""
        model, variables = vit
        placed = shard_model_variables(variables, mesh8, tensor_parallel=True)
        blk = placed["params"]["encoder_layer_0"]
        for leaf in (blk["self_attention"]["qkv"]["kernel"],
                     blk["mlp_linear_1"]["kernel"],
                     blk["mlp_linear_2"]["kernel"]):
            assert leaf.addressable_shards[0].data.size * 2 == leaf.size

    def test_vit_tp_forward_matches_replicated(self, mesh8, vit):
        model, variables = vit
        placed = shard_model_variables(variables, mesh8, tensor_parallel=True)
        lf_tp = make_logits_fn(model, placed, IMAGENET_MEAN, IMAGENET_STD)
        lf = make_logits_fn(model, variables, IMAGENET_MEAN, IMAGENET_STD)
        rng = np.random.RandomState(1)
        x_np = rng.rand(8, 32, 32, 3).astype(np.float32)
        x_sharded = shard_batch(x_np, mesh8)
        got = np.asarray(jax.jit(lf_tp)(x_sharded))
        want = np.asarray(jax.jit(lf)(jnp.asarray(x_np)))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    def test_resnet_stage_convs_partition_and_match(self, mesh8, setup):
        model, variables, lf, _, x, y = setup
        placed = shard_model_variables(variables, mesh8, tensor_parallel=True)
        k = placed["params"]["layer2_0"]["conv2"]["kernel"]
        assert k.sharding.spec == P(None, None, None, "model")
        assert k.addressable_shards[0].data.size * 2 == k.size
        # stem conv stays replicated (tiny; pre-stage)
        assert placed["params"]["conv1"]["kernel"].sharding.spec == P()
        lf_tp = make_logits_fn(model, placed, IMAGENET_MEAN, IMAGENET_STD)
        got = np.asarray(jax.jit(lf_tp)(shard_batch(np.asarray(x), mesh8)))
        want = np.asarray(jax.jit(lf)(x))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    @pytest.mark.slow
    def test_tp_attack_matches_replicated(self, mesh8, vit):
        """A whole attack program (fwd+bwd loop) through TP-sharded
        variables equals the replicated run — gradients cross the model
        axis correctly."""
        model, variables = vit
        placed = shard_model_variables(variables, mesh8, tensor_parallel=True)
        lf_tp = make_logits_fn(model, placed, IMAGENET_MEAN, IMAGENET_STD)
        lf = make_logits_fn(model, variables, IMAGENET_MEAN, IMAGENET_STD)
        rng = np.random.RandomState(2)
        x_np = rng.rand(8, 32, 32, 3).astype(np.float32)
        y = jnp.argmax(lf(jnp.asarray(x_np)), -1)
        key = jax.random.PRNGKey(3)

        def attack(f, xx, yy):
            return pgd_linf_attack(f, xx, yy, eps=8 / 255, alpha=2 / 255,
                                   steps=3, key=key)

        got = np.asarray(jax.jit(lambda xx, yy: attack(lf_tp, xx, yy))(
            shard_batch(x_np, mesh8), jax.device_put(
                y, NamedSharding(mesh8, P("data")))))
        want = np.asarray(jax.jit(lambda xx, yy: attack(lf, xx, yy))(
            jnp.asarray(x_np), y))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


@pytest.mark.slow
class TestTPAllFamilies:
    """Round-3 extension: TP rules cover every model family's dominant
    tensors (Swin attention/MLP, VGG's classifier pair, DenseNet /
    EfficientNet block convs) and still match the replicated forward."""

    @pytest.mark.parametrize("family", ["swin", "vgg", "densenet",
                                        "efficientnet"])
    def test_tp_forward_matches_replicated(self, mesh8, family):
        import jax.numpy as jnp

        from image_recognition_adversarial_example_attack_tpu.models.densenet import (
            densenet_tiny,
        )
        from image_recognition_adversarial_example_attack_tpu.models.efficientnet import (
            efficientnet_tiny,
        )
        from image_recognition_adversarial_example_attack_tpu.models.swin import (
            swin_tiny_test,
        )
        from image_recognition_adversarial_example_attack_tpu.models.vgg import (
            vgg_tiny,
        )

        model = {"swin": swin_tiny_test, "vgg": vgg_tiny,
                 "densenet": densenet_tiny,
                 "efficientnet": efficientnet_tiny}[family](num_classes=8)
        size = 32
        variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                        jnp.zeros((1, size, size, 3)))
        placed = shard_model_variables(variables, mesh8, tensor_parallel=True)
        # at least one parameter actually partitioned over 'model'
        shard_fracs = []
        def collect(p, leaf):
            if hasattr(leaf, "addressable_shards"):
                shard_fracs.append(leaf.addressable_shards[0].data.size
                                   / leaf.size)
            return leaf
        jax.tree_util.tree_map_with_path(collect, placed)
        assert min(shard_fracs) <= 0.5, f"nothing partitioned for {family}"

        lf_tp = make_logits_fn(model, placed, IMAGENET_MEAN, IMAGENET_STD)
        lf = make_logits_fn(model, variables, IMAGENET_MEAN, IMAGENET_STD)
        rng = np.random.RandomState(4)
        x_np = rng.rand(8, size, size, 3).astype(np.float32)
        got = np.asarray(jax.jit(lf_tp)(shard_batch(x_np, mesh8)))
        want = np.asarray(jax.jit(lf)(jnp.asarray(x_np)))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)

    def test_vgg_classifier_pair_specs(self, mesh8):
        import jax.numpy as jnp

        from image_recognition_adversarial_example_attack_tpu.models.vgg import (
            vgg_tiny,
        )

        model = vgg_tiny(num_classes=8)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                        jnp.zeros((1, 32, 32, 3)))
        placed = shard_model_variables(variables, mesh8, tensor_parallel=True)
        p = placed["params"]
        assert p["classifier_0"]["kernel"].sharding.spec == P(None, "model")
        assert p["classifier_0"]["bias"].sharding.spec == P("model")
        assert p["classifier_3"]["kernel"].sharding.spec == P("model", None)
        assert p["classifier_6"]["kernel"].sharding.spec == P(None, "model")


class TestHeadlineCollectives:
    """The 517 x N multi-chip scaling claim (benchmarks/ROOFLINE.md) rests
    on the data-parallel headline attack having ZERO per-step collectives.
    These tests count them in the COMPILED HLO (utils/hlo.py) instead of
    asserting from program structure, so a regression that makes GSPMD
    insert cross-chip traffic fails here (VERDICT r4 #3).  GSPMD
    partitioning is platform-independent: counts on the virtual CPU mesh
    hold for the TPU slice.
    """

    def test_sharded_pgd_hlo_has_zero_collectives(self):
        import bench
        from image_recognition_adversarial_example_attack_tpu.utils.hlo import (
            compiled_collectives,
        )

        attack, x, y = bench.build_attack(16, model_name="resnet_tiny",
                                          size=32, sharded=True)
        counts = compiled_collectives(attack.jitted, attack.example_vars,
                                      x, y, jax.random.PRNGKey(0))
        assert counts == {}, f"data-parallel PGD emitted collectives: {counts}"

    @pytest.mark.slow
    def test_headline_geometry_hlo_has_zero_collectives(self):
        """Same count at the REAL headline geometry (ResNet-50 @224,
        8-way batch shard) — compile-only, never executed."""
        import bench
        from image_recognition_adversarial_example_attack_tpu.utils.hlo import (
            compiled_collectives,
        )

        attack, x, y = bench.build_attack(16, model_name="resnet50",
                                          size=224, sharded=True)
        counts = compiled_collectives(attack.jitted, attack.example_vars,
                                      x, y, jax.random.PRNGKey(0))
        assert counts == {}, f"headline PGD emitted collectives: {counts}"

    def test_counter_is_not_blind(self, mesh8, setup):
        """Sanity: a program that DOES reduce across the mesh is counted —
        guards against the regex silently matching nothing."""
        from functools import partial

        from jax import shard_map

        from image_recognition_adversarial_example_attack_tpu.utils.hlo import (
            compiled_collectives,
        )

        @partial(shard_map, mesh=mesh8, in_specs=P("data"),
                 out_specs=P())
        def summed(v):
            return jax.lax.psum(jnp.sum(v, keepdims=True), "data")

        f = jax.jit(summed)
        counts = compiled_collectives(f, jnp.arange(8.0))
        assert sum(counts.values()) >= 1, counts

    def test_counter_sees_variadic_tuple_collectives(self, mesh8, setup):
        """A multi-operand psum compiles to ONE all-reduce with a TUPLE
        result shape — `(f32[...], f32[...]) all-reduce(...)` — the exact
        form GSPMD emits for fused gradient reductions.  The counter must
        not require a whitespace-free shape token (r5 review: the original
        regex returned {} on this program)."""
        from functools import partial

        from jax import shard_map

        from image_recognition_adversarial_example_attack_tpu.utils.hlo import (
            compiled_collectives,
        )

        @partial(shard_map, mesh=mesh8, in_specs=(P("data"), P("data")),
                 out_specs=(P(), P()))
        def two_sums(a, b):
            return (jax.lax.psum(a, "data"), jax.lax.psum(b, "data"))

        f = jax.jit(two_sums)
        counts = compiled_collectives(f, jnp.ones((8, 4)), jnp.ones((8, 3)))
        assert counts.get("all-reduce", 0) >= 1, counts
