"""Adversarial training (PGD-AT): the full train step as one program.

The reference consumes RobustBench checkpoints but cannot produce one
(SURVEY.md C8); train/adversarial.py closes the loop.  These tests train
the tiny model on a linearly separable toy task and assert the optimizer
learns, robustifies, and shards.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_recognition_adversarial_example_attack_tpu.train import (
    AdvTrainConfig,
    make_eval_step,
    make_train_step,
    train_state_from_bundle,
)


class _Bundle:
    """Minimal stand-in for models/zoo.ModelBundle."""

    def __init__(self, module, variables):
        self.module = module
        self.variables = variables


def _toy_data(n=64, size=16, seed=0):
    """Two classes separated by mean intensity (margin >> eps)."""
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 2, size=(n,)).astype(np.int32)
    base = np.where(y[:, None, None, None] == 0, 0.25, 0.75)
    x = np.clip(base + rng.uniform(-0.08, 0.08, (n, size, size, 3)), 0, 1)
    return jnp.asarray(x, jnp.float32), jnp.asarray(y)


@pytest.fixture(scope="module")
def trained_state():
    from image_recognition_adversarial_example_attack_tpu.models.tiny import make_tiny

    model, variables = make_tiny(seed=0, image_size=16, num_classes=2)
    config = AdvTrainConfig(eps=8 / 255, alpha=2 / 255, attack_steps=3,
                            learning_rate=5e-3)
    state0 = train_state_from_bundle(_Bundle(model, variables), config)
    train_step = jax.jit(make_train_step(config))

    x, y = _toy_data()
    key = jax.random.PRNGKey(0)
    state, first_metrics = train_step(state0, x, y, key)
    metrics = first_metrics
    for i in range(60):
        state, metrics = train_step(state, x, y, jax.random.fold_in(key, i))
    return state0, state, first_metrics, metrics, x, y, config


def test_loss_decreases_and_step_counts(trained_state):
    state0, state, first, last, *_ = trained_state
    assert int(state.step) == 61
    assert float(last["loss"]) < float(first["loss"])
    assert np.isfinite(float(last["grad_norm"]))


def test_adversarial_accuracy_learned(trained_state):
    """After PGD-AT on a wide-margin task, PGD within eps no longer flips
    predictions (the definition of having learned robustly)."""
    from image_recognition_adversarial_example_attack_tpu.attacks.pgd import (
        pgd_linf_attack,
    )
    from image_recognition_adversarial_example_attack_tpu.core.normalize import (
        normalize_batch,
    )
    from image_recognition_adversarial_example_attack_tpu.core.constants import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )

    _, state, _, last, x, y, config = trained_state
    assert float(last["adv_accuracy"]) > 0.9

    def lf(x01):
        variables = {"params": state.params, **state.extra_variables}
        return state.apply_fn(
            variables, normalize_batch(x01, IMAGENET_MEAN, IMAGENET_STD)
        ).astype(jnp.float32)

    x_adv = pgd_linf_attack(lf, x, y, eps=config.eps, alpha=config.alpha,
                            steps=10, key=jax.random.PRNGKey(7))
    robust_acc = float(jnp.mean(jnp.argmax(lf(x_adv), -1) == y))
    assert robust_acc > 0.9


def test_eval_step(trained_state):
    _, state, _, _, x, y, _ = trained_state
    out = jax.jit(make_eval_step())(state, x, y)
    assert float(out["clean_accuracy"]) > 0.9


@pytest.mark.slow
def test_sharded_train_step_matches_single_device(trained_state):
    """One PGD-AT step over the ('data','model') mesh equals the
    single-device step (the gradient psum is XLA's, not ours)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from image_recognition_adversarial_example_attack_tpu.parallel.mesh import (
        data_sharding,
        make_mesh,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    state0, *_ , x, y, config = trained_state
    train_step = make_train_step(config)
    key = jax.random.PRNGKey(3)

    ref_state, ref_metrics = jax.jit(train_step)(state0, x, y, key)

    mesh = make_mesh(n_data=4, n_model=2)
    xs = data_sharding(mesh)
    got_state, got_metrics = jax.jit(
        train_step,
        in_shardings=(None, xs, NamedSharding(mesh, P("data")), None),
        out_shardings=(None, None),
    )(state0, jax.device_put(x, xs),
      jax.device_put(y, NamedSharding(mesh, P("data"))), key)

    np.testing.assert_allclose(float(got_metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(got_state.params),
                    jax.tree_util.tree_leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_checkpoint_roundtrip(tmp_path, trained_state):
    """Trained variables save/load through the zoo's msgpack cache and the
    robust arm's identity-normalization path."""
    from image_recognition_adversarial_example_attack_tpu.models.zoo import (
        save_variables,
    )
    from flax import serialization

    _, state, _, _, x, _, _ = trained_state
    variables = {"params": state.params, **state.extra_variables}
    out = tmp_path / "at_tiny.msgpack"
    save_variables(variables, out)
    loaded = serialization.from_bytes(variables, out.read_bytes())
    for a, b in zip(jax.tree_util.tree_leaves(loaded),
                    jax.tree_util.tree_leaves(variables)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestTrades:
    @pytest.fixture(scope="class")
    def trades_trained(self):
        from image_recognition_adversarial_example_attack_tpu.models.tiny import (
            make_tiny,
        )
        from image_recognition_adversarial_example_attack_tpu.train import (
            make_trades_step,
        )

        model, variables = make_tiny(seed=0, image_size=16, num_classes=2)
        config = AdvTrainConfig(eps=8 / 255, alpha=2 / 255, attack_steps=3,
                                learning_rate=5e-3, trades_beta=6.0)
        state = train_state_from_bundle(_Bundle(model, variables), config)
        step = jax.jit(make_trades_step(config))

        x, y = _toy_data()
        key = jax.random.PRNGKey(0)
        state, first = step(state, x, y, key)
        last = first
        for i in range(60):
            state, last = step(state, x, y, jax.random.fold_in(key, i))
        return state, first, last, x, y, config

    def test_loss_decomposition_and_decrease(self, trades_trained):
        _, first, last, *_ = trades_trained
        for m in (first, last):
            np.testing.assert_allclose(
                float(m["loss"]),
                float(m["natural_loss"]) + 6.0 * float(m["robust_kl"]),
                rtol=1e-5,
            )
            assert float(m["robust_kl"]) >= 0.0  # KL is nonnegative
        assert float(last["loss"]) < float(first["loss"])

    def test_learns_robustly(self, trades_trained):
        """After TRADES on the wide-margin toy task, PGD within eps no
        longer flips predictions."""
        from image_recognition_adversarial_example_attack_tpu.attacks import (
            make_logits_fn,
        )
        from image_recognition_adversarial_example_attack_tpu.attacks.pgd import (
            pgd_linf_attack,
        )
        from image_recognition_adversarial_example_attack_tpu.core.constants import (
            IMAGENET_MEAN,
            IMAGENET_STD,
        )
        from image_recognition_adversarial_example_attack_tpu.models.tiny import (
            make_tiny,
        )

        state, _, last, x, y, config = trades_trained
        assert float(last["adv_accuracy"]) > 0.9
        model, _ = make_tiny(seed=0, image_size=16, num_classes=2)
        variables = {"params": state.params, **state.extra_variables}
        lf = make_logits_fn(model, variables, IMAGENET_MEAN, IMAGENET_STD)
        x_adv = pgd_linf_attack(lf, x, y, eps=config.eps, alpha=config.alpha,
                                steps=10, key=jax.random.PRNGKey(7))
        robust_acc = float(jnp.mean(jnp.argmax(lf(x_adv), -1) == y))
        assert robust_acc > 0.9

    @pytest.mark.slow
    def test_trades_cli_smoke(self, tmp_path, capsys):
        from PIL import Image

        from image_recognition_adversarial_example_attack_tpu.cli.adversarial_train import (
            main,
        )

        rng = np.random.RandomState(0)
        for cls in ("a", "b"):
            d = tmp_path / "data" / cls
            d.mkdir(parents=True)
            level = 60 if cls == "a" else 190
            for i in range(3):
                arr = np.clip(level + rng.randint(-20, 20, (64, 64, 3)), 0, 255)
                Image.fromarray(arr.astype(np.uint8)).save(d / f"{i}.jpg")
        out = tmp_path / "trades_tiny.msgpack"
        rc = main(["--data_dir", str(tmp_path / "data"), "--model", "resnet_tiny",
                   "--objective", "trades", "--epochs", "1", "--batch_size", "4",
                   "--attack_steps", "2", "--out", str(out)])
        assert rc == 0
        assert out.is_file()
        assert "loss=" in capsys.readouterr().out


class TestNoiseTraining:
    """Gaussian-noise training for randomized smoothing (SmoothAdv/Cohen)."""

    @pytest.mark.slow
    def test_smoothadv_step_descends_and_differs_from_plain(self):
        from image_recognition_adversarial_example_attack_tpu.models.tiny import (
            make_tiny,
        )

        model, variables = make_tiny(seed=0, image_size=16, num_classes=2)
        x, y = _toy_data()
        key = jax.random.PRNGKey(0)

        def run(noise_sigma):
            config = AdvTrainConfig(eps=8 / 255, alpha=2 / 255, attack_steps=2,
                                    learning_rate=5e-3,
                                    noise_sigma=noise_sigma, noise_samples=4)
            state = train_state_from_bundle(_Bundle(model, variables), config)
            step = jax.jit(make_train_step(config))
            state, first = step(state, x, y, key)
            last = first
            for i in range(20):
                state, last = step(state, x, y, jax.random.fold_in(key, i))
            return state, float(first["loss"]), float(last["loss"])

        state_n, first_n, last_n = run(0.25)
        assert last_n < first_n  # the noisy objective is being optimized
        state_p, _, _ = run(0.0)
        # the noise path must actually change the training trajectory
        diffs = [
            float(jnp.max(jnp.abs(a - b)))
            for a, b in zip(jax.tree_util.tree_leaves(state_n.params),
                            jax.tree_util.tree_leaves(state_p.params))
        ]
        assert max(diffs) > 1e-6

    @pytest.mark.slow
    def test_noise_trained_model_still_certifies(self):
        """End-to-end train -> certify: after SmoothAdv fine-tuning on the
        wide-margin toy task, randomized smoothing certifies every sample
        at the all-votes-correct radius."""
        from image_recognition_adversarial_example_attack_tpu.attacks import (
            make_logits_fn,
        )
        from image_recognition_adversarial_example_attack_tpu.core.constants import (
            IMAGENET_MEAN,
            IMAGENET_STD,
        )
        from image_recognition_adversarial_example_attack_tpu.defenses import (
            SmoothedClassifier,
            SmoothingConfig,
        )
        from image_recognition_adversarial_example_attack_tpu.models.tiny import (
            make_tiny,
        )

        model, variables = make_tiny(seed=0, image_size=16, num_classes=2)
        x, y = _toy_data()
        config = AdvTrainConfig(eps=8 / 255, alpha=2 / 255, attack_steps=2,
                                learning_rate=5e-3,
                                noise_sigma=0.25, noise_samples=4)
        state = train_state_from_bundle(_Bundle(model, variables), config)
        step = jax.jit(make_train_step(config))
        key = jax.random.PRNGKey(0)
        for i in range(30):
            state, _ = step(state, x, y, jax.random.fold_in(key, i))

        trained = {"params": state.params, **state.extra_variables}
        lf = make_logits_fn(model, trained, IMAGENET_MEAN, IMAGENET_STD)
        sc = SmoothedClassifier(lf, SmoothingConfig(
            sigma=0.25, n0=16, n=128, chunk=16, alpha=0.01, max_batch=16))
        cls, rad = sc.certify(x[:16], jax.random.PRNGKey(3))
        ok = (cls == np.asarray(y[:16])) & (rad > 0)
        assert ok.mean() >= 0.9


def test_attack_steps_zero_is_pure_cohen_augmentation():
    """Regression: with attack_steps=0 the step must apply NO perturbation
    beyond the Gaussian noise — in particular not PGD's random start
    (which defaults on).  With noise_sigma=0 too, the step is then fully
    deterministic in the key."""
    from image_recognition_adversarial_example_attack_tpu.models.tiny import (
        make_tiny,
    )

    model, variables = make_tiny(seed=0, image_size=16, num_classes=2)
    x, y = _toy_data(n=16)
    config = AdvTrainConfig(eps=0.1, alpha=0.02, attack_steps=0,
                            learning_rate=5e-3, noise_sigma=0.0)
    step = jax.jit(make_train_step(config))
    s1 = train_state_from_bundle(_Bundle(model, variables), config)
    s2 = train_state_from_bundle(_Bundle(model, variables), config)
    s1, m1 = step(s1, x, y, jax.random.PRNGKey(0))
    s2, m2 = step(s2, x, y, jax.random.PRNGKey(123))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=0)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_checkpoint_exact_resume():
    """Full-state checkpointing: save after k steps, restore into a FRESH
    template, continue — bitwise-identical to an uninterrupted run (params
    AND optimizer state round-trip)."""
    from image_recognition_adversarial_example_attack_tpu.models.tiny import (
        make_tiny,
    )
    from image_recognition_adversarial_example_attack_tpu.train.adversarial import (
        load_train_checkpoint,
        save_train_checkpoint,
    )
    import tempfile
    from pathlib import Path

    model, variables = make_tiny(seed=0, image_size=16, num_classes=2)
    x, y = _toy_data(n=16)
    config = AdvTrainConfig(eps=8 / 255, alpha=2 / 255, attack_steps=2,
                            learning_rate=5e-3)
    step = jax.jit(make_train_step(config))
    key = jax.random.PRNGKey(0)

    straight = train_state_from_bundle(_Bundle(model, variables), config)
    for i in range(4):
        straight, _ = step(straight, x, y, jax.random.fold_in(key, i))

    with tempfile.TemporaryDirectory() as d:
        ckpt = Path(d) / "ck.msgpack"
        part = train_state_from_bundle(_Bundle(model, variables), config)
        for i in range(2):
            part, _ = step(part, x, y, jax.random.fold_in(key, i))
        save_train_checkpoint(part, ckpt, epoch=1)

        fresh = train_state_from_bundle(_Bundle(model, variables), config)
        resumed, next_epoch = load_train_checkpoint(fresh, ckpt)
        assert next_epoch == 2
        assert int(resumed.step) == 2
        for i in range(2, 4):
            resumed, _ = step(resumed, x, y, jax.random.fold_in(key, i))

    for a, b in zip(jax.tree_util.tree_leaves(straight.params),
                    jax.tree_util.tree_leaves(resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(straight.opt_state),
                    jax.tree_util.tree_leaves(resumed.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestMemoryLevers:
    """grad_accum + remat (AdvTrainConfig): the two standard TPU levers for
    fitting large effective batches — both must leave the training
    semantics intact (beyond-reference; the reference has no trainer)."""

    def _setup(self, **cfg_kwargs):
        from image_recognition_adversarial_example_attack_tpu.models.tiny import (
            make_tiny)

        model, variables = make_tiny(seed=0, image_size=16, num_classes=2)
        config = AdvTrainConfig(eps=8 / 255, alpha=2 / 255,
                                learning_rate=5e-3, **cfg_kwargs)
        state = train_state_from_bundle(_Bundle(model, variables), config)
        return config, state

    def test_grad_accum_matches_whole_batch(self):
        # attack_steps=0 removes the only key-dependent piece, so the
        # scanned micro-batches must reproduce the whole-batch gradient
        # exactly (mean of equal-size micro means == global mean)
        x, y = _toy_data(n=16)
        key = jax.random.PRNGKey(3)
        results = {}
        for accum in (1, 4):
            config, state = self._setup(attack_steps=0, grad_accum=accum)
            step = jax.jit(make_train_step(config))
            new_state, metrics = step(state, x, y, key)
            results[accum] = (new_state, metrics)
        p1 = jax.tree.leaves(results[1][0].params)
        p4 = jax.tree.leaves(results[4][0].params)
        for a, b in zip(p1, p4):
            np.testing.assert_allclose(a, b, atol=1e-6)
        for k in ("loss", "adv_accuracy", "grad_norm"):
            np.testing.assert_allclose(results[1][1][k], results[4][1][k],
                                       atol=1e-5)

    def test_grad_accum_with_pgd_learns(self):
        # with the attack on, micro-batches draw independent PGD keys —
        # not bitwise-comparable to accum=1, but training must still work
        x, y = _toy_data(n=32)
        config, state = self._setup(attack_steps=3, grad_accum=4)
        step = jax.jit(make_train_step(config))
        key = jax.random.PRNGKey(0)
        state, first = step(state, x, y, key)
        for i in range(40):
            state, metrics = step(state, x, y, jax.random.fold_in(key, i))
        assert int(state.step) == 41
        assert float(metrics["loss"]) < float(first["loss"])
        assert float(metrics["adv_accuracy"]) > 0.9

    def test_grad_accum_rejects_indivisible_batch(self):
        x, y = _toy_data(n=10)
        config, state = self._setup(attack_steps=0, grad_accum=4)
        step = jax.jit(make_train_step(config))
        with pytest.raises(ValueError, match="not divisible"):
            step(state, x, y, jax.random.PRNGKey(0))

    @pytest.mark.parametrize("objective", ["pgd-at", "trades"])
    def test_remat_is_semantically_invisible(self, objective):
        # jax.checkpoint recomputes the SAME forward: params after one
        # step must match the un-remat program to fp noise
        from image_recognition_adversarial_example_attack_tpu.train import (
            make_trades_step)

        x, y = _toy_data(n=8)
        key = jax.random.PRNGKey(7)
        out = {}
        for remat in (False, True):
            config, state = self._setup(attack_steps=2, remat=remat)
            maker = make_trades_step if objective == "trades" else make_train_step
            step = jax.jit(maker(config))
            new_state, metrics = step(state, x, y, key)
            out[remat] = (new_state, metrics)
        for a, b in zip(jax.tree.leaves(out[False][0].params),
                        jax.tree.leaves(out[True][0].params)):
            np.testing.assert_allclose(a, b, atol=1e-6)
        np.testing.assert_allclose(out[False][1]["loss"], out[True][1]["loss"],
                                   atol=1e-6)

    def test_trades_grad_accum_smoke(self):
        from image_recognition_adversarial_example_attack_tpu.train import (
            make_trades_step)

        x, y = _toy_data(n=16)
        config, state = self._setup(attack_steps=2, grad_accum=2)
        step = jax.jit(make_trades_step(config))
        state, metrics = step(state, x, y, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["robust_kl"]))
        assert int(state.step) == 1


def test_sharded_accum_remat_step_matches_single_device():
    """grad_accum's micro-batch scan and the checkpointed backward must
    compose with the data-axis gradient psum: same key, same update."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from image_recognition_adversarial_example_attack_tpu.models.tiny import (
        make_tiny)
    from image_recognition_adversarial_example_attack_tpu.parallel.mesh import (
        data_sharding, make_mesh)

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    model, variables = make_tiny(seed=0, image_size=16, num_classes=2)
    config = AdvTrainConfig(eps=8 / 255, alpha=2 / 255, attack_steps=2,
                            learning_rate=5e-3, grad_accum=2, remat=True)
    state0 = train_state_from_bundle(_Bundle(model, variables), config)
    x, y = _toy_data(n=16)
    key = jax.random.PRNGKey(5)
    train_step = make_train_step(config)

    ref_state, ref_metrics = jax.jit(train_step)(state0, x, y, key)

    mesh = make_mesh(n_data=4, n_model=2)
    xs = data_sharding(mesh)
    got_state, got_metrics = jax.jit(
        train_step,
        in_shardings=(None, xs, NamedSharding(mesh, P("data")), None),
        out_shardings=(None, None),
    )(state0, jax.device_put(x, xs),
      jax.device_put(y, NamedSharding(mesh, P("data"))), key)

    np.testing.assert_allclose(float(got_metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(got_state.params),
                    jax.tree_util.tree_leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


class TestEMA:
    """Parameter EMA: shadow recurrence, checkpointing, deployment."""

    def _setup(self, decay=0.5):
        from image_recognition_adversarial_example_attack_tpu.models.tiny import (
            make_tiny,
        )

        model, variables = make_tiny(seed=3, image_size=16, num_classes=2)
        config = AdvTrainConfig(eps=8 / 255, alpha=2 / 255, attack_steps=2,
                                learning_rate=5e-3, ema_decay=decay)
        state = train_state_from_bundle(_Bundle(model, variables), config)
        step = jax.jit(make_train_step(config))
        x, y = _toy_data(n=16, seed=3)
        return state, step, x, y

    def test_shadow_matches_recurrence(self):
        """ema_t must equal the exact d*ema + (1-d)*params recurrence over
        the recorded parameter trajectory."""
        state, step, x, y = self._setup(decay=0.5)
        key = jax.random.PRNGKey(7)
        ema_ref = jax.tree.map(np.asarray, state.params)
        for i in range(3):
            state, _ = step(state, x, y, jax.random.fold_in(key, i))
            ema_ref = jax.tree.map(
                lambda e, p: 0.5 * e + 0.5 * np.asarray(p),
                ema_ref, state.params)
        got = jax.tree.map(np.asarray, state.ema_params)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
            got, ema_ref)
        # the shadow lags the raw params (it is not just a copy)
        diffs = jax.tree.leaves(jax.tree.map(
            lambda e, p: float(np.max(np.abs(e - np.asarray(p)))),
            got, state.params))
        assert max(diffs) > 0.0

    def test_disabled_by_default(self):
        from image_recognition_adversarial_example_attack_tpu.models.tiny import (
            make_tiny,
        )
        from image_recognition_adversarial_example_attack_tpu.train.adversarial import (
            deploy_params,
        )

        model, variables = make_tiny(seed=4, image_size=16, num_classes=2)
        config = AdvTrainConfig(attack_steps=1)
        state = train_state_from_bundle(_Bundle(model, variables), config)
        assert state.ema_params is None
        assert deploy_params(state) is state.params

    def test_deploy_and_eval_use_shadow(self):
        from image_recognition_adversarial_example_attack_tpu.train.adversarial import (
            deploy_params,
        )

        state, step, x, y = self._setup(decay=0.9)
        key = jax.random.PRNGKey(8)
        for i in range(2):
            state, _ = step(state, x, y, jax.random.fold_in(key, i))
        assert deploy_params(state) is state.ema_params
        ev_raw = make_eval_step()(state, x, y)
        ev_ema = make_eval_step(use_ema=True)(state, x, y)
        # both run; the EMA eval must consume the shadow (smoke: finite)
        assert np.isfinite(float(ev_raw["clean_accuracy"]))
        assert np.isfinite(float(ev_ema["clean_accuracy"]))

    def test_checkpoint_roundtrip_preserves_shadow(self, tmp_path):
        from image_recognition_adversarial_example_attack_tpu.train.adversarial import (
            load_train_checkpoint,
            save_train_checkpoint,
        )

        state, step, x, y = self._setup(decay=0.8)
        key = jax.random.PRNGKey(9)
        for i in range(2):
            state, _ = step(state, x, y, jax.random.fold_in(key, i))
        path = tmp_path / "ema.ckpt"
        save_train_checkpoint(state, path, epoch=1)

        fresh, _, _, _ = self._setup(decay=0.8)
        restored, next_epoch = load_train_checkpoint(fresh, path)
        assert next_epoch == 2
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            restored.ema_params, state.ema_params)

    @pytest.mark.slow
    def test_resume_continues_shadow_exactly(self, tmp_path):
        """2 steps + checkpoint + 2 steps == 4 uninterrupted steps, EMA
        shadow included (bitwise)."""
        from image_recognition_adversarial_example_attack_tpu.train.adversarial import (
            load_train_checkpoint,
            save_train_checkpoint,
        )

        key = jax.random.PRNGKey(11)

        state_a, step, x, y = self._setup(decay=0.7)
        for i in range(4):
            state_a, _ = step(state_a, x, y, jax.random.fold_in(key, i))

        state_b, step_b, _, _ = self._setup(decay=0.7)
        for i in range(2):
            state_b, _ = step_b(state_b, x, y, jax.random.fold_in(key, i))
        path = tmp_path / "mid.ckpt"
        save_train_checkpoint(state_b, path, epoch=0)
        fresh, step_c, _, _ = self._setup(decay=0.7)
        state_c, _ = load_train_checkpoint(fresh, path)
        for i in range(2, 4):
            state_c, _ = step_c(state_c, x, y, jax.random.fold_in(key, i))

        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            (state_a.params, state_a.ema_params),
            (state_c.params, state_c.ema_params))


class TestLRSchedule:
    def _setup(self, **cfg_kw):
        from image_recognition_adversarial_example_attack_tpu.models.tiny import (
            make_tiny,
        )

        model, variables = make_tiny(seed=5, image_size=16, num_classes=2)
        config = AdvTrainConfig(attack_steps=1, learning_rate=5e-3, **cfg_kw)
        state = train_state_from_bundle(_Bundle(model, variables), config)
        step = jax.jit(make_train_step(config))
        x, y = _toy_data(n=8, seed=5)
        return state, step, x, y, config

    def test_schedule_values(self):
        from image_recognition_adversarial_example_attack_tpu.train.adversarial import (
            make_lr_schedule,
        )

        cfg = AdvTrainConfig(learning_rate=1e-2, lr_schedule="cosine",
                             warmup_steps=4, total_steps=20)
        sched = make_lr_schedule(cfg)
        assert float(sched(0)) == 0.0
        assert abs(float(sched(4)) - 1e-2) < 1e-9   # warmup peak
        assert float(sched(20)) < 1e-4              # decayed to ~0
        # monotone decay after warmup
        vals = [float(sched(s)) for s in range(4, 21)]
        assert all(a >= b for a, b in zip(vals, vals[1:]))
        # plain constant stays a float (old opt_state trees keep loading)
        assert isinstance(
            make_lr_schedule(AdvTrainConfig(learning_rate=1e-2)), float)

    def test_cosine_requires_total_steps(self):
        with pytest.raises(ValueError, match="total_steps"):
            self._setup(lr_schedule="cosine", total_steps=0)

    @pytest.mark.slow
    def test_cosine_trains_and_resumes_exactly(self, tmp_path):
        """Schedule state rides opt_state: 2 steps + resume + 2 steps ==
        4 uninterrupted steps, bitwise."""
        from image_recognition_adversarial_example_attack_tpu.train.adversarial import (
            load_train_checkpoint,
            save_train_checkpoint,
        )

        kw = dict(lr_schedule="cosine", warmup_steps=1, total_steps=4)
        key = jax.random.PRNGKey(13)

        state_a, step, x, y, _ = self._setup(**kw)
        for i in range(4):
            state_a, _ = step(state_a, x, y, jax.random.fold_in(key, i))

        state_b, step_b, _, _, _ = self._setup(**kw)
        for i in range(2):
            state_b, _ = step_b(state_b, x, y, jax.random.fold_in(key, i))
        path = tmp_path / "sched.ckpt"
        save_train_checkpoint(state_b, path, epoch=0)
        fresh, step_c, _, _, _ = self._setup(**kw)
        state_c, _ = load_train_checkpoint(fresh, path)
        for i in range(2, 4):
            state_c, _ = step_c(state_c, x, y, jax.random.fold_in(key, i))

        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            state_a.params, state_c.params)

    def test_warmup_first_step_smaller_than_constant(self):
        """With warmup the first update must move parameters less than the
        constant-LR first update (LR starts at ~0)."""
        state_w, step_w, x, y, _ = self._setup(warmup_steps=10)
        state_c, step_c, _, _, _ = self._setup()
        key = jax.random.PRNGKey(14)
        new_w, _ = step_w(state_w, x, y, key)
        new_c, _ = step_c(state_c, x, y, key)

        def total_move(old, new):
            return sum(float(jnp.sum(jnp.abs(a - b))) for a, b in zip(
                jax.tree.leaves(old.params), jax.tree.leaves(new.params)))

        assert total_move(state_w, new_w) < total_move(state_c, new_c)


def test_robust_eval_step():
    """PGD-k robust accuracy on the current params: bounded, jit-able,
    and <= clean accuracy on a trained model."""
    from image_recognition_adversarial_example_attack_tpu.models.tiny import (
        make_tiny,
    )
    from image_recognition_adversarial_example_attack_tpu.train.adversarial import (
        make_robust_eval_step,
    )

    model, variables = make_tiny(seed=6, image_size=16, num_classes=2)
    config = AdvTrainConfig(attack_steps=2, learning_rate=5e-3)
    state = train_state_from_bundle(_Bundle(model, variables), config)
    step = jax.jit(make_train_step(config))
    x, y = _toy_data(n=16, seed=6)
    key = jax.random.PRNGKey(15)
    for i in range(20):
        state, _ = step(state, x, y, jax.random.fold_in(key, i))

    ev = jax.jit(make_eval_step())(state, x, y)
    rv = jax.jit(make_robust_eval_step(5, 8 / 255, 2 / 255))(
        state, x, y, jax.random.PRNGKey(16))
    clean = float(ev["clean_accuracy"])
    robust = float(rv["robust_accuracy"])
    assert 0.0 <= robust <= 1.0
    assert robust <= clean + 1e-6  # an eps-ball adversary never helps
