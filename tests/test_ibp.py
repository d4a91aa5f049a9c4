"""Interval bound propagation: soundness, training, CLI round-trip.

Beyond-reference capability (the reference has no certification at all,
SURVEY.md §2): defenses/ibp.py bounds every logit over an L-inf ball in
closed form.  The load-bearing property is SOUNDNESS — no reachable logit
may ever escape [lo, hi] — so that is tested by direct sampling, and the
verified flag is cross-checked against the framework's own PGD attack
(a verified sample must be unattackable at the same eps).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_recognition_adversarial_example_attack_tpu.defenses.ibp import (
    interval_propagate,
    logit_bounds,
    make_verify_fn,
    pixel_bounds,
    spec_forward,
    verified_margin,
    worst_case_logits,
)
from image_recognition_adversarial_example_attack_tpu.models.ibp import (
    IBPNet,
    ibp_tiny,
)

ID_MEAN = np.zeros(3, np.float32)
ID_STD = np.ones(3, np.float32)


def _net(num_classes=4, size=16, seed=0):
    module = ibp_tiny(num_classes=num_classes)
    variables = module.init(jax.random.PRNGKey(seed),
                            jnp.zeros((1, size, size, 3), jnp.float32))
    return module, variables


def _toy_data(n=64, size=16, seed=0):
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 2, size=(n,)).astype(np.int32)
    base = np.where(y[:, None, None, None] == 0, 0.25, 0.75)
    x = np.clip(base + rng.uniform(-0.08, 0.08, (n, size, size, 3)), 0, 1)
    return jnp.asarray(x, jnp.float32), jnp.asarray(y)


def test_bounds_are_sound_by_sampling():
    """No point of the eps-ball may produce a logit outside [lo, hi]."""
    module, variables = _net()
    params = variables["params"]
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.uniform(0, 1, (4, 16, 16, 3)), jnp.float32)
    eps = 4 / 255
    lo, hi = jax.jit(lambda xx: logit_bounds(
        params, module.spec, xx, eps, ID_MEAN, ID_STD))(x)
    fwd = jax.jit(lambda xx: module.apply(variables, xx))
    for _ in range(25):
        delta = rng.uniform(-eps, eps, x.shape).astype(np.float32)
        probe = jnp.clip(x + delta, 0.0, 1.0)
        z = fwd(probe)
        assert bool(jnp.all(z >= lo - 1e-5)), "lower bound violated"
        assert bool(jnp.all(z <= hi + 1e-5)), "upper bound violated"


def test_zero_eps_collapses_to_the_forward():
    """At eps=0 the interval degenerates to the module's own logits, and
    spec_forward walks the exact same parameters as Flax's apply."""
    module, variables = _net()
    params = variables["params"]
    x = jnp.asarray(np.random.RandomState(2).uniform(0, 1, (3, 16, 16, 3)),
                    jnp.float32)
    lo, hi = logit_bounds(params, module.spec, x, 0.0, ID_MEAN, ID_STD)
    z = module.apply(variables, x)
    np.testing.assert_allclose(np.asarray(lo), np.asarray(z), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hi), np.asarray(z), atol=1e-5)
    np.testing.assert_allclose(np.asarray(spec_forward(params, module.spec, x)),
                               np.asarray(z), atol=1e-5)


def test_bounds_widen_monotonically_with_eps():
    module, variables = _net()
    params = variables["params"]
    x = jnp.asarray(np.random.RandomState(3).uniform(0, 1, (2, 16, 16, 3)),
                    jnp.float32)
    lo1, hi1 = logit_bounds(params, module.spec, x, 1 / 255, ID_MEAN, ID_STD)
    lo2, hi2 = logit_bounds(params, module.spec, x, 8 / 255, ID_MEAN, ID_STD)
    assert bool(jnp.all(lo2 <= lo1 + 1e-6))
    assert bool(jnp.all(hi2 >= hi1 - 1e-6))


def test_worst_case_logits_and_margin_semantics():
    lo = jnp.asarray([[1.0, -2.0, 0.0]])
    hi = jnp.asarray([[3.0, -1.0, 0.5]])
    y = jnp.asarray([0])
    z = worst_case_logits(lo, hi, y)
    np.testing.assert_allclose(np.asarray(z), [[1.0, -1.0, 0.5]])
    # margin = lo_y - max_other hi = 1.0 - 0.5
    np.testing.assert_allclose(np.asarray(verified_margin(lo, hi, y)), [0.5])
    # flipping the label makes it unverifiable (hi_0 dominates)
    assert float(verified_margin(lo, hi, jnp.asarray([2]))[0]) < 0


def test_pixel_bounds_clip_and_normalize():
    x = jnp.asarray([[[[0.0, 0.5, 1.0]]]], jnp.float32)
    mean = np.asarray([0.5, 0.5, 0.5], np.float32)
    std = np.asarray([0.25, 0.25, 0.25], np.float32)
    lo, hi = pixel_bounds(x, 0.25, mean, std)
    # ball intersected with [0,1] BEFORE normalizing
    np.testing.assert_allclose(np.asarray(lo)[0, 0, 0],
                               (np.asarray([0.0, 0.25, 0.75]) - 0.5) / 0.25)
    np.testing.assert_allclose(np.asarray(hi)[0, 0, 0],
                               (np.asarray([0.25, 0.75, 1.0]) - 0.5) / 0.25)


class _Bundle:
    def __init__(self, module, variables):
        self.module = module
        self.variables = variables


def _train_ibp(steps=80, eps=2 / 255, ramp=40, **cfg):
    from image_recognition_adversarial_example_attack_tpu.train.adversarial import (
        AdvTrainConfig,
        make_ibp_step,
        train_state_from_bundle,
    )

    module, variables = _net(num_classes=2)
    config = AdvTrainConfig(eps=eps, learning_rate=5e-3,
                            ibp_ramp_steps=ramp, **cfg)
    state = train_state_from_bundle(_Bundle(module, variables), config)
    step = jax.jit(make_ibp_step(config, module.spec, ID_MEAN, ID_STD))
    x, y = _toy_data()
    key = jax.random.PRNGKey(0)
    m = {}
    for i in range(steps):
        state, m = step(state, x, y, jax.random.fold_in(key, i))
    return module, state, (x, y), m


@pytest.mark.slow
def test_ibp_training_certifies_the_toy_task():
    """After the ramp completes, most of the margin-separated toy batch is
    PROVABLY robust at eps, and every verified sample resists the
    framework's own PGD at that eps (certificate >= empirical)."""
    from image_recognition_adversarial_example_attack_tpu.attacks import (
        make_logits_fn,
    )
    from image_recognition_adversarial_example_attack_tpu.attacks.pgd import (
        pgd_linf_attack,
    )

    eps = 2 / 255
    module, state, (x, y), m = _train_ibp(steps=80, eps=eps, ramp=40)
    # the ramp completed: training eps reached the target
    np.testing.assert_allclose(float(m["ibp_eps"]), eps, rtol=1e-5)
    verify = jax.jit(make_verify_fn(state.params, module.spec,
                                    ID_MEAN, ID_STD))
    out = verify(x, y, jnp.float32(eps))
    verified = np.asarray(out["verified"])
    assert verified.mean() > 0.8, f"verified only {verified.mean():.2f}"

    lf = make_logits_fn(module, {"params": state.params}, ID_MEAN, ID_STD)
    x_adv = pgd_linf_attack(lf, x, y, eps=eps, alpha=eps / 2, steps=10,
                            key=jax.random.PRNGKey(7))
    pred_adv = np.asarray(jnp.argmax(lf(x_adv), -1))
    flipped_verified = (pred_adv != np.asarray(y)) & verified
    assert not flipped_verified.any(), "PGD broke a certified sample"


@pytest.mark.slow
def test_ibp_step_grad_accum_matches_full_batch():
    from image_recognition_adversarial_example_attack_tpu.train.adversarial import (
        AdvTrainConfig,
        make_ibp_step,
        train_state_from_bundle,
    )

    module, variables = _net(num_classes=2)
    x, y = _toy_data(n=16)
    key = jax.random.PRNGKey(0)
    states = []
    for accum in (1, 4):
        config = AdvTrainConfig(eps=2 / 255, learning_rate=5e-3,
                                ibp_ramp_steps=0, grad_accum=accum)
        state = train_state_from_bundle(_Bundle(module, variables), config)
        step = jax.jit(make_ibp_step(config, module.spec, ID_MEAN, ID_STD))
        state, _ = step(state, x, y, key)
        states.append(state)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-5),
        states[0].params, states[1].params)


@pytest.mark.slow
def test_zoo_registers_ibp_family():
    from image_recognition_adversarial_example_attack_tpu.models.zoo import (
        list_models,
        load_model,
        model_meta,
    )

    assert {"ibp_cnn7", "ibp_tiny"} <= set(list_models())
    meta = model_meta("ibp_cnn7")
    assert meta["input_size"] == 32
    np.testing.assert_allclose(meta["mean"], 0.0)  # identity normalization
    np.testing.assert_allclose(meta["std"], 1.0)
    bundle = load_model("ibp_tiny")
    assert bundle.source == "random"
    z = bundle.apply(jnp.zeros((1, 32, 32, 3), jnp.float32))
    assert z.shape == (1, 10)


@pytest.mark.slow
def test_certify_cli_ibp_method(tmp_path, capsys):
    from PIL import Image

    from image_recognition_adversarial_example_attack_tpu.cli.certify import main

    rng = np.random.RandomState(0)
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(3):
        arr = (rng.uniform(0, 1, (32, 32, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"im{i}.png")
    out = tmp_path / "ibp.json"
    rc = main(["--method", "ibp", "--model", "ibp_tiny",
               "--image_dir", str(d), "--eps_list", "0.004", "0.031",
               "--output", str(out)])
    assert rc == 0
    text = capsys.readouterr().out
    assert "verified_acc=" in text and "clean_acc=" in text
    payload = json.loads(out.read_text())
    assert payload["method"] == "ibp"
    assert len(payload["sweeps"]) == 2
    assert len(payload["sweeps"][0]["results"]) == 3
    # wider ball can only lose certificates
    v0 = payload["sweeps"][0]["verified_accuracy"]
    v1 = payload["sweeps"][1]["verified_accuracy"]
    assert v1 <= v0 + 1e-9


@pytest.mark.slow
def test_adversarial_train_cli_ibp_objective(tmp_path, capsys):
    """End-to-end: --objective ibp trains an ibp_tiny from scratch on a
    subdir-per-class dataset, reports per-epoch verified accuracy, and the
    exported msgpack certifies through the certify CLI."""
    from PIL import Image

    from image_recognition_adversarial_example_attack_tpu.cli.adversarial_train import (
        main as train_main,
    )
    from image_recognition_adversarial_example_attack_tpu.cli.certify import (
        main as certify_main,
    )

    rng = np.random.RandomState(0)
    for name, base in (("class_a", 0.25), ("class_b", 0.75)):
        d = tmp_path / "data" / name
        d.mkdir(parents=True)
        for i in range(6):
            arr = np.clip(base + rng.uniform(-0.08, 0.08, (32, 32, 3)), 0, 1)
            Image.fromarray((arr * 255).astype(np.uint8)).save(d / f"{i}.png")

    out = tmp_path / "ibp.msgpack"
    rc = train_main(["--data_dir", str(tmp_path / "data"),
                     "--model", "ibp_tiny", "--objective", "ibp",
                     "--epochs", "8", "--batch_size", "12", "--lr", "5e-3",
                     "--eps", "0.008", "--ibp_ramp_steps", "4",
                     "--out", str(out)])
    assert rc == 0
    text = capsys.readouterr().out
    assert "verified_acc@0.008=" in text
    assert out.is_file()

    res = tmp_path / "cert.json"
    rc = certify_main(["--method", "ibp", "--model", "ibp_tiny",
                       "--weights", str(out),
                       "--image_dir", str(tmp_path / "data" / "class_a"),
                       "--eps_list", "0.008", "--output", str(res)])
    assert rc == 0
    payload = json.loads(res.read_text())
    assert payload["sweeps"][0]["results"]


@pytest.mark.slow
def test_ibp_objective_rejects_non_spec_models(tmp_path):
    from image_recognition_adversarial_example_attack_tpu.cli.adversarial_train import (
        main,
    )

    d = tmp_path / "data" / "a"
    d.mkdir(parents=True)
    from PIL import Image

    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(d / "im.png")
    with pytest.raises(SystemExit, match="interval propagator"):
        main(["--data_dir", str(tmp_path / "data"), "--model", "resnet_tiny",
              "--objective", "ibp"])
