"""defenses/crown_ibp.py: backward linear bounds over IBP intermediates."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_recognition_adversarial_example_attack_tpu.core.normalize import (
    normalize_batch,
)
from image_recognition_adversarial_example_attack_tpu.defenses.crown_ibp import (
    crown_ibp_margin,
    make_crown_verify_fn,
)
from image_recognition_adversarial_example_attack_tpu.defenses.ibp import (
    make_verify_fn,
    spec_forward,
)
from image_recognition_adversarial_example_attack_tpu.models.zoo import (
    load_model,
)

ID_MEAN = jnp.zeros(3, jnp.float32)
ID_STD = jnp.ones(3, jnp.float32)


def _setup(seed=0, b=6):
    bundle = load_model("ibp_tiny")
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.uniform(0, 1, (b, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 10, b))
    return bundle, x, y


def _exact_margin(params, spec, x, y, mean, std):
    logits = np.asarray(spec_forward(params, spec,
                                     normalize_batch(x, mean, std)))
    b = logits.shape[0]
    ly = logits[np.arange(b), np.asarray(y)]
    others = logits.copy()
    others[np.arange(b), np.asarray(y)] = -np.inf
    return ly - others.max(-1)


@pytest.mark.slow
def test_zero_eps_margin_is_exact():
    bundle, x, y = _setup()
    params, spec = bundle.variables["params"], bundle.module.spec
    m = np.asarray(crown_ibp_margin(params, spec, x, y, 0.0,
                                    bundle.mean, bundle.std))
    np.testing.assert_allclose(m, _exact_margin(params, spec, x, y,
                                                bundle.mean, bundle.std),
                               atol=1e-4)


@pytest.mark.slow
def test_crown_margin_at_least_ibp_and_monotone_in_eps():
    bundle, x, y = _setup()
    params, spec = bundle.variables["params"], bundle.module.spec
    ibp_v = jax.jit(make_verify_fn(params, spec, bundle.mean, bundle.std))
    crown_v = jax.jit(make_crown_verify_fn(params, spec, bundle.mean,
                                           bundle.std))
    prev = None
    for eps in (0.0, 0.002, 0.008, 0.031):
        mi = np.asarray(ibp_v(x, y, eps)["margin"])
        mc = np.asarray(crown_v(x, y, eps)["margin"])
        assert (mc >= mi - 1e-5).all(), f"crown looser than ibp at eps={eps}"
        if prev is not None:  # wider ball can only shrink the margin
            assert (mc <= prev + 1e-5).all()
        prev = mc
    # strictly tighter somewhere once relaxation kicks in
    assert (np.asarray(crown_v(x, y, 0.031)["margin"])
            > np.asarray(ibp_v(x, y, 0.031)["margin"]) + 1e-3).any()


@pytest.mark.slow
def test_bound_is_sound_against_ball_samples():
    bundle, x, y = _setup(seed=1, b=4)
    params, spec = bundle.variables["params"], bundle.module.spec
    eps = 0.02
    mc = np.asarray(crown_ibp_margin(params, spec, x, y, eps,
                                     bundle.mean, bundle.std))
    fwd = jax.jit(lambda xx: spec_forward(
        params, spec, normalize_batch(xx, bundle.mean, bundle.std)))
    worst = np.full(x.shape[0], np.inf)
    key = jax.random.PRNGKey(3)
    for _ in range(20):
        key, k = jax.random.split(key)
        xp = jnp.clip(
            x + jax.random.uniform(k, x.shape, minval=-eps, maxval=eps),
            0.0, 1.0)
        logits = np.asarray(fwd(xp))
        b = logits.shape[0]
        ly = logits[np.arange(b), np.asarray(y)]
        others = logits.copy()
        others[np.arange(b), np.asarray(y)] = -np.inf
        worst = np.minimum(worst, ly - others.max(-1))
    assert (mc <= worst + 1e-5).all(), "bound above an achievable margin"


def test_verified_implies_correct_and_verify_dict_contract():
    bundle, x, y = _setup(seed=2)
    params, spec = bundle.variables["params"], bundle.module.spec
    out = jax.device_get(jax.jit(make_crown_verify_fn(
        params, spec, bundle.mean, bundle.std))(x, y, 0.004))
    assert set(out) == {"verified", "correct", "margin"}
    v, c = np.asarray(out["verified"]), np.asarray(out["correct"])
    assert (~v | c).all()  # verified => correct (clean point in its ball)


@pytest.mark.slow
def test_crown_ibp_train_step_learns():
    """A few crown-ibp steps on a separable toy problem raise the
    verified margin (gradients flow through the backward bound)."""
    from image_recognition_adversarial_example_attack_tpu.train.adversarial import (
        AdvTrainConfig,
        make_ibp_step,
        train_state_from_bundle,
    )

    bundle, _, _ = _setup()
    rng = np.random.RandomState(0)
    x = jnp.asarray(np.clip(np.concatenate([
        0.25 + rng.uniform(-0.05, 0.05, (4, 32, 32, 3)),
        0.75 + rng.uniform(-0.05, 0.05, (4, 32, 32, 3))]), 0, 1
    ).astype(np.float32))
    y = jnp.asarray([0] * 4 + [1] * 4)
    config = AdvTrainConfig(eps=0.004, learning_rate=5e-3,
                            ibp_ramp_steps=10, ibp_bound="crown",
                            ibp_final_beta=0.5)
    state = train_state_from_bundle(_BundleLike(bundle), config)
    step = jax.jit(make_ibp_step(config, bundle.module.spec,
                                 ID_MEAN, ID_STD))
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(30):
        state, metrics = step(state, x, y, jax.random.fold_in(key, i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    m = np.asarray(crown_ibp_margin(state.params, bundle.module.spec,
                                    x, y, 0.004, ID_MEAN, ID_STD))
    assert (m > 0.0).mean() >= 0.5  # most of the toy batch certifies


class _BundleLike:
    def __init__(self, bundle):
        self.module = bundle.module
        self.variables = bundle.variables
        self.name = bundle.name


def test_unknown_ibp_bound_rejected():
    from image_recognition_adversarial_example_attack_tpu.train.adversarial import (
        AdvTrainConfig,
        make_ibp_step,
    )

    bundle, _, _ = _setup()
    with pytest.raises(ValueError, match="ibp_bound"):
        make_ibp_step(AdvTrainConfig(ibp_bound="zonotope"),
                      bundle.module.spec, ID_MEAN, ID_STD)


@pytest.mark.slow
def test_adversarial_train_cli_crown_ibp_objective(tmp_path, capsys):
    """--objective crown-ibp end-to-end, then the checkpoint certifies
    through certify --method crown-ibp."""
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

    out = tmp_path / "crown.msgpack"
    rc = train_main(["--data_dir", str(tmp_path / "data"),
                     "--model", "ibp_tiny", "--objective", "crown-ibp",
                     "--epochs", "8", "--batch_size", "12", "--lr", "5e-3",
                     "--eps", "0.008", "--ibp_ramp_steps", "4",
                     "--out", str(out)])
    assert rc == 0
    assert "verified_acc@0.008=" in capsys.readouterr().out
    res = tmp_path / "cert.json"
    rc = certify_main(["--method", "crown-ibp", "--model", "ibp_tiny",
                       "--weights", str(out),
                       "--image_dir", str(tmp_path / "data" / "class_a"),
                       "--eps_list", "0.008", "--output", str(res)])
    assert rc == 0
    assert json.loads(res.read_text())["method"] == "crown-ibp"


@pytest.mark.slow
def test_certify_cli_crown_ibp_method(tmp_path, capsys):
    from PIL import Image

    from image_recognition_adversarial_example_attack_tpu.cli.certify import (
        main,
    )

    rng = np.random.RandomState(0)
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(3):
        arr = (rng.uniform(0, 1, (32, 32, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"im{i}.png")

    payloads = {}
    for method in ("ibp", "crown-ibp"):
        out = tmp_path / f"{method}.json"
        rc = main(["--method", method, "--model", "ibp_tiny",
                   "--image_dir", str(d), "--eps_list", "0.004", "0.031",
                   "--output", str(out)])
        assert rc == 0
        payloads[method] = json.loads(out.read_text())
    assert payloads["crown-ibp"]["method"] == "crown-ibp"
    for s_ibp, s_crown in zip(payloads["ibp"]["sweeps"],
                              payloads["crown-ibp"]["sweeps"]):
        assert s_crown["eps"] == s_ibp["eps"]
        # never worse, per-image margins never smaller
        assert (s_crown["verified_accuracy"]
                >= s_ibp["verified_accuracy"] - 1e-9)
        for r_i, r_c in zip(s_ibp["results"], s_crown["results"]):
            assert r_c["margin"] >= r_i["margin"] - 1e-5
