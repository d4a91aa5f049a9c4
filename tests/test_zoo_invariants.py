"""Registry-enforced zoo invariants (VERDICT r4 #5).

One parametrized sweep over EVERY name in ``attacks.api.ATTACK_NAMES``
through ``run_attack`` on the tiny model.  Because the parametrization is
the registry itself (not a hand-maintained list), a 26th zoo member cannot
land in ``run_attack`` without (a) declaring its threat model at
registration and (b) passing shape / [0,1]-range / ball / determinism
invariants here — there is no list to forget to update.

Replaces nothing: tests/test_attacks.py keeps the per-attack math tests;
this is the uniform safety net (SURVEY.md §4 item 1, generalized).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_recognition_adversarial_example_attack_tpu.attacks import (
    ATTACK_NAMES,
    ATTACK_THREAT,
    AttackParams,
    run_attack,
)

EPS = 8 / 255

# Tiny budgets: the sweep checks invariants, not attack strength, so every
# iterative budget is cut to a few steps — the full sweep must stay in the
# fast test tier.
SWEEP_PARAMS = AttackParams(
    eps=EPS,
    alpha=2 / 255,
    steps=3,
    cw_steps=5,
    square_steps=8,
    deepfool_steps=3,
    deepfool_classes=4,
    est_samples=4,
    bandits_steps=6,
    bandits_prior_factor=4,
    hsja_steps=2,
    hsja_probes=4,
    n_target_classes=3,
    stadv_steps=4,
    boundary_steps=8,
    simba_steps=8,
    jsma_steps=5,
    spatial_candidates=3,
)


@pytest.fixture(scope="module")
def sweep_inputs(request):
    model_fx = request.getfixturevalue("tiny_model")
    from image_recognition_adversarial_example_attack_tpu.attacks import (
        make_logits_fn,
    )
    from image_recognition_adversarial_example_attack_tpu.core.constants import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )

    model, variables = model_fx
    logits_fn = make_logits_fn(model, variables, IMAGENET_MEAN, IMAGENET_STD)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.uniform(0.2, 0.8, size=(3, 16, 16, 3)).astype(np.float32))
    y = jnp.argmax(logits_fn(x), axis=-1)
    return logits_fn, x, y


def test_registry_is_the_dispatch_surface():
    # every registered name has a declared threat model and vice versa
    assert set(ATTACK_NAMES) == set(ATTACK_THREAT)
    assert len(ATTACK_NAMES) >= 25  # the r4 zoo; growth only
    assert set(ATTACK_THREAT.values()) <= {"linf", "l2", "l1", "l0", "none"}


def test_unknown_name_raises(sweep_inputs):
    logits_fn, x, y = sweep_inputs
    with pytest.raises(ValueError, match="unknown attack"):
        run_attack("definitely_not_an_attack", logits_fn, x, y, SWEEP_PARAMS)


@pytest.mark.parametrize("name", ATTACK_NAMES)
def test_zoo_member_invariants(name, sweep_inputs):
    logits_fn, x, y = sweep_inputs
    key = jax.random.PRNGKey(3)

    adv = run_attack(name, logits_fn, x, y, SWEEP_PARAMS, key)
    adv = np.asarray(adv, np.float32)
    x_np = np.asarray(x, np.float32)

    # shape + dtype-compatible output
    assert adv.shape == x_np.shape, f"{name}: shape changed"
    assert np.all(np.isfinite(adv)), f"{name}: non-finite pixels"

    # pixel range
    assert adv.min() >= -1e-6 and adv.max() <= 1 + 1e-6, (
        f"{name}: output outside [0,1] ({adv.min()}, {adv.max()})")

    # declared threat-model ball
    delta = adv - x_np
    threat = ATTACK_THREAT[name]
    if threat == "linf":
        linf = np.max(np.abs(delta))
        assert linf <= EPS + 1e-5, f"{name}: Linf {linf} > eps {EPS}"
    elif threat == "l2":
        l2 = np.sqrt(np.sum(delta.reshape(len(delta), -1) ** 2, axis=1))
        assert np.all(l2 <= EPS + 1e-4), f"{name}: L2 {l2.max()} > eps {EPS}"
    elif threat == "l1":
        l1 = np.sum(np.abs(delta.reshape(len(delta), -1)), axis=1)
        assert np.all(l1 <= EPS + 1e-4), f"{name}: L1 {l1.max()} > eps {EPS}"
    elif threat == "l0":
        changed = np.sum(np.any(delta.reshape(len(delta), -1, 3) != 0, axis=-1),
                         axis=-1)
        # jsma flips at most `steps` saliency-selected coordinates
        assert np.all(changed <= SWEEP_PARAMS.jsma_steps * 2), (
            f"{name}: L0 {changed.max()} > budget")

    # same key -> bitwise-identical output
    adv2 = np.asarray(
        run_attack(name, logits_fn, x, y, SWEEP_PARAMS, key), np.float32)
    np.testing.assert_array_equal(adv, adv2, err_msg=f"{name}: nondeterministic")
