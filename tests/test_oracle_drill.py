"""Oracle-harness drill (VERDICT r2 next #2): every weight-gated oracle
body in test_reference_oracles.py executes TODAY against synthesized
weights + expected values computed from that very model — and FAILS when
an expectation is perturbed.

No pretrained weights can exist in this container, so the real parity
tests stay skipped; this file proves their bodies are live code: the day
checkpoints land in ``weights/``, the parity suite is known-working
(no typo can hide in a permanently-dead test body).
"""

import copy
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from test_reference_oracles import (
    _load_oracle_bundle,
    _oracle_attack_trio,
    _oracle_clean_transcript,
    _oracle_defense_sweep,
    _oracle_transfer_table,
    _run_defense_sweep,
)


def _perturb(v: float) -> float:
    """Shift a rate by 0.5 AWAY from its nearest rail so the perturbed
    expectation always lands outside every oracle tolerance."""
    return v - 0.5 if v > 0.5 else v + 0.5

_SWEEP_ROWS = [{"attack": "fgsm", "eps": 8 / 255},
               {"attack": "pgd", "eps": 8 / 255}]
_DRILL_ZOO = {"Tiny": "tiny"}
_DRILL_ATTACKS = ("fgsm", "pgd")


@pytest.fixture(scope="module")
def drill(tmp_path_factory):
    """Synthesized 'reference': tiny-model weight files + drill images +
    an expected-values table computed from those weights through the same
    public APIs the oracles use."""
    from image_recognition_adversarial_example_attack_tpu.attacks import (
        make_logits_fn,
    )
    from image_recognition_adversarial_example_attack_tpu.attacks.api import (
        AttackParams,
        run_attack,
    )
    from image_recognition_adversarial_example_attack_tpu.attacks.fgsm import (
        fgsm_attack,
    )
    from image_recognition_adversarial_example_attack_tpu.attacks.pgd import (
        pgd_linf_attack,
    )
    from image_recognition_adversarial_example_attack_tpu.attacks.cw import (
        cw_l2_attack,
    )
    from image_recognition_adversarial_example_attack_tpu.core.images import (
        load_image,
        load_image_batch_tolerant,
    )
    from image_recognition_adversarial_example_attack_tpu.models.zoo import (
        load_model,
        save_variables,
    )

    root = tmp_path_factory.mktemp("drill")
    img_dir = root / "picture"
    img_dir.mkdir()
    rng = np.random.RandomState(3)
    names = ["example.jpg"] + [f"drill_{i}.jpg" for i in range(4)]
    for nm in names:
        arr = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / nm)

    # synthesize weight FILES so the oracle loading path (load_model with
    # an explicit weights file; bundle.source == "cache") is exercised
    wdir = root / "weights"
    weights_paths = {}
    for model_name in ("resnet_tiny", "tiny"):
        with pytest.warns(UserWarning):  # random init while synthesizing
            b = load_model(model_name)
        p = wdir / f"{model_name}.msgpack"
        save_variables(b.variables, p)
        weights_paths[model_name] = p

    def resolve(image_name):
        p = img_dir / image_name
        return p if p.is_file() else None

    # ---- expected values, computed from the synthesized model ----
    bundle = load_model("resnet_tiny", weights=weights_paths["resnet_tiny"])
    lf = make_logits_fn(bundle.module, bundle.variables, bundle.mean,
                        bundle.std)
    lf_jit = jax.jit(lf)

    def top1(xa):
        probs = np.asarray(jax.nn.softmax(lf_jit(xa), -1))[0]
        return int(probs.argmax()), float(probs.max())

    transcript = []
    for nm in names:
        c, p = top1(jnp.asarray(load_image(resolve(nm))))
        transcript.append({"image": nm, "top5": [{"class": c, "prob": p}]})

    x_ex = jnp.asarray(load_image(resolve("example.jpg")))
    y_ex = jnp.argmax(lf(x_ex), -1)
    eps = 8 / 255
    c_f, p_f = top1(jax.jit(lambda x, y: fgsm_attack(lf, x, y, eps=eps))(
        x_ex, y_ex))
    c_p, p_p = top1(jax.jit(
        lambda x, y, k: pgd_linf_attack(lf, x, y, eps=eps, alpha=2 / 255,
                                        steps=10, key=k)
    )(x_ex, y_ex, jax.random.PRNGKey(0)))
    c_c, _ = top1(jax.jit(
        lambda x, y: cw_l2_attack(lf, x, y, c=1.0, steps=5, lr=0.01)
    )(x_ex, y_ex).x_adv)
    attack_example = {"fgsm": [{"class": c_f, "prob": p_f}],
                      "pgd": [{"class": c_p, "prob": p_p}],
                      "cw": [{"class": c_c}]}

    paths = [resolve(nm) for nm in names]
    sweep_got = _run_defense_sweep(
        load_model("resnet_tiny", weights=weights_paths["resnet_tiny"]),
        identity_norm=False, rows=_SWEEP_ROWS, paths=paths)
    sweep_rows = [dict(row, **sweep_got[(row["attack"], row["eps"])])
                  for row in _SWEEP_ROWS]

    # transfer expectations: craft on resnet_tiny, evaluate on tiny with
    # the target's own clean labels (the oracle's convention)
    x_np, _ = load_image_batch_tolerant(paths)
    x_all = jnp.asarray(x_np)
    y_src = jax.jit(lambda x: jnp.argmax(lf(x), -1))(x_all)
    tgt = load_model("tiny", weights=weights_paths["tiny"])
    tgt_lf = make_logits_fn(tgt.module, tgt.variables, tgt.mean, tgt.std)
    tgt_jit = jax.jit(lambda x: jnp.argmax(tgt_lf(x), -1))
    y_tgt = tgt_jit(x_all)
    transfer_rows = {}
    for attack in _DRILL_ATTACKS:
        params = AttackParams(eps=eps, alpha=2 / 255, steps=10, cw_c=1.0,
                              cw_kappa=0.0, cw_steps=5, cw_lr=0.01)
        adv = run_attack(attack, lf, x_all, y_src, params,
                         key=jax.random.PRNGKey(0))
        transfer_rows[attack] = {"Tiny": float(np.mean(
            np.asarray(tgt_jit(adv) != y_tgt)))}

    data = {
        "clean_transcript": transcript,
        "attack_example": attack_example,
        "defense_sweep": {"standard": sweep_rows, "robust": sweep_rows},
        "transfer_asr": {"rows": transfer_rows},
    }
    # the table must survive a JSON round-trip exactly like the real one
    data = json.loads(json.dumps(data))
    return {"data": data, "resolve": resolve, "paths": paths,
            "weights": weights_paths}


@pytest.mark.slow
def test_clean_transcript_body_runs_and_catches(drill):
    _oracle_clean_transcript("resnet_tiny", drill["data"], drill["resolve"],
                             weights_path=drill["weights"]["resnet_tiny"],
                             max_mismatches=0)
    bad = copy.deepcopy(drill["data"])
    bad["clean_transcript"][0]["top5"][0]["class"] += 1
    with pytest.raises(AssertionError):
        _oracle_clean_transcript("resnet_tiny", bad, drill["resolve"],
                                 weights_path=drill["weights"]["resnet_tiny"],
                                 max_mismatches=0)


@pytest.mark.slow
def test_attack_trio_body_runs_and_catches(drill):
    kw = dict(weights_path=drill["weights"]["resnet_tiny"], cw_steps=5,
              pgd_min_prob=drill["data"]["attack_example"]["pgd"][0]["prob"]
              - 0.05)
    _oracle_attack_trio("resnet_tiny", drill["data"],
                        drill["resolve"]("example.jpg"), **kw)
    bad = copy.deepcopy(drill["data"])
    bad["attack_example"]["fgsm"][0]["class"] += 1
    with pytest.raises(AssertionError):
        _oracle_attack_trio("resnet_tiny", bad,
                            drill["resolve"]("example.jpg"), **kw)


@pytest.mark.slow
def test_defense_sweep_body_runs_and_catches(drill):
    rows = drill["data"]["defense_sweep"]["standard"]
    _oracle_defense_sweep("resnet_tiny", rows, drill["paths"],
                          weights_path=drill["weights"]["resnet_tiny"])
    bad = copy.deepcopy(rows)
    bad[0]["attack_success"] = _perturb(bad[0]["attack_success"])
    with pytest.raises(AssertionError):
        _oracle_defense_sweep("resnet_tiny", bad, drill["paths"],
                              weights_path=drill["weights"]["resnet_tiny"])


@pytest.mark.slow
def test_defense_sweep_robust_arm_body_runs(drill):
    """The robust-arm oracle path (identity normalization) is the same
    body; prove the identity_norm branch executes and discriminates."""
    rows = drill["data"]["defense_sweep"]["robust"]
    # identity normalization changes the rates => the standard-arm
    # expectations must NOT fit within the tight clean-pass atol OR the
    # run must pass with freshly-computed identity-norm expectations
    got = _run_defense_sweep(
        _load_oracle_bundle(
            "resnet_tiny", weights_path=drill["weights"]["resnet_tiny"]),
        identity_norm=True, rows=_SWEEP_ROWS, paths=drill["paths"])
    id_rows = [dict(row, **got[(row["attack"], row["eps"])])
               for row in _SWEEP_ROWS]
    _oracle_defense_sweep("resnet_tiny", id_rows, drill["paths"],
                          identity_norm=True,
                          weights_path=drill["weights"]["resnet_tiny"])
    bad = copy.deepcopy(id_rows)
    bad[0]["detector_adv_flag_rate"] = _perturb(bad[0]["detector_adv_flag_rate"])
    with pytest.raises(AssertionError):
        _oracle_defense_sweep("resnet_tiny", bad, drill["paths"],
                              identity_norm=True,
                              weights_path=drill["weights"]["resnet_tiny"])


@pytest.mark.slow
def test_transfer_table_body_runs_and_catches(drill):
    kw = dict(weights_paths={"resnet_tiny": drill["weights"]["resnet_tiny"],
                             "tiny": drill["weights"]["tiny"]},
              cw_steps=5, attacks=_DRILL_ATTACKS)
    _oracle_transfer_table("resnet_tiny", _DRILL_ZOO, drill["data"],
                           drill["paths"], **kw)
    bad = copy.deepcopy(drill["data"])
    first = _DRILL_ATTACKS[0]
    bad["transfer_asr"]["rows"][first]["Tiny"] = _perturb(
        bad["transfer_asr"]["rows"][first]["Tiny"])
    with pytest.raises(AssertionError):
        _oracle_transfer_table("resnet_tiny", _DRILL_ZOO, bad,
                               drill["paths"], **kw)
