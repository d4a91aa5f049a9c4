"""The attack -> defend -> detect evaluation unit, batched and jitted.

Reference semantics (defense_experiments.py:579-646), per sample:
  clean pred -> attack -> adv pred (attack_success = pred_adv != y_true)
  -> preprocessing defense -> defended pred (recovery = pred_def == y_true)
  -> detector on adv & clean -> bypass = attack_success AND not flagged.

TPU design: the reference runs this per image from Python at batch size 1
(hot loop defense_experiments.py:816-832).  Here the entire unit — attack
loop included — is ONE jitted XLA program over a sharded [B,H,W,C] batch;
each (attack, eps) grid cell is a separate compiled call (static config),
and per-cell counters come out already summed so a multi-chip mesh reduces
them with an XLA psum instead of host arithmetic.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..attacks.api import AttackParams, LogitsFn, run_attack
from ..defenses.detector import FeaturesFn, score_from_features
from ..defenses.preprocess import DefenseConfig, defend_input
from ..core.constants import DEFAULT_CW_KAPPA

STAT_KEYS = (
    "clean_correct",
    "attack_success",
    "defense_preproc_success",
    "detector_flags_clean",
    "detector_flags_adv",
    "detector_attack_success",
)


@dataclass(frozen=True)
class DefenseEvalConfig:
    """Static (compile-time) configuration of one grid cell."""

    attack_name: str
    eps: float
    alpha: float
    steps: int
    cw_c: float = 1.0
    cw_kappa: float = DEFAULT_CW_KAPPA
    cw_steps: int = 100
    cw_lr: float = 0.01
    square_steps: int = 1000
    deepfool_steps: int = 50
    deepfool_classes: int = 10
    deepfool_overshoot: float = 0.02
    est_samples: int = 32
    nes_sigma: float = 1e-3
    spsa_delta: float = 1e-2
    bandits_steps: int = 500
    bandits_prior_factor: int = 8
    bandits_fd_eta: float = 0.1
    bandits_delta: float = 0.1
    bandits_prior_lr: float = 1.0
    hsja_steps: int = 10
    hsja_probes: int = 32
    ead_beta: float = 1e-3
    ead_c: float = 50.0
    ead_lr: float = 0.05
    stadv_steps: int = 200
    stadv_lr: float = 0.01
    stadv_tau: float = 0.05
    boundary_steps: int = 500
    boundary_spherical_step: float = 0.01
    boundary_source_step: float = 0.01
    simba_steps: int = 1000
    simba_eps: float = 0.2
    simba_mode: str = "dct"
    jsma_steps: int = 100
    jsma_theta: float = 1.0
    l1_sparsity: float = 0.01
    spatial_max_rot: float = 30.0
    spatial_max_trans: float = 0.1
    spatial_candidates: int = 10
    spatial_grid_rot: int = 0
    spatial_grid_trans: int = 0
    # 'feature' = reference stage-3 statistics detector; 'squeezing' =
    # feature-squeezing prediction-inconsistency; 'mahalanobis' =
    # min class-conditional Mahalanobis distance (both beyond-reference)
    detector: str = "feature"
    # fitted state for parametric detectors (MahalanobisParams); arrays,
    # so excluded from dataclass comparison — the closure captures them
    # as program constants
    detector_params: Any = field(default=None, compare=False)
    defense: DefenseConfig = DefenseConfig()
    # adaptive = the attacker differentiates THROUGH the deployed pipeline
    # (defend_input + model) instead of the raw model — the evaluation
    # standard for preprocessing defenses (Athalye et al. 2018); the
    # defense chain is STE-differentiable end to end (defenses/preprocess)
    adaptive: bool = False
    # detector_aware = the attacker ALSO knows the detector: the attack
    # becomes sign-gradient ascent on CE - lam*relu(score - margin*tau)
    # (Carlini & Wagner, AISec 2017) — the standard of evidence for
    # detector bypass rates.  Gradient attacks only (fgsm/pgd cells).
    detector_aware: bool = False
    detector_lam: float = 1.0
    detector_margin: float = 0.9

    def attack_params(self) -> AttackParams:
        return AttackParams(
            eps=self.eps,
            alpha=self.alpha,
            steps=self.steps,
            cw_c=self.cw_c,
            cw_kappa=self.cw_kappa,
            cw_steps=self.cw_steps,
            cw_lr=self.cw_lr,
            square_steps=self.square_steps,
            deepfool_steps=self.deepfool_steps,
            deepfool_classes=self.deepfool_classes,
            deepfool_overshoot=self.deepfool_overshoot,
            est_samples=self.est_samples,
            nes_sigma=self.nes_sigma,
            spsa_delta=self.spsa_delta,
            bandits_steps=self.bandits_steps,
            bandits_prior_factor=self.bandits_prior_factor,
            bandits_fd_eta=self.bandits_fd_eta,
            bandits_delta=self.bandits_delta,
            bandits_prior_lr=self.bandits_prior_lr,
            hsja_steps=self.hsja_steps,
            hsja_probes=self.hsja_probes,
            ead_beta=self.ead_beta,
            ead_c=self.ead_c,
            ead_lr=self.ead_lr,
            stadv_steps=self.stadv_steps,
            stadv_lr=self.stadv_lr,
            stadv_tau=self.stadv_tau,
            boundary_steps=self.boundary_steps,
            boundary_spherical_step=self.boundary_spherical_step,
            boundary_source_step=self.boundary_source_step,
            simba_steps=self.simba_steps,
            simba_eps=self.simba_eps,
            simba_mode=self.simba_mode,
            jsma_steps=self.jsma_steps,
            jsma_theta=self.jsma_theta,
            l1_sparsity=self.l1_sparsity,
            spatial_max_rot=self.spatial_max_rot,
            spatial_max_trans=self.spatial_max_trans,
            spatial_candidates=self.spatial_candidates,
            spatial_grid_rot=self.spatial_grid_rot,
            spatial_grid_trans=self.spatial_grid_trans,
        )


def make_detector_score_fn(logits_fn: LogitsFn, features_fn: FeaturesFn,
                           config: "DefenseEvalConfig"):
    """x -> [B] detector score, per config.detector ('feature'|'squeezing')."""
    if config.detector == "squeezing":
        from ..defenses.detector import squeezing_score

        return lambda xx: squeezing_score(
            logits_fn, xx, config.defense.quant_levels)
    if config.detector == "mahalanobis":
        from ..defenses.mahalanobis import mahalanobis_score

        if config.detector_params is None:
            raise ValueError(
                "detector='mahalanobis' needs fitted detector_params "
                "(defenses.mahalanobis.calibrate_mahalanobis)")
        return lambda xx: mahalanobis_score(
            features_fn, xx, config.detector_params)
    if config.detector != "feature":
        raise ValueError(f"unknown detector '{config.detector}'")
    return lambda xx: score_from_features(features_fn(xx))


def evaluate_defenses_batch(
    logits_fn: LogitsFn,
    features_fn: FeaturesFn,
    x: jnp.ndarray,
    y_true: jnp.ndarray,
    detector_threshold: jnp.ndarray | float,
    config: DefenseEvalConfig,
    key: jax.Array,
    eps_override: jnp.ndarray | None = None,
) -> dict[str, jnp.ndarray]:
    """Returns per-sample int32 vectors for the six reference counters,
    plus the adversarial batch under key ``"x_adv"``.

    Fully traceable: wrap in jit with ``config`` static (see
    ``make_defense_eval_fn``).  ``eps_override`` may be a TRACED scalar —
    eps only enters the attack arithmetic (step size bounds, ball
    projection, random-start range), never a shape or loop count, so one
    compiled program serves a whole eps sweep (see the dynamic_eps factories).
    """
    threshold = jnp.asarray(detector_threshold, jnp.float32)

    params = config.attack_params()
    if eps_override is not None:
        from dataclasses import replace as _dc_replace

        params = _dc_replace(params, eps=eps_override)

    logits_clean = logits_fn(x)
    pred_clean = jnp.argmax(logits_clean, axis=-1)
    clean_correct = (pred_clean == y_true).astype(jnp.int32)

    if config.adaptive:
        # attack the deployed pipeline: gradients flow through the
        # (STE-differentiable) defense chain into the model
        def attack_target_fn(xx):
            return logits_fn(defend_input(xx, config.defense))
    else:
        attack_target_fn = logits_fn

    if config.detector_aware:
        # joint classifier+detector objective (Carlini & Wagner 2017);
        # needs gradients of the attack loss, so only the gradient cells
        # of the reference grid support it
        if config.attack_name not in ("fgsm", "pgd"):
            raise ValueError(
                "detector_aware evaluation needs a gradient attack with a "
                f"CE objective (fgsm|pgd), got '{config.attack_name}'")
        from ..attacks.detector_aware import (detector_aware_fgsm,
                                              detector_aware_pgd)

        aware_score_fn = make_detector_score_fn(logits_fn, features_fn, config)
        if config.attack_name == "fgsm":
            x_adv = detector_aware_fgsm(
                attack_target_fn, aware_score_fn, x, y_true,
                eps=params.eps, threshold=threshold,
                lam=config.detector_lam, margin=config.detector_margin)
        else:
            x_adv = detector_aware_pgd(
                attack_target_fn, aware_score_fn, x, y_true,
                eps=params.eps, alpha=params.alpha, steps=params.steps,
                key=key, threshold=threshold,
                lam=config.detector_lam, margin=config.detector_margin)
    else:
        x_adv = run_attack(config.attack_name, attack_target_fn, x, y_true,
                           params, key)

    pred_adv = jnp.argmax(logits_fn(x_adv), axis=-1)
    attack_success = (pred_adv != y_true).astype(jnp.int32)

    x_def = defend_input(x_adv, config.defense)
    pred_def = jnp.argmax(logits_fn(x_def), axis=-1)
    defense_preproc_success = (pred_def == y_true).astype(jnp.int32)

    score_fn = make_detector_score_fn(logits_fn, features_fn, config)
    score_adv = score_fn(x_adv)
    score_clean = score_fn(x)
    detector_flags_adv = (score_adv > threshold).astype(jnp.int32)
    detector_flags_clean = (score_clean > threshold).astype(jnp.int32)

    detector_attack_success = attack_success * (1 - detector_flags_adv)

    return {
        "clean_correct": clean_correct,
        "attack_success": attack_success,
        "defense_preproc_success": defense_preproc_success,
        "detector_flags_clean": detector_flags_clean,
        "detector_flags_adv": detector_flags_adv,
        "detector_attack_success": detector_attack_success,
        "x_adv": x_adv,
    }


def make_defense_eval_fn(logits_fn: LogitsFn, features_fn: FeaturesFn, config: DefenseEvalConfig):
    """jit-compiled closure over static config; donates nothing."""

    @partial(jax.jit, static_argnames=())
    def fn(x, y_true, threshold, key):
        return evaluate_defenses_batch(logits_fn, features_fn, x, y_true, threshold, config, key)

    return fn


def make_defense_eval_fn_dynamic_eps(
    logits_fn: LogitsFn, features_fn: FeaturesFn, config: DefenseEvalConfig
):
    """Like ``make_defense_eval_fn`` but eps is a RUNTIME scalar:
    ``fn(x, y_true, threshold, key, eps)``.

    One compiled XLA program serves every eps in a sweep — remote TPU
    compiles at 20s-4min per program dominate a grid run's wall clock, so
    an (attacks x eps_list) grid drops from ``len(attacks)*len(eps_list)``
    compiles to ``len(attacks)``.  ``config.eps`` is ignored; numerics are
    identical to the static-eps program (eps participates only in
    arithmetic, and a jnp.float32 scalar promotes exactly like the python
    float the static version closes over).
    """

    @partial(jax.jit, static_argnames=())
    def fn(x, y_true, threshold, key, eps):
        return evaluate_defenses_batch(
            logits_fn, features_fn, x, y_true, threshold, config, key,
            eps_override=jnp.asarray(eps, jnp.float32),
        )

    return fn


def make_defense_eval_fn_split_jpeg(
    logits_fn: LogitsFn, features_fn: FeaturesFn, config: DefenseEvalConfig
):
    """JPEG-bearing cell that KEEPS the data mesh.

    XLA host callbacks abort inside SPMD-sharded programs, so the fused
    ``io_callback`` path (defenses/jpeg.py) forces JPEG cells onto one
    device.  This variant instead splits the cell into two sharded programs
    around one explicit host stage:

      program A (sharded): clean pred + attack loop + adv pred + detector
                           + pre-JPEG defenses (clip -> smooth -> quantize)
      host:                gather -> PIL JPEG round-trip -> re-scatter
      program B (sharded): defended prediction

    The codec bytes cross the host either way; everything compute-heavy
    (the attack's fwd+bwd loop, four model forwards, the detector) stays on
    the mesh.  Numerics are identical to the fused path — the same ops in
    the same order (the pre-JPEG clip is idempotent on [0,1] data).
    """
    import numpy as np

    from ..defenses.jpeg import jpeg_roundtrip_host
    from dataclasses import replace as _replace

    if config.adaptive:
        raise ValueError(
            "adaptive evaluation needs the defense INSIDE the attack loop, "
            "so the host JPEG codec cannot be split out of the sharded "
            "program — use --jpeg_mode dct (device-side codec) for "
            "adaptive JPEG cells on a mesh")
    pre_defense = _replace(config.defense, use_jpeg=False)

    @jax.jit
    def stage_attack(x, y_true, threshold, key, eps):
        threshold = jnp.asarray(threshold, jnp.float32)
        params = config.attack_params()
        if eps is not None:  # traced eps: one compile per attack (see
            from dataclasses import replace as _dc_replace  # dynamic_eps factory)

            params = _dc_replace(params, eps=jnp.asarray(eps, jnp.float32))
        pred_clean = jnp.argmax(logits_fn(x), axis=-1)
        clean_correct = (pred_clean == y_true).astype(jnp.int32)

        if config.detector_aware:
            # the detector tap never touches the JPEG stage, so the
            # detector-aware objective stays fully on the mesh
            if config.attack_name not in ("fgsm", "pgd"):
                raise ValueError(
                    "detector_aware evaluation needs a gradient attack "
                    f"(fgsm|pgd), got '{config.attack_name}'")
            from ..attacks.detector_aware import (detector_aware_fgsm,
                                                  detector_aware_pgd)

            aware_score_fn = make_detector_score_fn(
                logits_fn, features_fn, config)
            if config.attack_name == "fgsm":
                x_adv = detector_aware_fgsm(
                    logits_fn, aware_score_fn, x, y_true,
                    eps=params.eps, threshold=threshold,
                    lam=config.detector_lam, margin=config.detector_margin)
            else:
                x_adv = detector_aware_pgd(
                    logits_fn, aware_score_fn, x, y_true,
                    eps=params.eps, alpha=params.alpha, steps=params.steps,
                    key=key, threshold=threshold,
                    lam=config.detector_lam, margin=config.detector_margin)
        else:
            x_adv = run_attack(config.attack_name, logits_fn, x, y_true,
                               params, key)
        pred_adv = jnp.argmax(logits_fn(x_adv), axis=-1)
        attack_success = (pred_adv != y_true).astype(jnp.int32)

        x_pre = defend_input(x_adv, pre_defense)  # everything but JPEG

        score_fn = make_detector_score_fn(logits_fn, features_fn, config)
        score_adv = score_fn(x_adv)
        score_clean = score_fn(x)
        detector_flags_adv = (score_adv > threshold).astype(jnp.int32)
        detector_flags_clean = (score_clean > threshold).astype(jnp.int32)
        out = {
            "clean_correct": clean_correct,
            "attack_success": attack_success,
            "detector_flags_clean": detector_flags_clean,
            "detector_flags_adv": detector_flags_adv,
            "detector_attack_success": attack_success * (1 - detector_flags_adv),
            "x_adv": x_adv,
        }
        return out, x_pre

    @jax.jit
    def stage_defended(x_def, y_true):
        pred_def = jnp.argmax(logits_fn(jnp.clip(x_def, 0.0, 1.0)), axis=-1)
        return (pred_def == y_true).astype(jnp.int32)

    def fn(x, y_true, threshold, key, eps=None):
        out, x_pre = stage_attack(x, y_true, threshold, key, eps)
        sharding = x_pre.sharding  # re-scatter target (mesh or single device)
        x_host = np.asarray(jax.device_get(x_pre), np.float32)
        x_jpeg = jpeg_roundtrip_host(x_host, np.int32(config.defense.jpeg_quality))
        x_def = jax.device_put(x_jpeg, sharding)
        out = dict(out)
        out["defense_preproc_success"] = stage_defended(x_def, y_true)
        return out

    return fn


@partial(jax.jit, static_argnames=("n_valid",))
def _sum_counters(vecs: dict, n_valid: int) -> dict:
    return {k: jnp.sum(v[:n_valid]) for k, v in vecs.items()}


def aggregate_stats(per_sample: dict[str, Any], n_valid: int | None = None) -> dict[str, int]:
    """Per-sample vectors -> summed counters (+ count), host-side ints.

    ``n_valid`` trims sharding padding (see core.images.pad_batch).  The six
    reductions run as ONE jitted program with ONE host transfer — eager
    per-key slicing would cost a device round-trip per op (expensive on
    remote-attached TPUs).
    """
    vecs = {k: jnp.asarray(per_sample[k]) for k in STAT_KEYS}
    count = int(n_valid) if n_valid is not None else int(vecs[STAT_KEYS[0]].shape[0])
    summed = jax.device_get(_sum_counters(vecs, count))
    out = {k: int(v) for k, v in summed.items()}
    out["count"] = count
    return out


def summary_line(attack_name: str, eps: float, stats: dict[str, int]) -> str:
    """EXACT reference console format (defense_experiments.py:843-850 —
    README.md:48-55 shows the same lines as expected output)."""
    count = max(1, stats["count"])
    return (
        f"attack={attack_name}, eps={eps:.5f}, "
        f"attack_success={stats['attack_success'] / count:.3f}, "
        f"preproc_defense_acc={stats['defense_preproc_success'] / count:.3f}, "
        f"detector_clean_pass_rate={1.0 - stats['detector_flags_clean'] / count:.3f}, "
        f"detector_adv_flag_rate={stats['detector_flags_adv'] / count:.3f}, "
        f"detector_attack_success={stats['detector_attack_success'] / count:.3f}"
    )
