"""Drift guard for the per-cell resume fingerprint's knob map.

``cli.common.ATTACK_KNOB_ARGS`` hand-mirrors which CLI knobs each attack's
compiled program reads (it scopes ``--resume`` fingerprints per grid cell).
A silent mismatch is exactly the stale-resume bug the fingerprint exists to
prevent, so this test derives the ground truth from the programs themselves:
for every (attack, knob) pair it traces ``run_attack`` twice — base knobs vs
one perturbed knob — and asserts the jaxprs differ iff the map says the
attack reads that knob.  Tracing only (no execution): tiny shapes, CPU.
"""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from image_recognition_adversarial_example_attack_tpu.attacks.api import (
    AttackParams,
    run_attack,
)
from image_recognition_adversarial_example_attack_tpu.cli.common import (
    ATTACK_KNOB_ARGS,
    _ALL_KNOB_ARGS,
)

N_CLASSES = 16

# small budgets so each trace is fast; every value differs from its
# perturbation below
BASE = AttackParams(
    eps=0.05, alpha=0.01, steps=2,
    cw_c=1.0, cw_kappa=0.0, cw_steps=2, cw_lr=0.01,
    mu=1.0, square_steps=4,
    deepfool_steps=2, deepfool_classes=4, deepfool_overshoot=0.02,
    est_samples=2, nes_sigma=1e-3, spsa_delta=1e-2,
    bandits_steps=2, bandits_prior_factor=4, bandits_fd_eta=0.1,
    bandits_delta=0.1, bandits_prior_lr=1.0,
    hsja_steps=2, hsja_probes=2,
    ead_beta=1e-3, ead_c=50.0, ead_lr=0.05,
    n_target_classes=3,
    stadv_steps=2, stadv_lr=0.01, stadv_tau=0.05,
    boundary_steps=2, boundary_spherical_step=0.01, boundary_source_step=0.01,
    simba_steps=2, simba_eps=0.2, simba_mode="dct",
    jsma_steps=2, jsma_theta=1.0, l1_sparsity=0.01,
    spatial_max_rot=30.0, spatial_max_trans=0.1, spatial_candidates=2,
    spatial_grid_rot=2, spatial_grid_trans=2,
)

# one valid perturbed value per CLI knob (ints stay in-range for N_CLASSES)
PERTURB = {
    "steps": 3, "alpha": 0.02, "mu": 0.9,
    "cw_c": 2.0, "cw_kappa": 0.5, "cw_steps": 3, "cw_lr": 0.02,
    "square_steps": 6,
    "deepfool_steps": 3, "deepfool_classes": 5, "deepfool_overshoot": 0.04,
    "est_samples": 4, "nes_sigma": 2e-3, "spsa_delta": 2e-2,
    "bandits_steps": 3, "bandits_prior_factor": 2, "bandits_fd_eta": 0.2,
    "bandits_delta": 0.2, "bandits_prior_lr": 0.5,
    "hsja_steps": 3, "hsja_probes": 4,
    "ead_beta": 2e-3, "ead_c": 25.0, "ead_lr": 0.1,
    "n_target_classes": 4,
    "stadv_steps": 3, "stadv_lr": 0.02, "stadv_tau": 0.1,
    "boundary_steps": 3, "boundary_spherical_step": 0.02,
    "boundary_source_step": 0.02,
    "simba_steps": 3, "simba_eps": 0.3, "simba_mode": "pixel",
    "jsma_steps": 3, "jsma_theta": 0.5, "l1_sparsity": 0.02,
    "spatial_max_rot": 20.0, "spatial_max_trans": 0.2,
    "spatial_candidates": 3, "spatial_grid_rot": 3, "spatial_grid_trans": 3,
}


def _logits_fn(x01):
    # deterministic tiny linear head: [B,8,8,3] -> [B,16]
    flat = x01.reshape(x01.shape[0], -1)
    w = jnp.sin(jnp.arange(flat.shape[1] * N_CLASSES, dtype=jnp.float32)
                ).reshape(flat.shape[1], N_CLASSES) * 0.1
    return flat @ w


def _jaxpr(attack_name: str, params: AttackParams) -> str:
    x = jnp.linspace(0.2, 0.8, 2 * 8 * 8 * 3, dtype=jnp.float32
                     ).reshape(2, 8, 8, 3)
    y = jnp.array([1, 3], dtype=jnp.int32)

    def prog(x, y):
        return run_attack(attack_name, _logits_fn, x, y, params,
                          key=jax.random.PRNGKey(0))

    return str(jax.make_jaxpr(prog)(x, y))


def test_perturbation_table_covers_every_knob():
    assert set(PERTURB) == set(_ALL_KNOB_ARGS)
    for knob, value in PERTURB.items():
        assert value != getattr(BASE, knob), knob


@pytest.mark.parametrize("attack_name", sorted(ATTACK_KNOB_ARGS))
def test_knob_map_matches_traced_program(attack_name):
    base = _jaxpr(attack_name, BASE)
    declared = ATTACK_KNOB_ARGS[attack_name]
    for knob in sorted(_ALL_KNOB_ARGS):
        perturbed = _jaxpr(
            attack_name,
            dataclasses.replace(BASE, **{knob: PERTURB[knob]}))
        reads_it = perturbed != base
        if knob in declared:
            assert reads_it, (
                f"{attack_name} is declared to read --{knob} but perturbing "
                f"it left the traced program identical — drop it from "
                f"ATTACK_KNOB_ARGS[{attack_name!r}] (it needlessly blocks "
                f"resume)")
        else:
            assert not reads_it, (
                f"{attack_name}'s program CHANGED when --{knob} was "
                f"perturbed but ATTACK_KNOB_ARGS[{attack_name!r}] omits it "
                f"— --resume would silently reuse stale cells; add it to "
                f"the map")
