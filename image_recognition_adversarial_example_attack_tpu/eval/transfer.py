"""Black-box transferability evaluation, batched.

Two success conventions exist in the reference and both are preserved:

- "blackbox" (blackbox_transfer.py:244-251): a transfer succeeds when the
  target model's label on the adversarial image differs from the target's
  OWN clean label.
- "source-label" (transferability_attack.py:110-120): success when the
  target's adversarial label differs from the SOURCE model's clean
  pseudo-label.

TPU design: adversarial examples are generated once per (attack, eps) as a
single compiled program on the source model; each target evaluation is one
batched jitted forward.  All models' variables live on the mesh (replicated
by default) so the per-image loop of the reference disappears.
"""

from __future__ import annotations

from typing import Mapping, NamedTuple

import jax
import jax.numpy as jnp

from ..attacks.api import AttackParams, LogitsFn, run_attack


class TransferCell(NamedTuple):
    """Result for one (attack, eps) cell of a transfer sweep.

    A NamedTuple of arrays so it is a valid jit output pytree.
    """

    source_success: jnp.ndarray  # [B] int32: source pred_adv != y_source_clean
    target_success: dict[str, jnp.ndarray]  # name -> [B] int32
    x_adv: jnp.ndarray


def transfer_attack_batch(
    source_logits_fn: LogitsFn,
    target_logits_fns: Mapping[str, LogitsFn],
    x: jnp.ndarray,
    attack_name: str,
    params: AttackParams,
    key: jax.Array,
    convention: str = "source-label",
) -> TransferCell:
    """One grid cell: generate on source, evaluate all targets.

    ``convention``: "source-label" or "blackbox" (see module docstring).
    """
    if convention not in ("source-label", "blackbox"):
        raise ValueError(f"unknown transfer convention '{convention}'")

    y_source = jnp.argmax(source_logits_fn(x), axis=-1)
    x_adv = run_attack(attack_name, source_logits_fn, x, y_source, params, key)
    pred_src_adv = jnp.argmax(source_logits_fn(x_adv), axis=-1)
    source_success = (pred_src_adv != y_source).astype(jnp.int32)

    target_success: dict[str, jnp.ndarray] = {}
    for name, tfn in target_logits_fns.items():
        pred_adv = jnp.argmax(tfn(x_adv), axis=-1)
        if convention == "blackbox":
            ref_label = jnp.argmax(tfn(x), axis=-1)  # target's own clean label
        else:
            ref_label = y_source
        target_success[name] = (pred_adv != ref_label).astype(jnp.int32)

    return TransferCell(
        source_success=source_success,
        target_success=target_success,
        x_adv=x_adv,
    )


def asr(success_vec, n_valid: int | None = None) -> float:
    """Attack-success rate in [0,1] from an int success vector."""
    v = jnp.asarray(success_vec)
    if n_valid is not None:
        v = v[:n_valid]
    n = v.shape[0]
    return float(jnp.sum(v)) / max(1, n)
