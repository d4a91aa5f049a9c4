"""Deterministic PRNG threading.

The reference's PGD random start is unseeded (attack.py:51,
``torch.empty_like().uniform_``).  Here every source of randomness is an
explicit ``jax.random.PRNGKey`` so runs are reproducible; the CLI exposes a
``--seed`` flag that feeds this module.
"""

from __future__ import annotations

import jax


def key_from_seed(seed: int | None) -> jax.Array:
    """Root key; seed=None picks the documented default 0."""
    return jax.random.PRNGKey(0 if seed is None else int(seed))


def split_for(key: jax.Array, n: int) -> list[jax.Array]:
    return list(jax.random.split(key, n))
