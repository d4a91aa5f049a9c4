"""Persistent XLA compilation cache.

Each CLI process would otherwise recompile every program from scratch
(20-40s per program over the TPU tunnel).  Enabling JAX's persistent
compilation cache makes the second invocation of any CLI start in seconds.
Controlled by ``$ADV_TPU_COMPILE_CACHE`` (set to ``0``/``off`` to disable,
or to a directory to relocate it).
"""

from __future__ import annotations

import os
from pathlib import Path

import jax

_DEFAULT = Path.home() / ".cache" / "adv_tpu" / "jax_cache"


def enable_compilation_cache() -> None:
    """Opt-in: set $ADV_TPU_COMPILE_CACHE=1 (or a directory).

    Opt-in rather than default-on because this fleet's remote-compile
    service produces CPU AOT artifacts whose target machine features can
    mismatch the local host (XLA then warns about potential SIGILL).
    """
    setting = os.environ.get("ADV_TPU_COMPILE_CACHE", "")
    if not setting or setting.lower() in ("0", "off", "false"):
        return
    cache_dir = Path(setting) if setting.lower() not in ("1", "on", "true") else _DEFAULT
    try:
        cache_dir.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never fail a CLI over it
