"""Compiled-HLO introspection: count the collectives XLA actually emitted.

Scaling claims in this repo ("the data-parallel attack has zero per-step
collectives, so throughput is 517 x N" — benchmarks/ROOFLINE.md) are
load-bearing only if the COMPILED program agrees, not just the source
structure.  ``count_collectives`` greps a compiled module's HLO text for
every cross-device op GSPMD can insert; tests/test_sharding.py wires it
into the fast tier so a regression that introduces per-step communication
fails CI, and benchmarks/tp_qkv_probe.py uses it to report the TP layout's
collective mix.  (GSPMD partitioning is platform-independent, so counts
measured on the virtual CPU mesh hold for the TPU slice.)
"""

from __future__ import annotations

import re

# every collective HLO op GSPMD/SPMD-partitioner can emit, including the
# -start/-done async pairs (counted once via the -start form) and the
# fused all-reduce-scatter variants.  The shape token before the op name
# may be a TUPLE — `(f32[1]{0}, f32[1]{0}) all-reduce(...)` is what a
# variadic (multi-operand) reduction compiles to, exactly the form GSPMD
# emits for fused gradient reductions — so it must match `(...)` as well
# as a scalar/array shape (tuple shapes contain no nested parens; layouts
# use braces).
_COLL_RE = re.compile(
    r"=\s*(?:\([^)]*\)|\S+)\s+(all-gather|all-reduce|all-to-all|"
    r"collective-permute|reduce-scatter|collective-broadcast)"
    r"(?:-start)?\(",
    re.I,
)


def count_collectives(hlo_text: str) -> dict[str, int]:
    """kind -> count of collective ops in an HLO module's text
    (``jit(f).lower(...).compile().as_text()``).  ``-done`` halves of async
    pairs are not double-counted (only ``-start`` matches)."""
    counts: dict[str, int] = {}
    for kind in _COLL_RE.findall(hlo_text):
        k = kind.lower()
        counts[k] = counts.get(k, 0) + 1
    return counts


def compiled_collectives(jitted, *args, **kwargs) -> dict[str, int]:
    """Lower + compile a jitted callable on example args and count the
    collectives in every compiled module (main + wrapped subcomputations
    share one text dump)."""
    compiled = jitted.lower(*args, **kwargs).compile()
    return count_collectives(compiled.as_text())
