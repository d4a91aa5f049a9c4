"""Dataset-scale streaming evaluation: constant-memory grid sweeps.

The one-batch evaluation path (eval/engine.py) holds the whole image set
as ONE device-resident batch — the right call at reference scale (tens of
images), impossible at dataset scale (ImageNet-val: 50k x 224^2 x 3 f32
~ 30 GB).  This module is the replacement for the reference's per-image
evaluation loop (/root/reference/defense_experiments.py:804-832) at
scales the reference never reached (VERDICT r2, next #1):

- fixed-shape chunks come from ``utils.pipeline.EvalBatchPipeline``
  (background decode overlaps the device step; bounded queue = constant
  host memory);
- every chunk runs through the SAME one compiled cell program the
  one-batch path uses (dynamic-eps or split-JPEG factory from
  eval/defense_eval.py) — chunking changes memory, never numerics;
- only the per-sample counter vectors come back to the host (never
  ``x_adv``), are masked to the chunk's valid prefix, and accumulate into
  the same six reference counters.  On a multi-chip mesh the chunk is
  placed with the data sharding, so the counter reduction rides XLA
  collectives exactly as in the one-batch path.

For deterministic attacks the streamed counters are IDENTICAL to the
one-batch path; randomized attacks (PGD random start, APGD, Square) draw
per-chunk keys via ``fold_in(key, step)`` — same distribution, different
stream than a single whole-batch draw (statistical, not bitwise,
equivalence; the same caveat as the reference's unseeded random start,
SURVEY.md §7 "PGD randomness").
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pipeline import EvalBatchPipeline
from .defense_eval import STAT_KEYS


def round_up(n: int, multiple: int) -> int:
    """Smallest multiple of ``multiple`` that is >= n."""
    multiple = max(1, int(multiple))
    return -(-int(n) // multiple) * multiple


def make_placer(mesh=None) -> Callable[[np.ndarray], jax.Array]:
    """host chunk -> device (data-sharded over the mesh when given)."""
    if mesh is None:
        return jnp.asarray
    from ..parallel.mesh import data_sharding

    sharding = data_sharding(mesh)
    return lambda x_np: jax.device_put(jnp.asarray(x_np), sharding)


def stream_defense_cell(
    eval_fn,
    paths: Sequence,
    threshold,
    key: jax.Array,
    eps: float,
    *,
    chunk_size: int,
    size: int = 224,
    pseudo_label_fn=None,
    labels: Sequence[int] | None = None,
    place: Callable[[np.ndarray], jax.Array] | None = None,
    progress: Callable[[int, int], None] | None = None,
) -> dict[str, int]:
    """One (attack, eps) defense grid cell over arbitrarily many images.

    ``eval_fn(x, y, threshold, key, eps) -> {counter: [B] int32, ...}`` is
    the compiled cell program (dynamic-eps or split-JPEG).  Labels default
    to per-chunk pseudo-labels from ``pseudo_label_fn`` (the model's own
    clean predictions — reference :818-819 semantics); ``labels`` entries
    of ``-1`` mean "unlabeled — use the pseudo-label" (the resolve_labels
    partial-file convention).  Returns the six summed counters plus
    ``count``.
    """
    if labels is None and pseudo_label_fn is None:
        raise ValueError("need labels or pseudo_label_fn")
    if (pseudo_label_fn is None and labels is not None
            and np.any(np.asarray(labels) < 0)):
        raise ValueError(
            "labels contain the UNLABELED (-1) sentinel but no "
            "pseudo_label_fn was given to substitute for them")
    place = place or jnp.asarray
    totals = {k: 0 for k in STAT_KEYS}
    count = 0
    pipe = EvalBatchPipeline(paths, chunk_size, labels=labels, size=size)
    n_chunks = pipe.n_chunks
    for step, x_np, y_np, n_valid in pipe:
        x = place(x_np)
        if y_np is None:
            y = pseudo_label_fn(x)
        elif pseudo_label_fn is not None and np.any(np.asarray(y_np) < 0):
            pseudo = np.asarray(jax.device_get(pseudo_label_fn(x)))
            y = jnp.asarray(np.where(np.asarray(y_np) < 0, pseudo, y_np))
        else:
            y = jnp.asarray(y_np)
        out = eval_fn(x, y, threshold, jax.random.fold_in(key, step), eps)
        # fetch ONLY the counter vectors (6 x chunk int32) — x_adv stays on
        # device; this is the whole host<->device traffic of a chunk
        vecs = jax.device_get({k: out[k] for k in STAT_KEYS})
        for k in STAT_KEYS:
            totals[k] += int(np.sum(vecs[k][:n_valid]))
        count += int(n_valid)
        if progress is not None:
            progress(step + 1, n_chunks)
    stats = {k: int(v) for k, v in totals.items()}
    stats["count"] = count
    return stats


def stream_transfer_cell(
    cell_fn,
    paths: Sequence,
    key: jax.Array,
    eps: float,
    target_names: Sequence[str],
    *,
    chunk_size: int,
    size: int = 224,
    place: Callable[[np.ndarray], jax.Array] | None = None,
    save_adv: Callable[[np.ndarray, list], None] | None = None,
) -> dict:
    """One (attack, eps) transfer cell, streamed.

    ``cell_fn(x, key, eps) -> TransferCell`` is the compiled transfer
    program (source attack + all target forwards).  Returns the same
    record shape as the in-RAM path ({"source_success": [..],
    "transfer_success": {name: [..]}}) — per-sample int lists are tiny
    (bytes/image); only decoded IMAGES were the memory ceiling.
    ``save_adv(x_adv_chunk, kept_paths_chunk)`` runs per chunk when given.
    """
    place = place or jnp.asarray
    src_parts: list[np.ndarray] = []
    tgt_parts: dict[str, list[np.ndarray]] = {n: [] for n in target_names}
    path_list = [p for p in paths]
    pipe = EvalBatchPipeline(path_list, chunk_size,
                             labels=range(len(path_list)), size=size)
    for step, x_np, idx_np, n_valid in pipe:
        cell = cell_fn(place(x_np), jax.random.fold_in(key, step),
                       jnp.float32(eps))
        fetch = {"source": cell.source_success}
        fetch.update(cell.target_success)
        if save_adv is not None:
            fetch["x_adv"] = cell.x_adv
        got = jax.device_get(fetch)
        src_parts.append(np.asarray(got["source"][:n_valid]))
        for name in target_names:
            tgt_parts[name].append(np.asarray(got[name][:n_valid]))
        if save_adv is not None:
            kept = [path_list[i] for i in idx_np[:n_valid]]
            save_adv(np.asarray(got["x_adv"][:n_valid]), kept)
    return {
        "source_success": np.concatenate(src_parts).tolist(),
        "transfer_success": {
            name: np.concatenate(parts).tolist()
            for name, parts in tgt_parts.items()
        },
    }


def stream_correctness_cell(
    run_fn,
    paths: Sequence,
    key: jax.Array,
    severity: int,
    *,
    chunk_size: int,
    size: int = 224,
    pseudo_label_fn=None,
    labels: Sequence[int] | None = None,
    place: Callable[[np.ndarray], jax.Array] | None = None,
) -> dict[str, np.ndarray]:
    """One (corruption, severity) cell of the corruption benchmark, streamed.

    ``run_fn(x, y, severity, key) -> bool[B]`` is the compiled correctness
    program (eval/corruptions.py::make_corruption_run).  Label semantics
    match stream_robust_cell: ``labels`` carries ground truth with the
    UNLABELED(-1) sentinel meaning "use this image's pseudo-label".  When
    ``labels`` is fully resolved (no sentinel — e.g. the caller already
    merged pseudo-labels in a prelude pass, cli/corruption_eval.py), the
    per-chunk clean forward is SKIPPED — a corruption cell is itself only
    corrupt+forward, so a redundant pseudo pass would nearly double the
    cell's device time.  Returns the concatenated ``correct`` vector,
    plus ``clean_correct`` when the pseudo pass ran.
    """
    if labels is None and pseudo_label_fn is None:
        raise ValueError("need labels or pseudo_label_fn")
    need_pseudo = labels is None or np.any(np.asarray(labels) < 0)
    if need_pseudo and pseudo_label_fn is None:
        raise ValueError(
            "labels contain the UNLABELED (-1) sentinel but no "
            "pseudo_label_fn was given to substitute for them")
    place = place or jnp.asarray
    parts: list[dict[str, np.ndarray]] = []
    pipe = EvalBatchPipeline(paths, chunk_size, labels=labels, size=size)
    for step, x_np, y_np, n_valid in pipe:
        x = place(x_np)
        rec: dict[str, np.ndarray] = {}
        if need_pseudo:
            pseudo = np.asarray(jax.device_get(pseudo_label_fn(x)))
            y_eff = (pseudo if y_np is None
                     else np.where(np.asarray(y_np) < 0, pseudo, y_np))
            rec["clean_correct"] = pseudo[:n_valid] == y_eff[:n_valid]
        else:
            y_eff = np.asarray(y_np)
        correct = jax.device_get(run_fn(x, jnp.asarray(y_eff),
                                        jnp.int32(severity),
                                        jax.random.fold_in(key, step)))
        rec["correct"] = np.asarray(correct[:n_valid])
        parts.append(rec)
    keys = parts[0].keys() if parts else []
    return {k: np.concatenate([p[k] for p in parts]) for k in keys}


def stream_robust_cell(
    run_fn,
    paths: Sequence,
    key: jax.Array,
    eps: float,
    *,
    chunk_size: int,
    size: int = 224,
    pseudo_label_fn,
    labels: Sequence[int] | None = None,
    place: Callable[[np.ndarray], jax.Array] | None = None,
) -> dict[str, np.ndarray]:
    """One eps of the AutoAttack protocol, streamed.

    ``run_fn(x, y, key, eps) -> (success, per-arm...)`` is the compiled
    ensemble program (cli/robust_eval.py).  ``labels`` are ground-truth
    ids with ``-1`` meaning "unlabeled — use the pseudo-label" (the
    resolve_labels partial-file convention); omit for pure pseudo-label
    evaluation.  Returns concatenated vectors ``arm0..armK`` (the
    program's outputs) plus ``clean_correct``.
    """
    place = place or jnp.asarray
    parts: list[dict[str, np.ndarray]] = []
    pipe = EvalBatchPipeline(paths, chunk_size, labels=labels, size=size)
    for step, x_np, y_np, n_valid in pipe:
        x = place(x_np)
        pseudo = np.asarray(jax.device_get(pseudo_label_fn(x)))
        y_eff = (pseudo if y_np is None
                 else np.where(np.asarray(y_np) < 0, pseudo, y_np))
        outs = jax.device_get(run_fn(x, jnp.asarray(y_eff),
                                     jax.random.fold_in(key, step),
                                     jnp.float32(eps)))
        rec = {f"arm{i}": np.asarray(v[:n_valid]) for i, v in enumerate(outs)}
        rec["clean_correct"] = pseudo[:n_valid] == y_eff[:n_valid]
        parts.append(rec)
    keys = parts[0].keys() if parts else []
    return {k: np.concatenate([p[k] for p in parts]) for k in keys}
