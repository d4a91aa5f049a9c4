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

Host-memory contract (measured at 10,240 images on chip, r5): the
library itself is constant-memory — bounded decode queue, per-sample
scalar accumulators; CPU runs plateau.  On RELAY-attached hosts the
axon client additionally retains a host copy of EVERY uploaded chunk
for the life of the process (benchmarks/relay_rss_probe.py: exactly
the uploaded bytes per transfer; not releasable from our side), so a
long stream's RSS grows ~ n_chunks x chunk_bytes.
``ADV_TPU_TRANSFER_UINT8=1`` cuts both the retained bytes (4x) and the
measured slope (110 -> 54 MB per batch-128 chunk) and raised steady
throughput 1.63x (benchmarks/STREAM_SCALE_r5.jsonl).  Directly-attached
hosts (PCIe libtpu / GPU / CPU) are unaffected.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pipeline import EvalBatchPipeline
from .defense_eval import STAT_KEYS


def _check_cache_sig(clean_cache: dict | None, paths, chunk_size: int,
                     size: int) -> None:
    """Guard a cross-call ``clean_cache``: entries are keyed by chunk
    step and valid only for one ``(n_paths, chunk_size, size)`` chunking.
    The cache self-identifies with a ``"__sig__"`` entry (written on
    first use); a reuse under a different chunking raises instead of
    silently serving stale pseudo-labels (advisor r4)."""
    if clean_cache is None:
        return
    # the path-list hash makes a DIFFERENT (or reordered) file list of the
    # same length fail the guard too — same-length shards silently sharing
    # per-chunk pseudo-labels was exactly the bug this exists to stop
    # (in-process cache, so the salted str hash is stable enough)
    sig = (len(paths), int(chunk_size), int(size),
           hash(tuple(str(p) for p in paths)))
    prior = clean_cache.setdefault("__sig__", sig)
    if prior != sig:
        raise ValueError(
            f"clean_cache was built for (n_paths, chunk_size, size, "
            f"paths_hash)={prior} but this call streams {sig} — pass a "
            f"fresh dict")


def round_up(n: int, multiple: int) -> int:
    """Smallest multiple of ``multiple`` that is >= n."""
    multiple = max(1, int(multiple))
    return -(-int(n) // multiple) * multiple


def make_placer(
    mesh=None,
    transfer_uint8: bool | None = None,
) -> Callable[[np.ndarray], jax.Array]:
    """host chunk -> device float32 (data-sharded over the mesh when given).

    ``transfer_uint8`` (default: the ``ADV_TPU_TRANSFER_UINT8`` env
    toggle) ships uint8 pixels over the host->device link and converts
    to float32/255 in a tiny jitted program ON DEVICE.  Dataset-scale
    eval chunks are transfer-bound on relay/PCIe-attached hosts — a
    float32 batch-128 image chunk is 77 MB; serving measured 2.4x
    steady throughput from the same trick (docs/EXPERIMENTS.md).
    Pixels re-quantize to the 1/255 grid (max error 0.5/255 per
    channel), so attack/eval results can differ in the last ulp vs the
    float path — OPT-IN, off by default for exactness.
    """
    if transfer_uint8 is None:
        import os

        # opt-in whitelist — same convention as ADV_TPU_NATIVE_LOADER
        # (core/images.py): 'false'/'off'/anything else stays OFF
        transfer_uint8 = os.environ.get(
            "ADV_TPU_TRANSFER_UINT8", "").lower() in ("1", "on", "true")
    sharding = None
    if mesh is not None:
        from ..parallel.mesh import data_sharding

        sharding = data_sharding(mesh)

    def put(a) -> jax.Array:
        a = jnp.asarray(a)
        return jax.device_put(a, sharding) if sharding is not None else a

    if not transfer_uint8:
        return put

    conv = jax.jit(lambda u: u.astype(jnp.float32) / 255.0)

    def place(x_np):
        u8 = np.clip(np.round(np.asarray(x_np, np.float32) * 255.0),
                     0, 255).astype(np.uint8)
        return conv(put(u8))

    return place


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
    clean_cache: dict | None = None,
) -> dict[str, int]:
    """One (attack, eps) defense grid cell over arbitrarily many images.

    ``eval_fn(x, y, threshold, key, eps) -> {counter: [B] int32, ...}`` is
    the compiled cell program (dynamic-eps or split-JPEG).  Labels default
    to per-chunk pseudo-labels from ``pseudo_label_fn`` (the model's own
    clean predictions — reference :818-819 semantics); ``labels`` entries
    of ``-1`` mean "unlabeled — use the pseudo-label" (the resolve_labels
    partial-file convention).  Returns the six summed counters plus
    ``count``.  ``clean_cache`` (optional) carries per-chunk pseudo-labels
    across the CLI's attack x eps grid — same mechanism as the other
    streaming harnesses — so the clean forward runs once per chunk total,
    not once per grid cell.  Cache entries are keyed by chunk step and
    valid ONLY for identical ``(paths, chunk_size, size)``: the cache
    self-identifies with a ``"__sig__"`` entry and a reuse under a
    different chunking raises instead of silently serving stale
    pseudo-labels.
    """
    if labels is None and pseudo_label_fn is None:
        raise ValueError("need labels or pseudo_label_fn")
    _check_cache_sig(clean_cache, paths, chunk_size, size)
    if (pseudo_label_fn is None and labels is not None
            and np.any(np.asarray(labels) < 0)):
        raise ValueError(
            "labels contain the UNLABELED (-1) sentinel but no "
            "pseudo_label_fn was given to substitute for them")
    place = place or make_placer()
    totals = {k: 0 for k in STAT_KEYS}
    count = 0
    pipe = EvalBatchPipeline(paths, chunk_size, labels=labels, size=size)
    n_chunks = pipe.n_chunks
    for step, x_np, y_np, n_valid in pipe:
        x = place(x_np)
        if y_np is not None and not (pseudo_label_fn is not None
                                     and np.any(np.asarray(y_np) < 0)):
            y = jnp.asarray(y_np)  # fully labeled: no clean forward at all
        else:
            if clean_cache is not None and step in clean_cache:
                pseudo = clean_cache[step]
            else:
                pseudo = np.asarray(jax.device_get(pseudo_label_fn(x)))
                if clean_cache is not None:
                    clean_cache[step] = pseudo
            y = jnp.asarray(_merge_labels(y_np, pseudo))
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
    place = place or make_placer()
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
    place = place or make_placer()
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


def _merge_labels(y_np, pseudo):
    """Per-chunk label resolution shared by the streaming harnesses:
    ``None`` -> pure pseudo-labels; entries of ``-1`` (UNLABELED) -> that
    image's pseudo-label (the resolve_labels partial-file convention)."""
    if y_np is None:
        return pseudo
    y_np = np.asarray(y_np)
    return np.where(y_np < 0, pseudo, y_np)


def stream_suite_attack(
    attack_fn,
    metrics_fn,
    clean_fn,
    paths: Sequence,
    key: jax.Array,
    *,
    chunk_size: int,
    size: int = 224,
    labels: Sequence[int] | None = None,
    place: Callable[[np.ndarray], jax.Array] | None = None,
    clean_cache: dict | None = None,
) -> dict:
    """One attack row of the zoo-comparison table (cli/attack_suite.py),
    streamed at constant memory.

    ``attack_fn(x, y, key) -> x_adv`` is the one compiled attack program;
    ``metrics_fn(x, x_adv, y) -> {succ, linf, l2, changed, ssim, sq_sum,
    conf}`` returns PER-SAMPLE vectors (the streamable decomposition of
    the one-batch scalar program: batch means/maxes happen on the host,
    PSNR re-forms from the global squared-error sum, ECE from the
    (conf, correct) vectors via ece_from_conf_correct);
    ``clean_fn(x) -> (pred, conf)`` is the clean forward (pseudo-labels +
    clean calibration).  ``clean_cache`` (optional) carries the per-chunk
    clean predictions across the CLI's attack loop so the clean forward
    runs once per chunk for the whole table, not once per attack.

    Timing split mirrors the one-batch path: ``compile_run_s`` is the
    first chunk's attack call (compile + run), ``steady_s`` the mean of
    the remaining chunks' calls (pure device time — same program, same
    shapes).
    """
    import time

    place = place or make_placer()
    _check_cache_sig(clean_cache, paths, chunk_size, size)
    acc: dict[str, list[np.ndarray]] = {
        k: [] for k in ("succ", "linf", "l2", "changed", "ssim", "sq_sum",
                        "conf", "clean_conf", "clean_correct")}
    chunk_times: list[float] = []
    count = 0
    pipe = EvalBatchPipeline(paths, chunk_size, labels=labels, size=size)
    for step, x_np, y_np, n_valid in pipe:
        x = place(x_np)
        if clean_cache is not None and step in clean_cache:
            pred, conf_clean = clean_cache[step]
        else:
            pred, conf_clean = (np.asarray(v) for v in
                                jax.device_get(clean_fn(x)))
            if clean_cache is not None:
                clean_cache[step] = (pred, conf_clean)
        y_eff = _merge_labels(y_np, pred)
        y = jnp.asarray(y_eff)
        t0 = time.perf_counter()
        x_adv = attack_fn(x, y, jax.random.fold_in(key, step))
        jax.block_until_ready(x_adv)
        chunk_times.append(time.perf_counter() - t0)
        m = jax.device_get(metrics_fn(x, x_adv, y))
        for k, v in m.items():
            acc[k].append(np.asarray(v)[:n_valid])
        acc["clean_conf"].append(conf_clean[:n_valid])
        acc["clean_correct"].append(
            (pred[:n_valid] == y_eff[:n_valid]).astype(np.float32))
        count += int(n_valid)
    if count == 0:
        raise SystemExit("no loadable images")  # the one-batch invariant
    out = {k: np.concatenate(v) for k, v in acc.items()}
    out["count"] = count
    out["compile_run_s"] = chunk_times[0]
    out["steady_s"] = (float(np.mean(chunk_times[1:]))
                       if len(chunk_times) > 1 else None)
    # every chunk's attack-call wall time, in order — lets scale probes
    # report variance, not just the mean (benchmarks/stream_scale_probe.py)
    out["chunk_times_s"] = [float(t) for t in chunk_times]
    return out


def stream_query_curve_hist(
    run_fn,
    n_steps: int,
    paths: Sequence,
    key: jax.Array,
    *,
    chunk_size: int,
    size: int = 224,
    pseudo_label_fn,
    labels: Sequence[int] | None = None,
    place: Callable[[np.ndarray], jax.Array] | None = None,
    clean_cache: dict | None = None,
) -> dict[str, np.ndarray]:
    """One attack's ASR-vs-queries raw statistics, streamed.

    ``run_fn(x, y, key) -> (x_adv, succ_hist [steps, B])`` is the compiled
    history-emitting attack (eval/query_curves.py::_runner).  The curve
    needs only two reductions over samples, both streamable: the per-step
    count of ever-succeeded samples ([steps] ints — the ASR numerator)
    and each sample's first-success step (for the median-queries stat).
    The [steps, B] history never accumulates across chunks — one chunk's
    slice is fetched, reduced, and dropped.  ``clean_cache`` (optional)
    carries per-chunk pseudo-labels across the CLI's attack loop — same
    mechanism as stream_suite_attack — so the clean forward runs once per
    chunk for the whole table, not once per attack.
    """
    place = place or make_placer()
    _check_cache_sig(clean_cache, paths, chunk_size, size)
    ever_count = np.zeros((int(n_steps),), np.int64)
    firsts: list[np.ndarray] = []
    count = 0
    pipe = EvalBatchPipeline(paths, chunk_size, labels=labels, size=size)
    for step, x_np, y_np, n_valid in pipe:
        x = place(x_np)
        if clean_cache is not None and step in clean_cache:
            pseudo = clean_cache[step]
        else:
            pseudo = np.asarray(jax.device_get(pseudo_label_fn(x)))
            if clean_cache is not None:
                clean_cache[step] = pseudo
        y = jnp.asarray(_merge_labels(y_np, pseudo))
        _, hist = run_fn(x, y, jax.random.fold_in(key, step))
        hist = np.asarray(jax.device_get(hist))[:, :n_valid]  # [steps, B]
        ever = np.maximum.accumulate(hist, axis=0)
        ever_count += ever.sum(axis=1)
        firsts.append(np.where(ever.any(axis=0), ever.argmax(axis=0), -1))
        count += int(n_valid)
    if count == 0:
        raise SystemExit("no loadable images")  # the one-batch invariant
    return {
        "ever_count": ever_count,
        "first": np.concatenate(firsts) if firsts else np.empty(0, np.int64),
        "count": count,
    }


def stream_detector_scores(
    attack_fn,
    score_fns: dict,
    pred_fn,
    paths: Sequence,
    key: jax.Array,
    *,
    chunk_size: int,
    size: int = 224,
    place: Callable[[np.ndarray], jax.Array] | None = None,
    clean_cache: dict | None = None,
) -> dict:
    """Adversarial-side scores of one attack for every detector, streamed
    (cli/detector_eval.py).  ``attack_fn(x, y, key) -> x_adv``;
    ``score_fns`` maps detector name -> compiled score program;
    ``pred_fn(x) -> argmax labels`` provides per-chunk pseudo-labels and
    the ASR check.  Only [B] score vectors reach the host — the ROC
    arithmetic (AUC/TPR) runs downstream on the full concatenated
    vectors, identical to the one-batch path.  ``clean_cache`` (optional)
    carries per-chunk clean predictions across the CLI's attack loop —
    same mechanism as stream_suite_attack — so the clean forward runs
    once per chunk for the whole comparison, not once per attack.
    """
    place = place or make_placer()
    _check_cache_sig(clean_cache, paths, chunk_size, size)
    adv: dict[str, list[np.ndarray]] = {d: [] for d in score_fns}
    succ: list[np.ndarray] = []
    count = 0
    pipe = EvalBatchPipeline(paths, chunk_size, size=size)
    for step, x_np, _y, n_valid in pipe:
        x = place(x_np)
        if clean_cache is not None and step in clean_cache:
            y_np_clean = clean_cache[step]
        else:
            y_np_clean = np.asarray(jax.device_get(pred_fn(x)))
            if clean_cache is not None:
                clean_cache[step] = y_np_clean
        y = jnp.asarray(y_np_clean)
        x_adv = attack_fn(x, y, jax.random.fold_in(key, step))
        pred_adv = np.asarray(jax.device_get(pred_fn(x_adv)))
        succ.append((pred_adv != y_np_clean)[:n_valid])
        for det, fn in score_fns.items():
            s = np.asarray(jax.device_get(fn(x_adv)), np.float64)
            adv[det].append(s[:n_valid])
        count += int(n_valid)
    if count == 0:
        raise SystemExit("no loadable images")  # the one-batch invariant
    return {
        "adv": {d: np.concatenate(v) for d, v in adv.items()},
        "succ": np.concatenate(succ),
        "count": count,
    }


def stream_clean_scores(
    score_fns: dict,
    paths: Sequence,
    *,
    chunk_size: int,
    size: int = 224,
    place: Callable[[np.ndarray], jax.Array] | None = None,
) -> dict[str, np.ndarray]:
    """Clean-side detector scores over the full set (the calibration pass
    of the streamed detector comparison — thresholds then come from the
    SAME full-set quantiles the one-batch path uses)."""
    place = place or make_placer()
    clean: dict[str, list[np.ndarray]] = {d: [] for d in score_fns}
    pipe = EvalBatchPipeline(paths, chunk_size, size=size)
    for _step, x_np, _y, n_valid in pipe:
        x = place(x_np)
        for det, fn in score_fns.items():
            s = np.asarray(jax.device_get(fn(x)), np.float64)
            clean[det].append(s[:n_valid])
    if not any(clean.values()) or not next(iter(clean.values())):
        raise SystemExit("no loadable images")  # the one-batch invariant
    return {d: np.concatenate(v) for d, v in clean.items()}


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
    clean_cache: dict | None = None,
) -> dict[str, np.ndarray]:
    """One eps of the AutoAttack protocol, streamed.

    ``run_fn(x, y, key, eps) -> (success, per-arm...)`` is the compiled
    ensemble program (cli/robust_eval.py).  ``labels`` are ground-truth
    ids with ``-1`` meaning "unlabeled — use the pseudo-label" (the
    resolve_labels partial-file convention); omit for pure pseudo-label
    evaluation.  Returns concatenated vectors ``arm0..armK`` (the
    program's outputs) plus ``clean_correct``.  ``clean_cache``
    (optional) carries per-chunk pseudo-labels across the CLI's eps loop
    — same mechanism as stream_suite_attack — so the clean forward runs
    once per chunk for all eps cells, not once per eps.
    """
    place = place or make_placer()
    _check_cache_sig(clean_cache, paths, chunk_size, size)
    parts: list[dict[str, np.ndarray]] = []
    pipe = EvalBatchPipeline(paths, chunk_size, labels=labels, size=size)
    for step, x_np, y_np, n_valid in pipe:
        x = place(x_np)
        if clean_cache is not None and step in clean_cache:
            pseudo = clean_cache[step]
        else:
            pseudo = np.asarray(jax.device_get(pseudo_label_fn(x)))
            if clean_cache is not None:
                clean_cache[step] = pseudo
        y_eff = _merge_labels(y_np, pseudo)
        outs = jax.device_get(run_fn(x, jnp.asarray(y_eff),
                                     jax.random.fold_in(key, step),
                                     jnp.float32(eps)))
        rec = {f"arm{i}": np.asarray(v[:n_valid]) for i, v in enumerate(outs)}
        rec["clean_correct"] = pseudo[:n_valid] == y_eff[:n_valid]
        parts.append(rec)
    keys = parts[0].keys() if parts else []
    return {k: np.concatenate([p[k] for p in parts]) for k in keys}
