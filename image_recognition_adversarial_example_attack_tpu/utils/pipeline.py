"""Streaming input pipeline: decode the NEXT batch while the device runs.

Production data plane for datasets that do not fit the in-RAM path the
training CLI defaults to.  A background thread decodes/preprocesses batch
t+1 (honoring the native C++ loader, core/images.py) while the device
consumes batch t — the host work hides entirely behind the device step
whenever decode-time <= step-time (the steady state on a TPU; see
benchmarks/ROOFLINE.md for the rates).

Design notes (TPU-shaped):
- STATIC batch shape: short tails are padded by resampling from the same
  epoch (training-only semantics, standard drop-remainder alternative),
  so the consumer's compiled program never re-specializes.
- bounded queue (depth 2): decode can run at most one batch ahead —
  constant host memory, natural backpressure.
- deterministic: epoch shuffles come from ``RandomState(seed*100003+epoch)``
  (seed-sensitive yet epoch-indexed, so resume replays the schedule); the
  consumer derives per-batch PRNG keys from the yielded (epoch, step)
  tags — the training CLI uses ``fold_in(fold_in(key0, epoch), step)``,
  the SAME schedule as its in-RAM path, so a streaming run is
  bitwise-comparable to an in-RAM run WHEN every listed image decodes
  (the in-RAM path shuffles over decoded images, this pipeline over
  listed paths; a decode failure makes the two index sets differ).
- per-image failure isolation: unreadable files are skipped with a
  warning (load_image_batch_tolerant); a batch only fails if EVERY image
  in it is unreadable.
"""

from __future__ import annotations

import queue
import sys
import threading
from pathlib import Path
from typing import Iterator, Sequence

import numpy as np

from ..core.images import IMAGE_SIZE, load_image_batch_tolerant


def shuffle_seed(seed: int, epoch: int) -> int:
    """Epoch-shuffle seed: seed-sensitive (A2 policy — `--seed` reaches
    batch composition) yet epoch-indexed so a resumed run replays the
    exact schedule an uninterrupted run would have used.  Shared by the
    training CLI's in-RAM path and BatchPipeline so the two stay
    bitwise-comparable."""
    return (int(seed) * 100003 + int(epoch)) % (2 ** 32)


class _ThreadedPipeline:
    """Shared producer/consumer spine: a daemon thread fills a bounded
    queue (constant host memory, natural backpressure); iteration drains
    it and reaps the thread on any exit path."""

    def __init__(self, prefetch: int) -> None:
        self._queue: queue.Queue = queue.Queue(maxsize=max(1, int(prefetch)))
        self._thread: threading.Thread | None = None
        self._stop = threading.Event()

    def _produce(self) -> None:  # pragma: no cover — overridden
        raise NotImplementedError

    def _put(self, item) -> bool:
        """put() that gives up when the consumer signalled shutdown — an
        abandoned iteration must not leave the producer blocked forever on
        a full bounded queue."""
        while not self._stop.is_set():
            try:
                self._queue.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def __iter__(self) -> Iterator:
        if self._thread is not None:
            raise RuntimeError(
                f"{type(self).__name__} is single-use; build a new one")
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()
        try:
            while True:
                item = self._queue.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # normal exit, consumer exception, or generator close(): stop
            # the producer and reap the thread either way
            self._stop.set()
            self._thread.join(timeout=30.0)


class BatchPipeline(_ThreadedPipeline):
    """Iterate (x [B,H,W,3] float32, y [B] int32) with background decode.

    ``paths``/``labels``: parallel sequences for the whole dataset.
    One pass over ``epochs`` epochs; each epoch reshuffles with
    ``RandomState(shuffle_seed(seed, epoch))`` (matching the training
    CLI's in-RAM schedule; ``--seed`` reaches batch composition).
    """

    def __init__(
        self,
        paths: Sequence[str | Path],
        labels: Sequence[int],
        batch_size: int,
        *,
        size: int = IMAGE_SIZE,
        epochs: int = 1,
        start_epoch: int = 0,
        prefetch: int = 2,
        seed: int = 0,
    ) -> None:
        if len(paths) != len(labels):
            raise ValueError(f"{len(paths)} paths vs {len(labels)} labels")
        if not paths:
            raise ValueError("empty dataset")
        super().__init__(prefetch)
        self._paths = [str(p) for p in paths]
        self._labels = np.asarray(labels, np.int32)
        self._batch = int(batch_size)
        self._size = int(size)
        self._epochs = int(epochs)
        self._start_epoch = int(start_epoch)
        self._seed = int(seed)

    @property
    def steps_per_epoch(self) -> int:
        return max(1, len(self._paths) // self._batch)

    def _produce(self) -> None:
        try:
            for epoch in range(self._start_epoch, self._epochs):
                order = np.random.RandomState(
                    shuffle_seed(self._seed, epoch)
                ).permutation(len(self._paths))
                for s in range(self.steps_per_epoch):
                    idx = order[s * self._batch:(s + 1) * self._batch]
                    if len(idx) < self._batch:  # static shape: resample
                        idx = np.concatenate(
                            [idx, order[: self._batch - len(idx)]])
                    batch_paths = [self._paths[i] for i in idx]
                    x, kept = load_image_batch_tolerant(batch_paths,
                                                        size=self._size)
                    # normalize BOTH sides: kept holds Path-normalized
                    # entries, batch_paths raw strings ("./a.jpg" != "a.jpg")
                    kept_set = {str(Path(p)) for p in kept}
                    y = np.asarray(
                        [self._labels[i] for i, p in zip(idx, batch_paths)
                         if str(Path(p)) in kept_set], np.int32)
                    if x.shape[0] < self._batch:
                        # refill dropped rows by repeating loaded ones —
                        # keeps the static shape under decode failures
                        reps = np.resize(np.arange(x.shape[0]),
                                         self._batch - x.shape[0])
                        x = np.concatenate([x, x[reps]], axis=0)
                        y = np.concatenate([y, y[reps]], axis=0)
                    if not self._put((epoch, s, x, y)):
                        return  # consumer abandoned iteration
            self._put(None)  # end-of-stream sentinel
        except BaseException as e:  # surface producer crashes to the consumer
            self._put(e)


class EvalBatchPipeline(_ThreadedPipeline):
    """Ordered single-pass chunks for EVALUATION at constant memory.

    Iterates ``(step, x [C,H,W,3] float32, y [C] int32 | None, n_valid)``
    over ``paths`` IN ORDER, exactly once, with background decode.  Unlike
    the training ``BatchPipeline`` there is no shuffling and no resampling:
    every image is evaluated exactly once, and the tail chunk is padded to
    the static shape by repeating decoded rows with ``n_valid`` marking
    the real prefix — the consumer masks counters past it.  This is the
    data plane that replaces the reference's per-image evaluation loop
    (defense_experiments.py:804-832) at dataset scales a single resident
    batch cannot hold (VERDICT r2 next #1).

    ``chunk_size`` should be a multiple of the mesh's data-axis size when
    chunks are placed on a sharded mesh (the caller rounds up).
    Decode failures shrink ``n_valid`` (per-image failure isolation); a
    chunk is dropped only if every image in it is unreadable.  ``labels``
    (optional) ride along aligned with the kept images.
    """

    def __init__(
        self,
        paths: Sequence[str | Path],
        chunk_size: int,
        *,
        labels: Sequence[int] | None = None,
        size: int = IMAGE_SIZE,
        prefetch: int = 2,
    ) -> None:
        if not paths:
            raise ValueError("empty dataset")
        if labels is not None and len(labels) != len(paths):
            raise ValueError(f"{len(paths)} paths vs {len(labels)} labels")
        super().__init__(prefetch)
        self._paths = [str(p) for p in paths]
        self._labels = (None if labels is None
                        else np.asarray(labels, np.int32))
        self._chunk = int(chunk_size)
        self._size = int(size)

    @property
    def n_chunks(self) -> int:
        return -(-len(self._paths) // self._chunk)  # ceil div

    def _produce(self) -> None:
        try:
            step = 0
            for start in range(0, len(self._paths), self._chunk):
                chunk_paths = self._paths[start:start + self._chunk]
                try:
                    x, kept = load_image_batch_tolerant(chunk_paths,
                                                        size=self._size)
                except ValueError:
                    # every image in the chunk unreadable: drop the chunk
                    # (isolation); later chunks still evaluate
                    print(f"warning: skipping chunk at offset {start} — "
                          "no readable images", file=sys.stderr)
                    continue
                kept_set = {str(Path(p)) for p in kept}
                keep_idx = [start + i for i, p in enumerate(chunk_paths)
                            if str(Path(p)) in kept_set]
                n_valid = x.shape[0]
                y = (None if self._labels is None
                     else self._labels[keep_idx])
                if n_valid < self._chunk:
                    # pad to the static shape; rows past n_valid are masked
                    # out of every counter by the consumer
                    reps = np.resize(np.arange(n_valid),
                                     self._chunk - n_valid)
                    x = np.concatenate([x, x[reps]], axis=0)
                    if y is not None:
                        y = np.concatenate([y, y[reps]], axis=0)
                if not self._put((step, x, y, n_valid)):
                    return  # consumer abandoned iteration
                step += 1
            self._put(None)  # end-of-stream sentinel
        except BaseException as e:  # surface producer crashes to the consumer
            self._put(e)
