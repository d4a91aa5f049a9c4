"""Streaming input pipeline (utils/pipeline.py): background decode with
the same deterministic schedule as the in-RAM training path."""

import numpy as np
import pytest
from PIL import Image

from image_recognition_adversarial_example_attack_tpu.utils.pipeline import (
    BatchPipeline,
    shuffle_seed,
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("ds")
    rng = np.random.RandomState(0)
    paths, labels = [], []
    for i in range(7):
        p = d / f"img_{i}.jpg"
        Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)).save(p)
        paths.append(p)
        labels.append(i % 2)
    return paths, labels


def test_shapes_schedule_and_determinism(dataset):
    paths, labels = dataset
    got = list(BatchPipeline(paths, labels, 3, size=32, epochs=2))
    # 7 images, batch 3 -> 2 steps/epoch x 2 epochs
    assert [(e, s) for e, s, _, _ in got] == [(0, 0), (0, 1), (1, 0), (1, 1)]
    for _, _, x, y in got:
        assert x.shape == (3, 32, 32, 3) and x.dtype == np.float32
        assert y.shape == (3,) and y.dtype == np.int32
        assert 0.0 <= x.min() and x.max() <= 1.0
    again = list(BatchPipeline(paths, labels, 3, size=32, epochs=2))
    for (_, _, x1, y1), (_, _, x2, y2) in zip(got, again):
        np.testing.assert_array_equal(x1, x2)
        np.testing.assert_array_equal(y1, y2)


def test_matches_in_ram_schedule(dataset):
    """The pipeline's batches equal indexing the in-RAM array with the
    training CLI's epoch-seeded permutation — the equivalence that makes
    a streaming run bitwise-reproduce an in-RAM run."""
    from image_recognition_adversarial_example_attack_tpu.core.images import (
        load_image_batch_tolerant,
    )

    paths, labels = dataset
    x_all, kept = load_image_batch_tolerant(paths, size=32)
    y_all = np.asarray(labels, np.int32)
    batch = 3
    n = len(paths)
    for seed in (0, 17):
        pipe = BatchPipeline(paths, labels, batch, size=32, epochs=1,
                             seed=seed)
        for epoch, s, x, y in pipe:
            order = np.random.RandomState(
                shuffle_seed(seed, epoch)).permutation(n)
            idx = order[s * batch:(s + 1) * batch]
            if len(idx) < batch:
                idx = np.concatenate([idx, order[: batch - len(idx)]])
            np.testing.assert_array_equal(x, x_all[idx])
            np.testing.assert_array_equal(y, y_all[idx])


def test_seed_changes_batch_composition(dataset):
    """--seed reaches the shuffle (A2 policy): different seeds must yield
    different epoch-0 orderings, same seed must reproduce them."""
    paths, labels = dataset
    x0 = np.stack([x for _, _, x, _ in
                   BatchPipeline(paths, labels, 3, size=32, epochs=1, seed=0)])
    x17 = np.stack([x for _, _, x, _ in
                    BatchPipeline(paths, labels, 3, size=32, epochs=1,
                                  seed=17)])
    x17b = np.stack([x for _, _, x, _ in
                     BatchPipeline(paths, labels, 3, size=32, epochs=1,
                                   seed=17)])
    np.testing.assert_array_equal(x17, x17b)
    o0 = np.random.RandomState(shuffle_seed(0, 0)).permutation(7)
    o17 = np.random.RandomState(shuffle_seed(17, 0)).permutation(7)
    assert not np.array_equal(o0, o17)
    assert not np.array_equal(x0, x17)


def test_start_epoch_resumes_schedule(dataset):
    paths, labels = dataset
    full = list(BatchPipeline(paths, labels, 3, size=32, epochs=2))
    tail = list(BatchPipeline(paths, labels, 3, size=32, epochs=2,
                              start_epoch=1))
    assert [(e, s) for e, s, _, _ in tail] == [(1, 0), (1, 1)]
    for (_, _, x1, y1), (_, _, x2, y2) in zip(full[2:], tail):
        np.testing.assert_array_equal(x1, x2)
        np.testing.assert_array_equal(y1, y2)


def test_decode_failure_refills_to_static_shape(dataset, tmp_path):
    paths, labels = dataset
    bad = tmp_path / "corrupt.jpg"
    bad.write_bytes(b"not a jpeg")
    all_paths = list(paths) + [bad] * 3  # force bad rows into batches
    all_labels = list(labels) + [0, 0, 0]
    for _, _, x, y in BatchPipeline(all_paths, all_labels, 5, size=32, epochs=1):
        assert x.shape == (5, 32, 32, 3)  # refilled, never short
        assert y.shape == (5,)


def test_single_use_and_validation(dataset):
    paths, labels = dataset
    with pytest.raises(ValueError):
        BatchPipeline(paths, labels[:-1], 3)
    with pytest.raises(ValueError):
        BatchPipeline([], [], 3)
    pipe = BatchPipeline(paths, labels, 3, size=32, epochs=1)
    list(pipe)
    with pytest.raises(RuntimeError):
        iter(pipe).__next__()
