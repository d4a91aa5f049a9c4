"""Query-efficiency curves: histories, curve math, CLI."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_recognition_adversarial_example_attack_tpu.eval.query_curves import (
    curve_at_checkpoints,
    query_curve,
)


def _xy(tiny_logits_fn, image_batch):
    x = jnp.asarray(image_batch)
    return x, jnp.argmax(tiny_logits_fn(x), -1)


class TestHistories:
    def test_square_history_consistent_with_plain_run(
            self, tiny_logits_fn, image_batch, rng_key):
        from image_recognition_adversarial_example_attack_tpu.attacks.square import (
            square_attack,
        )

        x, y = _xy(tiny_logits_fn, image_batch)
        plain = square_attack(tiny_logits_fn, x, y, eps=0.1, steps=20,
                              key=rng_key)
        with_h, hist = square_attack(tiny_logits_fn, x, y, eps=0.1, steps=20,
                                     key=rng_key, return_history=True)
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(with_h))
        hist = np.asarray(hist)
        assert hist.shape == (20, x.shape[0]) and hist.dtype == bool
        # the final history row IS the returned iterate's success
        final = np.asarray(jnp.argmax(tiny_logits_fn(with_h), -1) != y)
        np.testing.assert_array_equal(hist[-1], final)
        # best-tracking makes success sticky: the raw mask is already
        # monotone per sample
        assert (np.diff(hist.astype(int), axis=0) >= 0).all()

    def test_simba_history(self, tiny_logits_fn, image_batch, rng_key):
        from image_recognition_adversarial_example_attack_tpu.attacks.simba import (
            simba_attack,
        )

        x, y = _xy(tiny_logits_fn, image_batch)
        x_adv, hist = simba_attack(tiny_logits_fn, x, y, steps=15, eps=0.3,
                                   mode="pixel", key=rng_key,
                                   return_history=True)
        hist = np.asarray(hist)
        assert hist.shape == (15, x.shape[0])
        assert (np.diff(hist.astype(int), axis=0) >= 0).all()  # done is sticky

    def test_nes_history_and_plain_equal(self, tiny_logits_fn, image_batch,
                                         rng_key):
        from image_recognition_adversarial_example_attack_tpu.attacks.grad_est import (
            nes_attack,
        )

        x, y = _xy(tiny_logits_fn, image_batch)
        kw = dict(eps=8 / 255, alpha=2 / 255, steps=5, key=rng_key,
                  n_samples=2)
        plain = nes_attack(tiny_logits_fn, x, y, **kw)
        with_h, hist = nes_attack(tiny_logits_fn, x, y, **kw,
                                  return_history=True)
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(with_h))
        assert np.asarray(hist).shape == (5, x.shape[0])


class TestCurveMath:
    def test_query_curve_structure(self, tiny_logits_fn, image_batch, rng_key):
        x, y = _xy(tiny_logits_fn, image_batch)
        curve = query_curve("square", tiny_logits_fn, x, y, eps=0.1,
                            max_queries=30, key=rng_key)
        qs, asr = curve["queries"], curve["asr"]
        assert len(qs) == len(asr) == 28  # (30 - 2 init) / 1 per step
        assert qs[0] == 3 and qs[-1] == 30
        assert all(a <= b + 1e-9 for a, b in zip(asr, asr[1:]))  # monotone
        assert curve["final_asr"] == asr[-1]
        med = curve["median_queries_to_success"]
        if med is not None:
            assert qs[0] <= med <= qs[-1]

    def test_nes_query_accounting(self, tiny_logits_fn, image_batch, rng_key):
        x, y = _xy(tiny_logits_fn, image_batch)
        curve = query_curve("nes", tiny_logits_fn, x, y, eps=0.1,
                            max_queries=40, key=rng_key, est_samples=4)
        # 8 queries per step, no init queries -> 5 steps
        assert curve["queries"] == [8, 16, 24, 32, 40]

    def test_checkpoint_sampling(self):
        curve = {"queries": [10, 20, 30], "asr": [0.1, 0.5, 0.7]}
        got = curve_at_checkpoints(curve, [5, 10, 25, 100])
        assert got == [(5, 0.0), (10, 0.1), (25, 0.5), (100, 0.7)]

    def test_unknown_attack_rejected(self, tiny_logits_fn, image_batch, rng_key):
        x, y = _xy(tiny_logits_fn, image_batch)
        with pytest.raises(KeyError):
            query_curve("pgd", tiny_logits_fn, x, y, eps=0.1,
                        max_queries=10, key=rng_key)


@pytest.mark.slow
def test_query_curves_cli(tmp_path, capsys):
    from PIL import Image

    from image_recognition_adversarial_example_attack_tpu.cli.query_curves import (
        main,
    )

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.RandomState(1)
    for i in range(3):
        Image.fromarray((rng.rand(48, 48, 3) * 255).astype(np.uint8)).save(
            d / f"i{i}.jpg")
    out = tmp_path / "curves.json"
    rc = main(["--image_dir", str(d), "--model", "resnet_tiny",
               "--attacks", "square", "simba", "--max_queries", "60",
               "--checkpoints", "20", "60", "--output", str(out)])
    assert rc == 0
    text = capsys.readouterr().out
    assert "q=20" in text and "q=60" in text
    data = json.loads(out.read_text())
    assert data["max_queries"] == 60
    assert {c["attack"] for c in data["curves"]} == {"square", "simba"}
    for c in data["curves"]:
        assert len(c["queries"]) == len(c["asr"])
        assert all(0.0 <= a <= 1.0 for a in c["asr"])
