"""HTTP serving front-end: batch worker, routes, cross-request batching."""

import base64
import json
import threading
import urllib.request
from pathlib import Path

import jax
import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def http_server(tiny_logits_fn):
    """In-process worker + server over the tiny model (port 0 = ephemeral)."""
    from image_recognition_adversarial_example_attack_tpu.cli.serve import (
        _BatchWorker,
        make_http_server,
    )

    service = jax.jit(lambda x: {"probs": jax.nn.softmax(
        tiny_logits_fn(x), axis=-1)})
    worker = _BatchWorker(service, lambda x: x, batch=4, topk=3,
                          labels=None, detector_threshold=None,
                          max_wait_s=0.2)
    server = make_http_server("127.0.0.1", 0, worker,
                              {"ready": True, "batch": 4}, size=16)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    port = server.server_address[1]
    yield f"http://127.0.0.1:{port}"
    server.shutdown()
    t.join(timeout=10)
    worker.shutdown()


def _post(url, payload: dict) -> dict:
    req = urllib.request.Request(
        url + "/classify", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def _img_file(tmp_path: Path, name: str, seed: int) -> Path:
    rng = np.random.RandomState(seed)
    p = tmp_path / name
    Image.fromarray((rng.rand(24, 24, 3) * 255).astype(np.uint8)).save(p)
    return p


class TestHTTPRoutes:
    def test_healthz(self, http_server):
        with urllib.request.urlopen(http_server + "/healthz", timeout=30) as r:
            data = json.loads(r.read())
        assert data["ready"] is True and data["batch"] == 4

    def test_unknown_route_404(self, http_server):
        try:
            urllib.request.urlopen(http_server + "/nope", timeout=30)
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404

    def test_classify_path(self, http_server, tmp_path):
        p = _img_file(tmp_path, "a.png", 0)
        out = _post(http_server, {"path": str(p)})
        (resp,) = out["results"]
        assert resp["path"] == str(p)
        assert 0.0 <= resp["prob"] <= 1.0 and len(resp["topk"]) == 3
        assert resp["latency_ms"] > 0 and resp["batch_size"] == 4
        assert "decode_ms" in resp

    def test_classify_b64(self, http_server, tmp_path):
        p = _img_file(tmp_path, "b.png", 1)
        b64 = base64.b64encode(p.read_bytes()).decode()
        out = _post(http_server, {"image_b64": b64})
        (resp,) = out["results"]
        assert 0.0 <= resp["prob"] <= 1.0

    def test_error_isolation(self, http_server, tmp_path):
        """One bad entry never poisons the others in the same request."""
        p = _img_file(tmp_path, "c.png", 2)
        out = _post(http_server, {
            "paths": [str(p), str(tmp_path / "missing.png")],
            "image_b64": "!!!not-base64!!!",
        })
        results = out["results"]
        assert len(results) == 3
        ok = [r for r in results if "error" not in r]
        bad = [r for r in results if "error" in r]
        assert len(ok) == 1 and len(bad) == 2

    def test_multi_image_request_batches_one_device_call(
            self, http_server, tmp_path):
        """A paths-list request enqueues everything before waiting, so the
        worker serves it as ONE batch (request_count covers all images)."""
        ps = [_img_file(tmp_path, f"m{i}.png", 10 + i) for i in range(3)]
        out = _post(http_server, {"paths": [str(p) for p in ps]})
        results = out["results"]
        assert len(results) == 3
        counts = {r["request_count"] for r in results}
        lats = {r["latency_ms"] for r in results}
        assert counts == {3}   # all three rode the same drain
        assert len(lats) == 1  # ... and the same device call

    def test_bad_body_400(self, http_server):
        for payload in ({}, {"junk": 1}):
            try:
                _post(http_server, payload)
                raise AssertionError("expected 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400


@pytest.mark.slow
def test_serve_cli_http_end_to_end(tmp_path):
    """Full subprocess drive: --http 0, ready line carries the bound port,
    healthz + classify round-trip, SIGTERM drains cleanly (exit 0)."""
    import signal as _signal
    import subprocess
    import sys as _sys

    img = _img_file(tmp_path, "e2e.png", 7)
    env = {"ADV_TPU_PLATFORM": "cpu", "PATH": "/usr/bin:/bin", "HOME": "/root"}
    proc = subprocess.Popen(
        [_sys.executable, "-m",
         "image_recognition_adversarial_example_attack_tpu.cli.serve",
         "--model", "resnet_tiny", "--batch", "2", "--http", "0",
         "--detector", "feature", "--detector_threshold", "0.5"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        cwd=str(Path(__file__).resolve().parent.parent),
    )
    try:
        ready = json.loads(proc.stdout.readline())
        assert ready["ready"] is True
        url = f"http://{ready['http']['host']}:{ready['http']['port']}"
        out = _post(url, {"path": str(img)})
        (resp,) = out["results"]
        assert resp["top1"] >= 0 and resp["latency_ms"] > 0
        assert "detector_score" in resp and "detector_flag" in resp
        proc.send_signal(_signal.SIGTERM)
        stdout, stderr = proc.communicate(timeout=60)
        assert proc.returncode == 0, stderr[-2000:]
        last = json.loads(stdout.splitlines()[-1])
        assert last == {"shutdown": True, "signal": int(_signal.SIGTERM)}
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()


def test_metrics_endpoint(http_server, tmp_path):
    """GET /metrics: Prometheus text counters advance with traffic."""
    def scrape():
        with urllib.request.urlopen(http_server + "/metrics", timeout=30) as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
        return {ln.split()[0]: float(ln.split()[1])
                for ln in text.splitlines()
                if ln and not ln.startswith("#")}

    before = scrape()
    p = _img_file(tmp_path, "metrics.png", 42)
    _post(http_server, {"paths": [str(p), str(tmp_path / "nope.png")]})
    after = scrape()
    assert after["serve_images_total"] == before["serve_images_total"] + 1
    assert after["serve_batches_total"] >= before["serve_batches_total"] + 1
    assert (after["serve_decode_errors_total"]
            == before["serve_decode_errors_total"] + 1)
    assert after["serve_device_ms_sum"] > before["serve_device_ms_sum"]
    assert after["serve_batch_capacity"] == 4


def test_concurrent_clients_batch_and_isolate(http_server, tmp_path):
    """VERDICT r3 #7's concurrent-client check: 12 clients fire
    simultaneously (batch=4, max_wait 0.2s, so the worker co-batches
    strangers' requests); every client gets ITS OWN image's prediction
    (deterministic per image — co-batching must not leak across
    requests), errors stay isolated to the failing client, and the
    b64 route works under concurrency too."""
    paths = [_img_file(tmp_path, f"cc_{i}.png", seed=100 + i)
             for i in range(10)]

    # sequential ground truth, one request each
    want = {str(p): _post(http_server, {"path": str(p)})["results"][0]["topk"]
            for p in paths}

    results: dict[int, dict | Exception] = {}

    def client(i):
        try:
            if i == 10:   # one bad path, mid-burst
                results[i] = _post(http_server, {"path": "/nope/missing.png"})
            elif i == 11:  # one b64 body
                raw = paths[0].read_bytes()
                results[i] = _post(http_server, {
                    "image_b64": base64.b64encode(raw).decode()})
            else:
                results[i] = _post(http_server, {"path": str(paths[i])})
        except Exception as e:  # surface in main thread
            results[i] = e

    threads = [threading.Thread(target=client, args=(i,)) for i in range(12)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert len(results) == 12
    for i in range(10):
        r = results[i]
        assert not isinstance(r, Exception), r
        (resp,) = r["results"]
        assert resp["path"] == str(paths[i])
        assert resp["topk"] == want[str(paths[i])], (
            "co-batched prediction differs from the sequential one")
    bad = results[10]["results"][0]
    assert "error" in bad
    b64r = results[11]["results"][0]
    assert b64r["topk"] == want[str(paths[0])]
