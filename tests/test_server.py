"""HTTP serving layer tests (tiny model, threaded server, real requests)."""

import json
import threading
import urllib.request

import pytest

import tests.test_pipeline as tp
from qwen3_tts_tpu import server as srv


@pytest.fixture(scope="module")
def running_server():
    model = tp.tiny_model()
    http = srv.serve(model, host="127.0.0.1", port=0, max_batch=4, batch_window_ms=50)
    port = http.server_address[1]
    thread = threading.Thread(target=http.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}"
    http.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/v1/synthesize",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        return resp.status, resp.headers.get("Content-Type"), resp.read()


def test_healthz_and_model(running_server):
    with urllib.request.urlopen(running_server + "/healthz") as resp:
        assert json.loads(resp.read())["status"] == "ok"
    with urllib.request.urlopen(running_server + "/v1/model") as resp:
        info = json.loads(resp.read())
    assert info["sample_rate"] == 24000
    assert info["preset_speakers"] is True


def test_synthesize_returns_wav(running_server):
    status, ctype, body = _post(
        running_server, {"text": "hello server", "seed": 42, "max_frames": 6}
    )
    assert status == 200
    assert ctype == "audio/wav"
    assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
    assert len(body) > 44


def test_concurrent_requests_batched(running_server):
    """Concurrent requests coalesce into one vmapped batch and all succeed."""
    results = {}

    def worker(i):
        results[i] = _post(
            running_server,
            {"text": f"utterance {i}", "seed": 42 + i, "max_frames": 6},
        )

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert set(results) == {0, 1, 2}
    for status, ctype, body in results.values():
        assert status == 200 and body[:4] == b"RIFF"


def test_batched_matches_single_stream(running_server):
    """A request served inside a batch equals the same request served alone."""
    payload = {"text": "determinism", "seed": 7, "max_frames": 6}
    _, _, alone = _post(running_server, payload)

    results = {}

    def worker(i, p):
        results[i] = _post(running_server, p)

    threads = [
        threading.Thread(target=worker, args=(0, payload)),
        threading.Thread(
            target=worker, args=(1, {"text": "other", "seed": 99, "max_frames": 6})
        ),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results[0][2] == alone


def test_bad_request(running_server):
    req = urllib.request.Request(
        running_server + "/v1/synthesize",
        data=b"{not json",
        headers={"Content-Type": "application/json"},
    )
    try:
        urllib.request.urlopen(req, timeout=30)
        raise AssertionError("expected HTTPError")
    except urllib.error.HTTPError as e:
        assert e.code == 400
