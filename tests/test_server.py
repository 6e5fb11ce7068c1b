"""HTTP serving layer tests (tiny model, threaded server, real requests)."""

import json
import threading
import time
import urllib.request

import pytest

import tests.test_pipeline as tp
from qwen3_tts_tpu import server as srv

pytestmark = pytest.mark.slow  # heavy integration tier; `make test-fast` skips



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
    """A request served inside a batch equals the same request served alone.

    Transport-level smoke only: the tiny model's samples quantize to PCM16
    silence, so byte equality here cannot detect seed/options mixups — the
    float-level determinism checks live in
    test_mixed_options_not_cross_batched / test_unseeded_batch_requests_differ.
    """
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


def test_mixed_options_not_cross_batched():
    """A request with different sampling options keeps its own settings.

    Float-level check (the tiny random-weight model's samples are ~1e-9, so
    PCM16 WAV bytes quantize to silence and byte-comparisons at the HTTP
    layer would be vacuous): the temperature=0.2 request must be routed to
    its own group — not run with the defaults batch — and produce exactly
    the audio it produces when served alone.
    """
    import numpy as np

    from qwen3_tts_tpu.pipeline import SynthesisOptions

    model = tp.tiny_model()
    calls = []
    orig_b, orig_s = model.synthesize_batch, model.synthesize_with_voice

    def spy_batch(texts, speakers="ryan", languages="english", options=None, seeds=None, instructs=None):
        calls.append(("batch", tuple(texts), options.temperature))
        return orig_b(texts, speakers, languages, options, seeds=seeds, instructs=instructs)

    def spy_single(text, speaker="ryan", language="english", options=None):
        calls.append(("single", text, options.temperature))
        return orig_s(text, speaker, language, options)

    model.synthesize_batch = spy_batch
    model.synthesize_with_voice = spy_single

    alone = orig_s("cool", options=SynthesisOptions(max_length=6, seed=5, temperature=0.2))
    engine = srv.BatchingEngine(model, max_batch=8, batch_window_ms=300)
    reqs = [
        srv._Request("cool", "ryan", "english",
                     SynthesisOptions(max_length=6, seed=5, temperature=0.2)),
        srv._Request("other1", "ryan", "english", SynthesisOptions(max_length=6, seed=9)),
        srv._Request("other2", "ryan", "english", SynthesisOptions(max_length=6, seed=11)),
    ]
    threads = [threading.Thread(target=engine.submit, args=(r,)) for r in reqs]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert all(r.error is None for r in reqs)
    # The special request ran with ITS temperature, the others with theirs.
    temps = {kind: temp for kind, _, temp in calls}
    assert temps.get("single") == 0.2 or ("batch", ("cool",), 0.2) in calls
    np.testing.assert_array_equal(reqs[0].result, alone.samples)
    assert not np.array_equal(reqs[1].result, reqs[2].result)


def test_unseeded_batch_requests_differ():
    """Unseeded requests in one batch draw distinct time-entropy seeds."""
    import numpy as np

    from qwen3_tts_tpu.pipeline import SynthesisOptions

    model = tp.tiny_model()
    engine = srv.BatchingEngine(model, max_batch=8, batch_window_ms=300)
    reqs = [
        srv._Request("zz", "ryan", "english", SynthesisOptions(max_length=6))
        for _ in range(2)
    ]
    threads = [threading.Thread(target=engine.submit, args=(r,)) for r in reqs]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r.error is None for r in reqs)
    assert not np.array_equal(reqs[0].result, reqs[1].result)


def test_options_signature_groups():
    """_collect partitions a window by sampling-options signature."""
    from qwen3_tts_tpu.pipeline import SynthesisOptions

    mk = lambda **kw: srv._Request("t", "ryan", "english", SynthesisOptions(**kw))
    a = srv.BatchingEngine._options_signature(mk(temperature=0.9, seed=1))
    b = srv.BatchingEngine._options_signature(mk(temperature=0.9, seed=2, max_length=64))
    c = srv.BatchingEngine._options_signature(mk(temperature=0.2))
    assert a == b  # seed/max_length do not split batches
    assert a != c  # temperature does


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


def test_streaming_endpoint_chunked_wav(running_server):
    """POST /v1/synthesize_streaming returns chunked WAV whose PCM payload
    reassembles to the non-streaming endpoint's PCM (sample-exact streaming
    decode; VERDICT r2 next-item 6)."""
    payload = {"text": "stream bytes", "seed": 42, "max_frames": 6, "chunk_frames": 3}
    _, _, batch_body = _post(running_server, payload)

    req = urllib.request.Request(
        running_server + "/v1/synthesize_streaming",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        assert resp.status == 200
        assert resp.headers.get("Content-Type") == "audio/wav"
        stream_body = resp.read()  # urllib de-chunks transparently

    assert stream_body[:4] == b"RIFF" and stream_body[8:12] == b"WAVE"
    # Identical PCM payload after the 44-byte headers.
    assert stream_body[44:] == batch_body[44:]
    assert len(stream_body) > 44


def test_streaming_engine_float_parity():
    """Engine-level float check (PCM16 quantizes the tiny model to silence):
    the streamed chunks concatenate to the non-streaming samples."""
    import numpy as np

    from qwen3_tts_tpu.pipeline import SynthesisOptions

    model = tp.tiny_model()
    opts = SynthesisOptions(max_length=6, seed=3, chunk_frames=2)
    alone = model.synthesize_with_voice("float parity", options=opts)

    engine = srv.BatchingEngine(model, max_batch=2, batch_window_ms=10)
    req = srv._StreamRequest("float parity", "ryan", "english", opts)
    engine.submit_stream(req)
    chunks = []
    while True:
        item = req.chunks.get(timeout=120)
        assert not isinstance(item, Exception)
        if item is None:
            break
        chunks.append(item)
    stream = np.concatenate(chunks)
    assert len(stream) == len(alone.samples)
    np.testing.assert_allclose(stream, alone.samples, rtol=0, atol=2e-6)


def _drain_stream(req, timeout=120):
    import numpy as np

    parts = []
    while True:
        item = req.chunks.get(timeout=timeout)
        assert not isinstance(item, Exception), item
        if item is None:
            break
        parts.append(item)
    return np.concatenate(parts) if parts else np.zeros(0, np.float32)


def test_concurrent_streams_share_one_batched_session():
    """Fresh streaming requests inside one batch window coalesce into a
    single StreamingBatchSession; each request still gets exactly its own
    audio, including its OWN max_length cap (the shared session runs to the
    group max and the engine trims per request)."""
    import numpy as np

    from dataclasses import replace

    from qwen3_tts_tpu.pipeline import SynthesisOptions

    model = tp.tiny_model()
    calls = []
    orig = model.synthesize_streaming_batch

    def spy(texts, speakers="ryan", languages="english", options=None, seeds=None, instructs=None):
        calls.append((tuple(texts), tuple(seeds), options.max_length))
        return orig(texts, speakers, languages, options, seeds=seeds)

    model.synthesize_streaming_batch = spy

    engine = srv.BatchingEngine(model, max_batch=4, batch_window_ms=300)
    opts1 = SynthesisOptions(max_length=8, seed=5, chunk_frames=2)
    opts2 = SynthesisOptions(max_length=6, seed=9, chunk_frames=2)
    r1 = srv._StreamRequest("stream one", "ryan", "english", opts1)
    r2 = srv._StreamRequest("stream two", "ryan", "english", opts2)
    engine.submit_stream(r1)
    engine.submit_stream(r2)
    s1, s2 = _drain_stream(r1), _drain_stream(r2)

    assert calls == [(("stream one", "stream two"), (5, 9), 8)]
    # Parity incl. r2's smaller max_length: generated frames are
    # frame_limit-independent before EOS, so the host-side trim equals a
    # solo run at max_length=6.
    a1 = model.synthesize_with_voice("stream one", options=opts1)
    a2 = model.synthesize_with_voice("stream two", options=opts2)
    assert len(s1) == len(a1.samples) and len(s2) == len(a2.samples)
    np.testing.assert_allclose(s1, a1.samples, rtol=0, atol=2e-5)
    np.testing.assert_allclose(s2, a2.samples, rtol=0, atol=2e-5)


def test_mismatched_streams_not_grouped():
    """Streams with different chunk cadence cannot share a session."""
    from qwen3_tts_tpu.pipeline import SynthesisOptions

    model = tp.tiny_model()
    batch_calls = []
    orig = model.synthesize_streaming_batch
    model.synthesize_streaming_batch = lambda *a, **k: (
        batch_calls.append(1) or orig(*a, **k)
    )

    engine = srv.BatchingEngine(model, max_batch=4, batch_window_ms=200)
    r1 = srv._StreamRequest(
        "one", "ryan", "english", SynthesisOptions(max_length=4, seed=1, chunk_frames=2)
    )
    r2 = srv._StreamRequest(
        "two", "ryan", "english", SynthesisOptions(max_length=4, seed=2, chunk_frames=3)
    )
    engine.submit_stream(r1)
    engine.submit_stream(r2)
    out1, out2 = _drain_stream(r1), _drain_stream(r2)
    assert not batch_calls  # ran as two solo sessions
    assert len(out1) > 0 and len(out2) > 0


def _engine_no_worker(model=None, max_batch=4, batch_window_ms=50.0,
                      stream_window_ms=None):
    """BatchingEngine with fields initialized but NO worker thread, so
    _collect can be unit-tested deterministically against a hand-built
    queue."""
    from collections import deque

    e = srv.BatchingEngine.__new__(srv.BatchingEngine)
    e.model = model
    e.max_batch = max_batch
    e.batch_window_s = batch_window_ms / 1e3
    e.stream_window_s = (
        e.batch_window_s if stream_window_ms is None else stream_window_ms / 1e3
    )
    import queue as queue_mod

    e.queue = queue_mod.Queue()
    e._deferred = deque()
    return e


def test_collect_defers_stream_group_from_batch_window():
    """ADVICE r3 (high): a mid-flight _StreamGroup popped during a
    non-streaming batch window must be deferred (it has no .options), not
    appended to the batch — pre-fix this raised AttributeError in
    _options_signature and killed the engine worker."""
    from qwen3_tts_tpu.pipeline import SynthesisOptions

    eng = _engine_no_worker(batch_window_ms=200)
    breq = srv._Request("batch job", "ryan", "english", SynthesisOptions(max_length=4))
    sreq = srv._StreamRequest("s", "ryan", "english", SynthesisOptions(max_length=4))
    grp = srv._StreamGroup(reqs=[sreq], frames_pushed=[0], alive=[True])
    later = srv._Request("later", "ryan", "english", SynthesisOptions(max_length=4))
    eng.queue.put(breq)
    eng.queue.put(grp)
    eng.queue.put(later)

    groups = eng._collect()
    assert groups == [[breq]]
    # The group kept its FIFO position: it runs on the NEXT visit, before
    # "later" which arrived after it.
    assert list(eng._deferred) == [grp]
    nxt = eng._collect()
    assert nxt == [[grp]]
    assert eng._collect() == [[later]]


def test_collect_defers_solo_stream_fifo():
    """ADVICE r3 (low): an item displaced from a collection window runs
    immediately after the group (FIFO preserved), not at the queue tail."""
    from qwen3_tts_tpu.pipeline import SynthesisOptions

    eng = _engine_no_worker(batch_window_ms=200, stream_window_ms=200)
    s1 = srv._StreamRequest("a", "ryan", "english",
                            SynthesisOptions(max_length=4, chunk_frames=2))
    b1 = srv._Request("b", "ryan", "english", SynthesisOptions(max_length=4))
    s2 = srv._StreamRequest("c", "ryan", "english",
                            SynthesisOptions(max_length=4, chunk_frames=2))
    eng.queue.put(s1)
    eng.queue.put(b1)  # displaced from s1's stream window
    eng.queue.put(s2)

    assert eng._collect() == [[s1]]  # solo: b1 broke the coalesce loop
    assert eng._collect() == [[b1]]  # ...but b1 still runs before s2
    assert eng._collect() == [[s2]]


def test_collect_stream_window_zero_disables_coalescing():
    """ADVICE r3 (low): stream_window_ms=0 starts fresh streams immediately
    (no TTFA tax) — no peer wait, no batched session."""
    from qwen3_tts_tpu.pipeline import SynthesisOptions

    eng = _engine_no_worker(stream_window_ms=0)
    s1 = srv._StreamRequest("a", "ryan", "english", SynthesisOptions(max_length=4))
    s2 = srv._StreamRequest("b", "ryan", "english", SynthesisOptions(max_length=4))
    eng.queue.put(s1)
    eng.queue.put(s2)
    t0 = time.monotonic()
    assert eng._collect() == [[s1]]
    assert time.monotonic() - t0 < 0.5  # did not wait out any window
    assert eng._collect() == [[s2]]


def test_legacy_streaming_exact_false_never_coalesces():
    """ADVICE r3 (low): streaming_exact=False requests run solo (the batched
    session always uses the exact streaming vocoder, so coalescing a legacy
    request would change its audio depending on peer arrival)."""
    import numpy as np

    from qwen3_tts_tpu.pipeline import SynthesisOptions

    model = tp.tiny_model()
    batch_calls = []
    orig = model.synthesize_streaming_batch
    model.synthesize_streaming_batch = lambda *a, **k: (
        batch_calls.append(1) or orig(*a, **k)
    )

    engine = srv.BatchingEngine(model, max_batch=4, batch_window_ms=200)
    opts = dict(max_length=4, chunk_frames=2, streaming_exact=False)
    r1 = srv._StreamRequest("one", "ryan", "english",
                            SynthesisOptions(seed=1, **opts))
    r2 = srv._StreamRequest("two", "ryan", "english",
                            SynthesisOptions(seed=2, **opts))
    engine.submit_stream(r1)
    engine.submit_stream(r2)
    out1, out2 = _drain_stream(r1), _drain_stream(r2)
    assert not batch_calls  # ran as two solo legacy sessions
    assert len(out1) > 0 and len(out2) > 0
    # Solo legacy audio is what a standalone legacy session produces.
    solo = model.synthesize_streaming(
        "one", "ryan", "english", SynthesisOptions(seed=1, **opts)
    )
    ref = np.concatenate([np.asarray(c.samples) for c in solo])
    np.testing.assert_allclose(out1, ref, rtol=0, atol=2e-6)


def test_mixed_traffic_batch_during_stream_group():
    """End-to-end ADVICE r3 (high) regression: a non-streaming request
    arriving while a coalesced stream group is mid-flight must complete, and
    the group's streams must keep streaming to EOS (pre-fix the engine
    worker died and everything hung)."""
    import numpy as np

    from qwen3_tts_tpu.pipeline import SynthesisOptions

    model = tp.tiny_model()
    engine = srv.BatchingEngine(model, max_batch=4, batch_window_ms=100)

    gate = threading.Event()
    slices = [0]
    real_slice = engine._run_stream_group_slice

    def spy_slice(grp):
        slices[0] += 1
        if slices[0] == 2:
            # Hold the worker at the second group slice until the batch
            # request is queued, so the pop order below is deterministic:
            # after this slice the queue is [batch_req, group].
            gate.wait(30)
        real_slice(grp)

    engine._run_stream_group_slice = spy_slice

    opts = SynthesisOptions(max_length=8, seed=5, chunk_frames=2)
    r1 = srv._StreamRequest("stream one", "ryan", "english", opts)
    r2 = srv._StreamRequest(
        "stream two", "ryan", "english",
        SynthesisOptions(max_length=8, seed=9, chunk_frames=2),
    )
    engine.submit_stream(r1)
    engine.submit_stream(r2)
    # Wait for the first chunks (group formed + first slice done).
    first1 = r1.chunks.get(timeout=120)
    assert isinstance(first1, np.ndarray)

    breq = srv._Request(
        "quick job", "ryan", "english", SynthesisOptions(max_length=4, seed=6)
    )
    engine.queue.put(breq)
    gate.set()
    assert breq.done.wait(120)
    assert breq.error is None and breq.result is not None

    rest1 = _drain_stream(r1)
    rest2 = _drain_stream(r2)
    total1 = np.concatenate([first1, rest1])
    a1 = model.synthesize_with_voice("stream one", options=opts)
    assert len(total1) == len(a1.samples)
    assert len(rest2) > 0


def test_streaming_time_slices_interleave_with_batch():
    """A streaming session yields the device between chunks: a batch request
    submitted mid-stream runs before the stream finishes (chunk-granularity
    round-robin, not whole-session head-of-line blocking)."""
    import numpy as np

    from qwen3_tts_tpu.pipeline import SynthesisOptions

    model = tp.tiny_model()
    engine = srv.BatchingEngine(model, max_batch=2, batch_window_ms=5)

    order = []
    gate = threading.Event()
    slices = [0]
    real_slice = engine._run_stream_slice

    def spy_slice(req):
        slices[0] += 1
        if slices[0] == 2:
            # Hold the worker at the second slice until the batch job is
            # queued, so the interleaving below is deterministic.
            gate.wait(30)
        order.append("slice")
        real_slice(req)

    engine._run_stream_slice = spy_slice

    real_syn = model.synthesize_with_voice

    def spy_syn(*a, **k):
        order.append("batch")
        return real_syn(*a, **k)

    model.synthesize_with_voice = spy_syn

    sreq = srv._StreamRequest(
        "long stream", "ryan", "english",
        SynthesisOptions(max_length=8, seed=5, chunk_frames=2),
    )
    engine.submit_stream(sreq)
    first = sreq.chunks.get(timeout=120)
    assert isinstance(first, np.ndarray)

    breq = srv._Request(
        "quick job", "ryan", "english", SynthesisOptions(max_length=4, seed=6)
    )
    engine.queue.put(breq)  # enqueue while the stream still has slices left
    gate.set()
    assert breq.done.wait(120) and breq.error is None

    while True:  # drain the stream to completion
        item = sreq.chunks.get(timeout=120)
        assert not isinstance(item, Exception)
        if item is None:
            break

    i = order.index("batch")
    assert "slice" in order[:i], order  # stream started first
    assert "slice" in order[i + 1:], order  # ...and resumed after the batch job


def test_main_rejects_w8a8_without_int8(capsys):
    """--w8a8 alone must argparse-error (matching Qwen3TTS's ValueError for
    int8_activations without quantize_int8), not silently serve bf16."""
    with pytest.raises(SystemExit) as exc:
        srv.main(["--model-dir", "/nonexistent", "--w8a8"])
    assert exc.value.code == 2
    assert "--w8a8 requires --int8" in capsys.readouterr().err


# ---------------------------------------------------------------------------
# Clone / voice-design serving (VERDICT r4 #4: batched ICL-clone serving)
# ---------------------------------------------------------------------------


def _icl_prompt(seed=1, n_ref=4, n_text=2):
    import numpy as np

    from qwen3_tts_tpu.pipeline import VoiceClonePrompt

    rs = np.random.RandomState(seed)
    return VoiceClonePrompt(
        speaker_embedding=rs.randn(64).astype(np.float32),
        ref_codes=rs.randint(0, 128, size=(n_ref, 16)).astype(np.int32),
        ref_text_ids=[int(x) for x in rs.randint(3, 50, size=n_text)],
    )


def test_layout_signature_separation():
    """Preset and x-vector clones share the basic layout group; ICL clones
    and voice-design requests each get their own group."""
    import numpy as np

    from qwen3_tts_tpu.pipeline import SynthesisOptions, VoiceClonePrompt

    opts = SynthesisOptions(max_length=6, seed=1)
    sig = srv.BatchingEngine._options_signature
    xv = VoiceClonePrompt(np.zeros(64, np.float32))
    preset = sig(srv._Request("t", "ryan", "english", opts))
    xvec = sig(srv._Request("t", xv, "english", opts))
    icl = sig(srv._Request("t", _icl_prompt(), "english", opts))
    design = sig(srv._Request("t", "ryan", "english", opts, instruct="deep voice"))
    assert preset == xvec
    assert len({preset, icl, design}) == 3


def test_clone_requests_coalesce_and_match_library():
    """Concurrent ICL clone requests run as ONE synthesize_batch call with
    VoiceClonePrompt entries, and each result equals the library's output."""
    import numpy as np

    from qwen3_tts_tpu.pipeline import SynthesisOptions

    model = tp.tiny_model()
    calls = []
    orig = model.synthesize_batch

    def spy(texts, speakers="ryan", languages="english", options=None,
            seeds=None, instructs=None):
        calls.append((tuple(texts), list(speakers)))
        return orig(texts, speakers, languages, options, seeds=seeds,
                    instructs=instructs)

    model.synthesize_batch = spy
    engine = srv.BatchingEngine(model, max_batch=4, batch_window_ms=300)
    p1, p2 = _icl_prompt(1), _icl_prompt(2, n_ref=2, n_text=3)
    opts = SynthesisOptions(max_length=6, seed=5)
    reqs = [
        srv._Request("clone one", p1, "english", opts),
        srv._Request("clone two", p2, "english", opts),
    ]
    threads = [threading.Thread(target=engine.submit, args=(r,)) for r in reqs]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r.error is None for r in reqs)
    assert len(calls) == 1 and calls[0][1] == [p1, p2]
    # The engine passes each request's OWN seed (both 5 here).
    want = model.synthesize_batch(
        ["clone one", "clone two"], [p1, p2], ["english"] * 2, opts,
        seeds=[5, 5],
    )
    np.testing.assert_array_equal(reqs[0].result, want[0].samples)
    np.testing.assert_array_equal(reqs[1].result, want[1].samples)


def test_solo_clone_and_design_routing():
    """Singleton clone/design requests take the dedicated solo paths."""
    import numpy as np

    from qwen3_tts_tpu.pipeline import SynthesisOptions

    model = tp.tiny_model()
    opts = SynthesisOptions(max_length=6, seed=3)
    engine = srv.BatchingEngine(model, max_batch=4, batch_window_ms=10)
    p = _icl_prompt(4)
    r1 = srv._Request("solo clone", p, "english", opts)
    engine.submit(r1)
    assert r1.error is None
    want = model.synthesize_voice_clone("solo clone", p, "english", opts)
    np.testing.assert_array_equal(r1.result, want.samples)

    r2 = srv._Request("solo design", "ryan", "english", opts, instruct="a calm voice")
    engine.submit(r2)
    assert r2.error is None
    want2 = model.synthesize_voice_design("solo design", "a calm voice", "english", opts)
    np.testing.assert_array_equal(r2.result, want2.samples)


def test_stream_group_clone_coalesces():
    """Concurrent ICL-clone streams coalesce into one batched session and
    each reassembled stream equals its synthesize_batch audio."""
    import numpy as np

    from qwen3_tts_tpu.pipeline import SynthesisOptions

    model = tp.tiny_model()
    sessions = []
    orig = model.synthesize_streaming_batch

    def spy(texts, speakers="ryan", languages="english", options=None,
            seeds=None, instructs=None):
        sessions.append(tuple(texts))
        return orig(texts, speakers, languages, options, seeds=seeds,
                    instructs=instructs)

    model.synthesize_streaming_batch = spy
    engine = srv.BatchingEngine(model, max_batch=4, batch_window_ms=300,
                                stream_window_ms=300)
    p1, p2 = _icl_prompt(6, n_ref=5), _icl_prompt(7, n_ref=2)
    opts = SynthesisOptions(max_length=8, seed=11, chunk_frames=3)
    r1 = srv._StreamRequest("clone stream a", p1, "english", opts)
    r2 = srv._StreamRequest("clone stream b", p2, "english", opts)
    engine.submit_stream(r1)
    engine.submit_stream(r2)
    s1, s2 = _drain_stream(r1), _drain_stream(r2)
    assert sessions == [("clone stream a", "clone stream b")]
    want = model.synthesize_batch(
        ["clone stream a", "clone stream b"], [p1, p2], ["english"] * 2,
        opts, seeds=[11, 11],
    )
    np.testing.assert_allclose(s1, want[0].samples, atol=2e-5, rtol=0)
    np.testing.assert_allclose(s2, want[1].samples, atol=2e-5, rtol=0)


def test_voice_registry_http_roundtrip():
    """POST /v1/voices registers a clone voice (encoded once); synthesize
    with voice_id and instruct route through the HTTP layer."""
    import base64
    import io as _io

    import numpy as np

    from qwen3_tts_tpu.audio.io import AudioBuffer
    from qwen3_tts_tpu.pipeline import VoiceClonePrompt

    model = tp.tiny_model()
    prompt = _icl_prompt(9)

    def fake_create(ref_audio, ref_text=None, pad_to_seconds=None):
        assert ref_audio.sample_rate == 24000
        return prompt

    model.create_voice_clone_prompt = fake_create
    http = srv.serve(model, host="127.0.0.1", port=0, max_batch=2,
                     batch_window_ms=10)
    port = http.server_address[1]
    threading.Thread(target=http.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        # WAV bytes for the reference audio
        buf = _io.BytesIO()
        import wave as _wave

        with _wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(24000)
            w.writeframes(
                (np.sin(np.linspace(0, 100, 24000)) * 20000).astype("<i2").tobytes()
            )
        reg = urllib.request.Request(
            base + "/v1/voices",
            data=json.dumps(
                {"audio_b64": base64.b64encode(buf.getvalue()).decode(),
                 "ref_text": "reference words"}
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(reg, timeout=60) as resp:
            out = json.loads(resp.read())
        assert out["icl"] is True
        vid = out["voice_id"]

        with urllib.request.urlopen(base + "/v1/voices") as resp:
            assert vid in json.loads(resp.read())["voices"]

        status, ctype, body = _post(
            base, {"text": "cloned speech", "voice_id": vid, "seed": 4,
                   "max_frames": 6},
        )
        assert status == 200 and body[:4] == b"RIFF"

        status, _, body = _post(
            base, {"text": "designed speech", "instruct": "a warm voice",
                   "seed": 4, "max_frames": 6},
        )
        assert status == 200 and body[:4] == b"RIFF"

        # unknown voice_id -> 400; voice_id + instruct -> 400
        for payload in (
            {"text": "x", "voice_id": "nope"},
            {"text": "x", "voice_id": vid, "instruct": "y"},
        ):
            try:
                _post(base, payload)
                raise AssertionError("expected HTTPError")
            except urllib.error.HTTPError as e:
                assert e.code == 400
    finally:
        http.shutdown()


def test_voice_registry_conflict_without_encoder():
    """Registration on a model without a speaker encoder returns 409."""
    import base64

    model = tp.tiny_model()  # no speaker encoder
    http = srv.serve(model, host="127.0.0.1", port=0)
    port = http.server_address[1]
    threading.Thread(target=http.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/voices",
            data=json.dumps({"audio_b64": base64.b64encode(b"").decode()}).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            raise AssertionError("expected HTTPError")
        except urllib.error.HTTPError as e:
            assert e.code in (400, 409)
    finally:
        http.shutdown()
