"""Batched streaming sessions: B concurrent streams, one fused program/chunk.

Parity contract: each stream's concatenated chunks must equal its
``synthesize_batch`` output (which in turn equals its single-stream run,
tests/test_pipeline.py::test_synthesize_batch_matches_single) — same frame
counts exactly, samples to matmul-tiling ulps (the streaming vocoder and the
bucketed batch decode tile their matmuls differently).
"""

import numpy as np
import pytest

from qwen3_tts_tpu import tokens as T
from qwen3_tts_tpu.pipeline import SynthesisOptions

from test_pipeline import tiny_model

pytestmark = pytest.mark.slow  # heavy integration tier; `make test-fast` skips



@pytest.fixture(scope="module")
def model():
    return tiny_model()


def collect(session):
    """Drain a StreamingBatchSession -> per-stream sample arrays + #chunks."""
    parts = [[] for _ in range(session.batch)]
    none_seen = [False] * session.batch
    rounds = 0
    for chunks in session:
        rounds += 1
        assert len(chunks) == session.batch
        for i, c in enumerate(chunks):
            if c is None:
                none_seen[i] = True
            else:
                # Once a stream yields None it must stay None (stream is dead).
                assert not none_seen[i], f"stream {i} resumed after None"
                assert c.sample_rate == T.OUTPUT_SAMPLE_RATE
                assert len(c) % T.SAMPLES_PER_FRAME == 0
                parts[i].append(c.samples)
        assert rounds < 200, "session failed to terminate"
    assert session.is_done()
    assert session.next_chunks() is None
    return [
        np.concatenate(p) if p else np.zeros(0, np.float32) for p in parts
    ], rounds


@pytest.mark.parametrize("lookahead", [0, 1])
def test_streaming_batch_matches_synthesize_batch(model, lookahead):
    texts = ["First utterance", "Second one differs a bit", "Third!"]
    opts = SynthesisOptions(
        max_length=12,
        seed=42,
        chunk_frames=3,
        first_chunk_frames=2,
        streaming_lookahead=lookahead,
    )
    streamed, _ = collect(model.synthesize_streaming_batch(texts, options=opts))
    batch = model.synthesize_batch(texts, options=opts)
    for i in range(len(texts)):
        assert len(streamed[i]) == len(batch[i]), f"stream {i} frame count"
        np.testing.assert_allclose(
            streamed[i], batch[i].samples, atol=2e-5, rtol=0,
            err_msg=f"stream {i}",
        )


def test_streaming_batch_uneven_eos(model):
    """Streams that hit EOS early yield None while the others continue."""
    texts = ["aaaa", "bbbb", "cccc", "dddd"]
    opts = SynthesisOptions(max_length=16, seed=7, chunk_frames=4)
    session = model.synthesize_streaming_batch(texts, options=opts)
    streamed, rounds = collect(session)
    batch = model.synthesize_batch(texts, options=opts)
    frame_counts = {len(b) // T.SAMPLES_PER_FRAME for b in batch}
    for i in range(len(texts)):
        assert len(streamed[i]) == len(batch[i])
        np.testing.assert_allclose(streamed[i], batch[i].samples, atol=2e-5, rtol=0)
    # The session runs until the LONGEST stream finishes.
    assert rounds >= (max(frame_counts) + 3) // 4


def test_streaming_batch_max_length_partial_final_chunk(model):
    """max_length not a multiple of chunk_frames: final partial chunk exact."""
    texts = ["partial chunk one", "partial chunk two"]
    opts = SynthesisOptions(
        max_length=11, seed=3, chunk_frames=4, first_chunk_frames=None,
        min_new_tokens=11,  # force every stream to run to max_length
    )
    streamed, _ = collect(model.synthesize_streaming_batch(texts, options=opts))
    batch = model.synthesize_batch(texts, options=opts)
    for i in range(len(texts)):
        assert len(streamed[i]) == 11 * T.SAMPLES_PER_FRAME
        np.testing.assert_allclose(streamed[i], batch[i].samples, atol=2e-5, rtol=0)
