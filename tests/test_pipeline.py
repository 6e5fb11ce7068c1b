"""End-to-end pipeline tests on tiny random models (all variants, streaming)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu import tokens as T
from qwen3_tts_tpu.models import weights as W
from qwen3_tts_tpu.models.codec import vocoder
from qwen3_tts_tpu.models.config import (
    CodePredictorConfig,
    ModelConfig,
    ModelType,
    TalkerConfig,
)
from qwen3_tts_tpu.pipeline import Qwen3TTS, SynthesisOptions, VoiceClonePrompt


class FakeTokenizer:
    """Deterministic stand-in: maps characters to small token ids."""

    def encode(self, text: str) -> list[int]:
        return [(3 + (ord(c) % 50)) for c in text[:12]] or [5]


TINY_TALKER = TalkerConfig(
    text_embed_dim=32,
    hidden_size=64,
    text_proj_intermediate=32,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
)
TINY_CP = CodePredictorConfig(
    hidden_size=64,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    vocab_size=128,
)
TINY_VOC = vocoder.VocoderConfig(
    codebook_dim=16,
    latent_dim=24,
    hidden_size=16,
    num_layers=2,
    num_heads=2,
    head_dim=8,
    intermediate_size=32,
    codebook_size=2048,
    codebook_embed_dim=8,
    decoder_dim=32,
)

OPTS = SynthesisOptions(max_length=8, seed=42)


def tiny_model(variant=ModelType.CUSTOM_VOICE, dtype=jnp.float32) -> Qwen3TTS:
    cfg = ModelConfig(
        model_type=variant, model_size="0b6", talker=TINY_TALKER, code_predictor=TINY_CP
    )
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    return Qwen3TTS(
        cfg,
        W.init_talker_params(k1, TINY_TALKER, dtype),
        W.init_code_predictor_params(k2, TINY_CP, dtype),
        vocoder.init_vocoder_params(k3, TINY_VOC),
        FakeTokenizer(),
        vocoder_config=TINY_VOC,
    )


@pytest.fixture(scope="module")
def model():
    return tiny_model()


def test_synthesize_with_voice(model):
    audio, timing = model.synthesize_with_timing("Hello world", "ryan", "english", OPTS)
    assert audio.sample_rate == 24000
    assert timing.generation_frames > 0
    assert len(audio) == timing.generation_frames * T.SAMPLES_PER_FRAME
    assert np.isfinite(audio.samples).all()


def test_synthesize_deterministic(model):
    a1 = model.synthesize_with_voice("Same text", "ryan", "english", OPTS)
    a2 = model.synthesize_with_voice("Same text", "ryan", "english", OPTS)
    np.testing.assert_array_equal(a1.samples, a2.samples)


def test_streaming_frame_parity(model):
    """Streaming must produce the same frame count as batch (same seed)."""
    _, timing = model.synthesize_with_timing("Stream me", "ryan", "english", OPTS)
    session = model.synthesize_streaming("Stream me", "ryan", "english",
                                         SynthesisOptions(max_length=8, seed=42, chunk_frames=3))
    chunks = list(session)
    total = sum(len(c) for c in chunks)
    assert total == timing.generation_frames * T.SAMPLES_PER_FRAME
    assert all(c.sample_rate == 24000 for c in chunks)
    assert len(chunks) >= 1


def test_max_length_over_ceiling_clamped(model):
    """max_length beyond the largest frame bucket is clamped, not allowed to
    overrun the frames buffer (which would corrupt the final frame)."""
    from qwen3_tts_tpu.pipeline import FRAME_BUCKETS

    from qwen3_tts_tpu.pipeline import GROWTH_INITIAL_FRAMES

    opts = SynthesisOptions(max_length=FRAME_BUCKETS[-1] + 1000, seed=42)
    session = model.synthesize_streaming("clamp me", "ryan", "english", opts)
    assert session.options.max_length == FRAME_BUCKETS[-1]
    # Buffers start at the growth tier and expand on demand (never beyond
    # the clamped ceiling).
    assert session.state.frames.shape[0] == GROWTH_INITIAL_FRAMES
    with pytest.raises(ValueError):
        model.synthesize_streaming(
            "bad", "ryan", "english", SynthesisOptions(max_length=0)
        )


def test_frame_limit_capped_at_buffer(model):
    """Even a raw over-budget frame_limit cannot write past the buffer."""
    import jax.numpy as jnp

    session = model.synthesize_streaming(
        "tiny buffer", "ryan", "english", SynthesisOptions(max_length=8, seed=1)
    )
    # Bypass the options clamp: drive the loop with an absurd frame limit.
    session._advance(10_000)
    n = int(session.state.frame_idx)
    assert n <= session.state.frames.shape[0]


def test_voice_design(model):
    audio = model.synthesize_voice_design("Hi", "a deep calm voice", "english", OPTS)
    assert len(audio) % T.SAMPLES_PER_FRAME == 0
    assert len(audio) > 0


def test_voice_clone_xvector(model):
    prompt = VoiceClonePrompt(
        speaker_embedding=np.random.RandomState(0).randn(64).astype(np.float32)
    )
    audio, frames = model.synthesize_voice_clone_debug("Clone", prompt, "english", OPTS)
    assert frames.shape[1] == 16
    assert len(audio) == frames.shape[0] * T.SAMPLES_PER_FRAME


def test_voice_clone_icl(model):
    rs = np.random.RandomState(1)
    prompt = VoiceClonePrompt(
        speaker_embedding=rs.randn(64).astype(np.float32),
        ref_codes=rs.randint(0, 128, size=(6, 16)).astype(np.int32),
        ref_text_ids=[7, 9, 11],
    )
    audio, frames = model.synthesize_voice_clone_debug("ICL", prompt, "english", OPTS)
    assert frames.shape[0] > 0
    # ICL proportional cut removes the reference-audio prefix
    total = frames.shape[0] + 6
    expected = total * T.SAMPLES_PER_FRAME - (6 * total * T.SAMPLES_PER_FRAME) // total
    assert len(audio) == expected


def test_voice_clone_streaming_xvector(model):
    """Streaming clone must match the non-streaming clone's frame count and
    per-chunk sample accounting (VERDICT r1 missing-item 3)."""
    prompt = VoiceClonePrompt(
        speaker_embedding=np.random.RandomState(4).randn(64).astype(np.float32)
    )
    _, frames = model.synthesize_voice_clone_debug("Clone me", prompt, "english", OPTS)
    session = model.synthesize_voice_clone_streaming(
        "Clone me", prompt, "english",
        SynthesisOptions(max_length=8, seed=42, chunk_frames=3),
    )
    chunks = list(session)
    total = sum(len(c) for c in chunks)
    assert total == frames.shape[0] * T.SAMPLES_PER_FRAME
    assert all(c.sample_rate == 24000 for c in chunks)


@pytest.mark.slow
def test_voice_clone_streaming_icl_front_cut(model):
    """ICL streaming: the reference-audio context is cut from chunk 1 exactly
    (each chunk yields chunk_frames * 1920 samples, ref frames excluded)."""
    rs = np.random.RandomState(3)
    n_ref = 5
    prompt = VoiceClonePrompt(
        speaker_embedding=rs.randn(64).astype(np.float32),
        ref_codes=rs.randint(0, 128, size=(n_ref, 16)).astype(np.int32),
        ref_text_ids=[7, 9],
    )
    opts = SynthesisOptions(max_length=8, seed=42, chunk_frames=3)
    session = model.synthesize_voice_clone_streaming("ICL stream", prompt, "english", opts)
    assert session.prefix_codes is not None and len(session.prefix_codes) == n_ref
    chunks = list(session)
    # Frame parity with the batch ICL path (same seed/options => same codes).
    _, frames = model.synthesize_voice_clone_debug("ICL stream", prompt, "english", opts)
    assert sum(len(c) for c in chunks) == frames.shape[0] * T.SAMPLES_PER_FRAME
    # No chunk leaks the reference prefix.
    for c in chunks:
        assert len(c) % T.SAMPLES_PER_FRAME == 0
        assert len(c) <= opts.chunk_frames * T.SAMPLES_PER_FRAME


def test_voice_clone_icl_sequential(model):
    from dataclasses import replace

    rs = np.random.RandomState(2)
    prompt = VoiceClonePrompt(
        speaker_embedding=rs.randn(64).astype(np.float32),
        ref_codes=rs.randint(0, 128, size=(5, 16)).astype(np.int32),
        ref_text_ids=[4, 6],
    )
    opts = replace(OPTS, icl_sequential=True)
    audio, frames = model.synthesize_voice_clone_debug("SeqICL", prompt, "english", opts)
    assert frames.shape[0] > 0
    # sequential vs overlay layouts condition differently -> usually different codes
    audio2, frames2 = model.synthesize_voice_clone_debug("SeqICL", prompt, "english", OPTS)
    assert frames.shape != frames2.shape or not np.array_equal(frames, frames2)


def test_synthesize_batch_matches_single(model):
    """Each batched stream reproduces its single-stream output (seed + i)."""
    texts = ["First utterance", "Second one differs"]
    batch = model.synthesize_batch(texts, options=OPTS)
    assert len(batch) == 2
    from dataclasses import replace

    for i, text in enumerate(texts):
        single = model.synthesize_with_voice(
            text, "ryan", "english", replace(OPTS, seed=OPTS.seed + i)
        )
        assert len(batch[i]) == len(single)
        np.testing.assert_array_equal(batch[i].samples, single.samples)


def test_capability_probes():
    m = tiny_model(ModelType.CUSTOM_VOICE)
    assert m.supports_preset_speakers()
    assert not m.supports_voice_design()
    assert not m.supports_voice_cloning()  # no speaker encoder attached
    vd = tiny_model(ModelType.VOICE_DESIGN)
    assert vd.supports_voice_design()
    assert not vd.supports_preset_speakers()


@pytest.mark.slow
def test_segmented_growth_token_exact(model, monkeypatch):
    """Cache growth across segments must not change a single code.

    max_length 300 with GROWTH_INITIAL_FRAMES=256 runs one growth boundary
    (256 -> 512); the result must equal a session given full-size buffers
    from the start (uniform stream and positions are capacity-independent).
    """
    import qwen3_tts_tpu.pipeline as pl

    opts = SynthesisOptions(max_length=300, seed=42, min_new_tokens=300)
    grown = model.synthesize_streaming("grow me", "ryan", "english", opts)
    assert grown.state.frames.shape[0] == 256  # starts small
    frames_grown = grown.run_to_completion()

    monkeypatch.setattr(pl, "GROWTH_INITIAL_FRAMES", 4096)
    full = model.synthesize_streaming("grow me", "ryan", "english", opts)
    assert full.state.frames.shape[0] == 512  # full bucket from the start
    frames_full = full.run_to_completion()

    np.testing.assert_array_equal(frames_grown, frames_full)


@pytest.mark.slow
def test_segmented_growth_streaming_chunks(model):
    """Chunked pull across a growth boundary stays frame-exact."""
    opts = SynthesisOptions(max_length=280, seed=7, min_new_tokens=280, chunk_frames=100)
    session = model.synthesize_streaming("chunks", "ryan", "english", opts)
    chunks = list(session)
    total = sum(len(c) for c in chunks)
    assert total == 280 * T.SAMPLES_PER_FRAME


def test_streaming_sample_exact_vs_batch(model):
    """Default streaming (streaming_exact=True): the concatenated chunk audio
    must equal decode_codes(frames) — not just frame-count parity (VERDICT
    r2 next-item 2). Tolerance covers matmul-tiling ulps only."""
    opts = SynthesisOptions(max_length=8, seed=42, chunk_frames=3)
    session = model.synthesize_streaming("exact stream", "ryan", "english", opts)
    chunks = [np.asarray(c.samples) for c in session]
    stream = np.concatenate(chunks)

    session2 = model.synthesize_streaming("exact stream", "ryan", "english", opts)
    frames = session2.run_to_completion()
    batch = model.decode_codes(frames)
    assert len(stream) == len(batch.samples)
    np.testing.assert_allclose(stream, batch.samples, rtol=0, atol=2e-6)


@pytest.mark.slow
def test_streaming_sample_exact_with_growth(model):
    """Exact streaming across a buffer-growth tier boundary (the KV pad path
    in StreamingSession._grow)."""
    import qwen3_tts_tpu.pipeline as P

    old_buckets, old_initial = P.FRAME_BUCKETS, P.GROWTH_INITIAL_FRAMES
    P.FRAME_BUCKETS, P.GROWTH_INITIAL_FRAMES = (4, 8, 16), 4
    try:
        opts = SynthesisOptions(max_length=10, seed=11, chunk_frames=3)
        session = model.synthesize_streaming("grow exact", "ryan", "english", opts)
        stream = np.concatenate([np.asarray(c.samples) for c in session])
        opts2 = SynthesisOptions(max_length=10, seed=11, chunk_frames=3)
        session2 = model.synthesize_streaming("grow exact", "ryan", "english", opts2)
        frames = session2.run_to_completion()
        batch = model.decode_codes(frames)
        assert len(stream) == len(batch.samples)
        np.testing.assert_allclose(stream, batch.samples, rtol=0, atol=2e-6)
    finally:
        P.FRAME_BUCKETS, P.GROWTH_INITIAL_FRAMES = old_buckets, old_initial


def test_streaming_exact_icl_prefix(model):
    """Exact streaming with an ICL reference prefix: the prefix advances the
    vocoder state without being emitted, so the stream equals the batch
    decode of [prefix || frames] minus the prefix samples."""
    rs = np.random.RandomState(9)
    n_ref = 7
    prompt = VoiceClonePrompt(
        speaker_embedding=rs.randn(64).astype(np.float32),
        ref_codes=rs.randint(0, 128, size=(n_ref, 16)).astype(np.int32),
        ref_text_ids=[7, 9],
    )
    opts = SynthesisOptions(max_length=8, seed=42, chunk_frames=3)
    session = model.synthesize_voice_clone_streaming("icl exact", prompt, "english", opts)
    stream = np.concatenate([np.asarray(c.samples) for c in session])

    opts2 = SynthesisOptions(max_length=8, seed=42, chunk_frames=3)
    session2 = model.synthesize_voice_clone_streaming("icl exact", prompt, "english", opts2)
    frames = session2.run_to_completion()
    combined = np.concatenate([prompt.ref_codes, frames], axis=0)
    batch = model.decode_codes(combined)
    expect = np.asarray(batch.samples)[n_ref * T.SAMPLES_PER_FRAME :]
    assert len(stream) == len(expect)
    np.testing.assert_allclose(stream, expect, rtol=0, atol=2e-6)


@pytest.mark.slow
def test_streaming_lookahead_parity(model):
    """Speculative dispatch-ahead (streaming_lookahead, journal R3.6) must
    not change a sample: the chunk stream with lookahead=2 equals the
    strictly-serial lookahead=0 stream chunk-for-chunk, including the tail
    where speculative programs past EOS/max_length are discarded."""
    base = dict(max_length=9, seed=5, chunk_frames=2, first_chunk_frames=None)
    s0 = model.synthesize_streaming(
        "spec", "ryan", "english", SynthesisOptions(streaming_lookahead=0, **base)
    )
    a0 = [np.asarray(c.samples) for c in s0]
    s2 = model.synthesize_streaming(
        "spec", "ryan", "english", SynthesisOptions(streaming_lookahead=2, **base)
    )
    a2 = [np.asarray(c.samples) for c in s2]
    assert len(a0) == len(a2)
    for x, y in zip(a0, a2):
        np.testing.assert_array_equal(x, y)


def test_streaming_lookahead_then_run_to_audio(model):
    """next_chunk() (which queues a speculative program) followed by
    run_to_audio() must still produce the complete utterance exactly once:
    the drained speculative chunk's audio belongs at the head of the
    run_to_audio output, and the stateful vocoder must not double-feed."""
    opts = SynthesisOptions(max_length=8, seed=42, chunk_frames=3)
    session = model.synthesize_streaming("mix", "ryan", "english", opts)
    first = session.next_chunk()
    assert session._pending  # a speculative program is in flight
    rest = session.run_to_audio()
    stream = np.concatenate([np.asarray(first.samples), np.asarray(rest.samples)])

    session2 = model.synthesize_streaming("mix", "ryan", "english", opts)
    frames = session2.run_to_completion()
    batch = model.decode_codes(frames)
    assert len(stream) == len(batch.samples)
    np.testing.assert_allclose(stream, batch.samples, rtol=0, atol=2e-6)


@pytest.mark.slow
def test_streaming_legacy_mode_still_available(model):
    """streaming_exact=False reproduces the reference's chunk-local decode."""
    opts = SynthesisOptions(max_length=8, seed=42, chunk_frames=3, streaming_exact=False)
    session = model.synthesize_streaming("legacy stream", "ryan", "english", opts)
    chunks = list(session)
    assert session.vstate is None
    _, timing = model.synthesize_with_timing(
        "legacy stream", "ryan", "english", SynthesisOptions(max_length=8, seed=42)
    )
    assert sum(len(c) for c in chunks) == timing.generation_frames * T.SAMPLES_PER_FRAME


def test_run_to_audio_matches_staged(model):
    """synthesize_with_voice routes through the pipelined run_to_audio path;
    it must match the staged decode_codes(run_to_completion()) path up to
    matmul-tiling ulps (the sample-exact vocoder contract)."""
    opts = SynthesisOptions(max_length=8, seed=42)
    audio = model.synthesize_with_voice("pipelined", "ryan", "english", opts)
    session = model._custom_voice_session(
        "pipelined", "ryan", "english", SynthesisOptions(max_length=8, seed=42)
    )
    frames = session.run_to_completion()
    batch = model.decode_codes(frames)
    assert len(audio) == len(batch.samples)
    np.testing.assert_allclose(audio.samples, batch.samples, rtol=0, atol=2e-6)


@pytest.mark.slow
def test_run_to_audio_multi_chunk_growth(model):
    """Pipelined path across several chunk programs and a buffer-growth tier
    boundary (speculative dispatch + drain ordering)."""
    import qwen3_tts_tpu.pipeline as P

    old = (P.FRAME_BUCKETS, P.GROWTH_INITIAL_FRAMES, P.DECODE_BUCKET)
    P.FRAME_BUCKETS, P.GROWTH_INITIAL_FRAMES, P.DECODE_BUCKET = (4, 8, 16), 4, 4
    try:
        opts = SynthesisOptions(max_length=10, seed=11)
        audio = model.synthesize_with_voice("pipelined growth", "ryan", "english", opts)
        session = model._custom_voice_session(
            "pipelined growth", "ryan", "english",
            SynthesisOptions(max_length=10, seed=11),
        )
        frames = session.run_to_completion()
        batch = model.decode_codes(frames)
        assert len(audio) == len(batch.samples)
        np.testing.assert_allclose(audio.samples, batch.samples, rtol=0, atol=2e-6)
    finally:
        P.FRAME_BUCKETS, P.GROWTH_INITIAL_FRAMES, P.DECODE_BUCKET = old


def _icl_prompt(n_ref=7, seed=9):
    rs = np.random.RandomState(seed)
    return VoiceClonePrompt(
        speaker_embedding=rs.randn(64).astype(np.float32),
        ref_codes=rs.randint(0, 128, size=(n_ref, 16)).astype(np.int32),
        ref_text_ids=[7, 9],
    )


@pytest.mark.slow
def test_run_to_audio_voice_clone_icl(model):
    """Non-streaming clone via the pipelined path equals the staged debug
    path (prepend-and-proportional-cut) up to vocoder ulps."""
    prompt = _icl_prompt()
    opts = SynthesisOptions(max_length=8, seed=42)
    audio = model.synthesize_voice_clone("clone pipelined", prompt, "english", opts)
    ref, _frames = model.synthesize_voice_clone_debug(
        "clone pipelined", prompt, "english", SynthesisOptions(max_length=8, seed=42)
    )
    assert len(audio) == len(ref)
    np.testing.assert_allclose(audio.samples, ref.samples, rtol=0, atol=2e-6)


def test_run_to_audio_fallback_prefix_cut(model):
    """streaming_exact=False falls back to the staged path; for ICL clones it
    must still apply the prepend-and-proportional-cut (bit-equal to debug)."""
    prompt = _icl_prompt()
    opts = SynthesisOptions(max_length=8, seed=42, streaming_exact=False)
    audio = model.synthesize_voice_clone("clone fallback", prompt, "english", opts)
    ref, _frames = model.synthesize_voice_clone_debug(
        "clone fallback", prompt, "english",
        SynthesisOptions(max_length=8, seed=42, streaming_exact=False),
    )
    np.testing.assert_array_equal(audio.samples, ref.samples)
