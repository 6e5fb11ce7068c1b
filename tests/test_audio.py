"""Audio host-stack tests: WAV round-trip, mel properties, resampler fidelity."""

import numpy as np
import pytest

from qwen3_tts_tpu.audio import io as audio_io
from qwen3_tts_tpu.audio import mel as audio_mel
from qwen3_tts_tpu.audio import resample as audio_rs


def test_wav_roundtrip(tmp_path):
    rs = np.random.RandomState(0)
    samples = (rs.rand(4800).astype(np.float32) - 0.5) * 1.6  # exercises clipping
    path = tmp_path / "t.wav"
    audio_io.save_wav(path, samples, 24000)
    buf = audio_io.load_wav(path)
    assert buf.sample_rate == 24000
    assert len(buf) == 4800
    expected = np.clip(samples, -1, 1)
    # save truncates toward zero (x * 32767 as int16) and load divides by
    # 32768 — same as the reference (io.rs:156-160 / io.rs:120-127), so the
    # round-trip error bound is ~2 LSB.
    assert np.abs(buf.samples - expected).max() < 2.5 / 32768


def test_wav_stereo_to_mono(tmp_path):
    import wave

    left = np.full(100, 0.5, np.float32)
    right = np.full(100, -0.25, np.float32)
    inter = np.empty(200, np.int16)
    inter[0::2] = (left * 32767).astype(np.int16)
    inter[1::2] = (right * 32767).astype(np.int16)
    path = tmp_path / "st.wav"
    with wave.open(str(path), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(inter.tobytes())
    buf = audio_io.load_wav(path)
    assert buf.sample_rate == 16000
    np.testing.assert_allclose(buf.samples, 0.125, atol=1e-3)


def test_normalize():
    buf = audio_io.AudioBuffer(np.array([0.1, -0.5, 0.25]), 24000)
    buf.normalize()
    assert abs(np.abs(buf.samples).max() - 1.0) < 1e-6


def test_mel_matches_librosa_filterbank():
    librosa = pytest.importorskip("librosa", reason="librosa not installed")
    cfg = audio_mel.MelConfig(n_fft=400, n_mels=64)
    ours = audio_mel.mel_filterbank(cfg)
    theirs = librosa.filters.mel(sr=24000, n_fft=400, n_mels=64)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_mel_slaney_scale_roundtrip():
    f = np.array([0.0, 200.0, 999.0, 1000.0, 4000.0, 12000.0])
    back = audio_mel.mel_to_hz(audio_mel.hz_to_mel(f))
    np.testing.assert_allclose(back, f, rtol=1e-6, atol=1e-3)
    # linear region: 66.667 Hz per mel
    np.testing.assert_allclose(audio_mel.hz_to_mel(np.array([200.0])), [3.0], rtol=1e-5)


def test_mel_silence_and_tone():
    m = audio_mel.MelSpectrogram(audio_mel.MelConfig())
    silence = m.compute(np.zeros(24000, np.float32))
    assert silence.shape[1] == 128
    assert (silence < 1e-6).all()

    t = np.arange(24000) / 24000.0
    tone = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    mel = m.compute(tone)
    assert mel.sum() > 0
    # energy concentrated near the 440 Hz band
    peak_band = mel.mean(axis=0).argmax()
    band_hz = audio_mel.mel_to_hz(
        audio_mel.hz_to_mel(np.array([0.0, 12000.0]))
    )  # smoke: scale sane
    assert 2 <= peak_band <= 20
    assert band_hz[1] > band_hz[0]


def test_speaker_encoder_mel_shape_and_floor():
    m = audio_mel.MelSpectrogram(audio_mel.speaker_encoder_config())
    out = m.compute_for_speaker_encoder(np.zeros(24000, np.float32))
    assert out.shape[0] == 128
    # log floor: log(1e-5)
    np.testing.assert_allclose(out, np.log(1e-5), atol=1e-4)


def test_resample_tone_preserves_frequency():
    src_rate, dst_rate = 48000, 24000
    t = np.arange(src_rate) / src_rate
    tone = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    out = audio_rs.resample_array(tone, src_rate, dst_rate)
    assert len(out) == 24000
    # Measure dominant frequency of the core (skip filter edges)
    core = out[2000:-2000]
    spec = np.abs(np.fft.rfft(core * np.hanning(len(core))))
    freq = np.fft.rfftfreq(len(core), 1.0 / dst_rate)
    assert abs(freq[spec.argmax()] - 440.0) < 5.0
    # Amplitude preserved within 1%
    assert abs(core.max() - 1.0) < 0.02


def test_resample_identity():
    buf = audio_io.AudioBuffer(np.random.RandomState(1).randn(1000).astype(np.float32), 24000)
    out = audio_rs.resample_to_24k(buf)
    np.testing.assert_array_equal(out.samples, buf.samples)


def test_resample_up_and_irrational_ratio():
    src, dst = 22050, 24000
    n = 22050
    t = np.arange(n) / src
    tone = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    out = audio_rs.resample_array(tone, src, dst)
    assert len(out) == 24000
    core = out[2000:-2000]
    spec = np.abs(np.fft.rfft(core * np.hanning(len(core))))
    freq = np.fft.rfftfreq(len(core), 1.0 / dst)
    assert abs(freq[spec.argmax()] - 1000.0) < 5.0
