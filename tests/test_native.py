"""Native C++ kernel parity: identical results to the numpy fallbacks."""

import numpy as np
import pytest

from qwen3_tts_tpu import native


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("native library not built (no C++ toolchain)")


def test_pcg_uniforms_bit_exact(lib_available):
    from qwen3_tts_tpu.ops import rng

    for seed in (0, 42, 123456789, 2**63 + 5):
        fast = native.pcg_uniforms(seed, 500)
        # force the numpy path by computing directly
        state = rng.pcg_init_state(seed)
        slow = np.empty(500, np.float32)
        for i in range(500):
            state, word = rng.pcg_next(state)
            slow[i] = np.float32(word) / np.float32(np.uint32(0xFFFFFFFF))
        np.testing.assert_array_equal(fast, slow)


def test_resample_matches_numpy(lib_available):
    from qwen3_tts_tpu.audio import resample as rs

    t = np.arange(48000) / 48000.0
    tone = (np.sin(2 * np.pi * 440 * t) * 0.7).astype(np.float32)
    fast = native.resample_sinc(tone, 48000, 24000)
    # numpy reference path (bypass native dispatch)
    slow = _numpy_resample(tone, 48000, 24000)
    assert fast.shape == slow.shape
    np.testing.assert_allclose(fast, slow, atol=2e-6)


def _numpy_resample(samples, src, dst, sinc_len=128):
    import math

    samples = np.asarray(samples, np.float64)
    n_in = len(samples)
    n_out = int(round(n_in * dst / src))
    g = math.gcd(src, dst)
    up, down = dst // g, src // g
    cutoff = 0.95 * min(1.0, up / down)
    half = sinc_len // 2
    t = np.arange(-half, half + 1, dtype=np.float64)
    phases = np.arange(up, dtype=np.float64) / up
    x = t[None, :] - phases[:, None]
    kernel = cutoff * np.sinc(cutoff * x)
    i = np.arange(2 * half + 1, dtype=np.float64)
    w = (
        0.35875
        - 0.48829 * np.cos(2 * np.pi * i / (2 * half))
        + 0.14128 * np.cos(4 * np.pi * i / (2 * half))
        - 0.01168 * np.cos(6 * np.pi * i / (2 * half))
    )
    kernel = kernel * w[None, :]
    padded = np.concatenate([np.zeros(half), samples, np.zeros(half + 1)])
    m = np.arange(n_out)
    q = (m * down) // up
    p = m * down - q * up
    idx = q[:, None] + np.arange(2 * half + 1)[None, :]
    return np.einsum("mj,mj->m", padded[idx], kernel[p]).astype(np.float32)


def test_wav_write_matches_python(lib_available, tmp_path):
    from qwen3_tts_tpu.audio import io as audio_io

    rs_ = np.random.RandomState(0)
    samples = (rs_.rand(5000).astype(np.float32) - 0.5) * 1.5
    native_path = tmp_path / "native.wav"
    py_path = tmp_path / "py.wav"
    assert native.wav_write_pcm16(str(native_path), samples, 24000)
    # stdlib path: write via the wave module directly
    import wave

    pcm = (np.clip(samples, -1, 1) * 32767.0).astype(np.int16)
    with wave.open(str(py_path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(24000)
        w.writeframes(pcm.tobytes())
    assert native_path.read_bytes() == py_path.read_bytes()
