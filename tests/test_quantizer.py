"""Generic VQ/RVQ utility + legacy 25 Hz decoder tests."""

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_tts_tpu.models.codec.legacy_decoder import CodecDecoder, LegacyDecoderConfig
from qwen3_tts_tpu.models.codec.quantizer import (
    ResidualVectorQuantizer,
    VectorQuantizer,
)


def test_vq_roundtrip_exact_codes():
    vq = VectorQuantizer.random(jax.random.PRNGKey(0), 32, 8)
    # Inputs exactly on codebook entries must map to themselves.
    idx = jnp.array([[3, 17, 31, 0]])
    x = vq.decode(idx)
    quantized, got = vq.encode(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(idx))
    np.testing.assert_allclose(np.asarray(quantized), np.asarray(x), atol=1e-6)


def test_vq_nearest_neighbour():
    cb = jnp.array([[0.0, 0.0], [10.0, 10.0], [-5.0, 5.0]])
    vq = VectorQuantizer(cb)
    x = jnp.array([[[0.4, -0.2], [9.0, 11.0], [-4.0, 4.0]]])
    _, idx = vq.encode(x)
    np.testing.assert_array_equal(np.asarray(idx), [[0, 1, 2]])


def test_rvq_residual_reduces_error():
    key = jax.random.PRNGKey(1)
    rvq = ResidualVectorQuantizer.random(key, 8, 64, 16)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 10, 16))
    quant_sum, indices = rvq.encode(x)
    assert indices.shape == (1, 8, 10)
    # decode_sum(encode indices) == quantized sum
    np.testing.assert_allclose(
        np.asarray(rvq.decode_sum(indices)), np.asarray(quant_sum), atol=1e-5
    )
    # each additional quantizer reduces reconstruction error
    err1 = float(((x - ResidualVectorQuantizer(rvq.codebooks[:1]).encode(x)[0]) ** 2).sum())
    err8 = float(((x - quant_sum) ** 2).sum())
    assert err8 < err1


def test_legacy_decoder_shapes():
    cfg = LegacyDecoderConfig(
        hidden_size=32,
        num_layers=1,
        num_heads=2,
        upsample_ratios=(2, 3),
        num_quantizers=4,
        codebook_dim=8,
        codebook_size=16,
    )
    dec = CodecDecoder.random(jax.random.PRNGKey(3), cfg)
    tokens = jnp.asarray(np.random.RandomState(0).randint(0, 16, (1, 4, 5)))
    audio = dec.decode(tokens)
    assert audio.shape == (1, 5 * cfg.total_upsample)
    assert np.isfinite(np.asarray(audio)).all()
