"""Fused Pallas residual-unit kernel (models/codec/fused_blocks.py).

Interpret-mode parity vs the XLA taps path, tile-boundary row-independence,
and the streaming carry. The kernel must preserve the vocoder's invariants:
bucket-invariance (tile boundaries move with T) and streaming == batch.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.models.codec import blocks, fused_blocks


def _unit_params(rs, c):
    return {
        "act1_alpha": jnp.asarray(rs.randn(c).astype(np.float32) * 0.1),
        "act1_beta": jnp.asarray(rs.randn(c).astype(np.float32) * 0.1),
        "conv1_w": jnp.asarray(rs.randn(7, c, c).astype(np.float32) * 0.05),
        "conv1_b": jnp.asarray(rs.randn(c).astype(np.float32) * 0.1),
        "act2_alpha": jnp.asarray(rs.randn(c).astype(np.float32) * 0.1),
        "act2_beta": jnp.asarray(rs.randn(c).astype(np.float32) * 0.1),
        "conv2_w": jnp.asarray(rs.randn(1, c, c).astype(np.float32) * 0.05),
        "conv2_b": jnp.asarray(rs.randn(c).astype(np.float32) * 0.1),
    }


def _xla_unit(x, p, dilation):
    """The taps-form reference (blocks.residual_unit's non-fused branch)."""
    h = blocks.snake_beta(x, p["act1_alpha"], p["act1_beta"])
    h = blocks.causal_conv1d(h, p["conv1_w"], p["conv1_b"], dilation=dilation)
    h = blocks.snake_beta(h, p["act2_alpha"], p["act2_beta"])
    h = blocks.causal_conv1d(h, p["conv2_w"], p["conv2_b"])
    return x + h


@pytest.mark.parametrize("c", [48, 96, 192])
@pytest.mark.parametrize("dilation", [1, 3, 9])
def test_fused_unit_matches_xla(c, dilation):
    rs = np.random.RandomState(c + dilation)
    p = _unit_params(rs, c)
    # T crosses a tile boundary and leaves a remainder (TILE = 256).
    x = jnp.asarray(rs.randn(2, 300, c).astype(np.float32))
    want = _xla_unit(x, p, dilation)
    got = fused_blocks.residual_unit(x, p, dilation)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=0, atol=1e-5
    )


def test_fused_unit_short_input():
    """T < TILE: single padded tile."""
    rs = np.random.RandomState(7)
    c = 96
    p = _unit_params(rs, c)
    x = jnp.asarray(rs.randn(1, 40, c).astype(np.float32))
    got = fused_blocks.residual_unit(x, p, 9)
    want = _xla_unit(x, p, 9)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=0, atol=1e-5
    )


def test_fused_unit_bucket_invariance():
    """Rows must not depend on tile boundaries: the first 300 rows of a
    T=700 run equal the T=300 run bit-for-bit (the vocoder's bucketing
    invariant rides on this)."""
    rs = np.random.RandomState(11)
    c = 192
    p = _unit_params(rs, c)
    x_long = jnp.asarray(rs.randn(1, 700, c).astype(np.float32))
    out_long = fused_blocks.residual_unit(x_long, p, 3)
    out_short = fused_blocks.residual_unit(x_long[:, :300], p, 3)
    np.testing.assert_array_equal(
        np.asarray(out_long)[:, :300], np.asarray(out_short)
    )


def test_fused_stream_matches_batch():
    """Chunked streaming with the raw-rows carry reproduces the batch run
    exactly (cold-start zeros == batch zero left-padding)."""
    rs = np.random.RandomState(13)
    c, d = 96, 9
    p = _unit_params(rs, c)
    x = jnp.asarray(rs.randn(2, 520, c).astype(np.float32))
    want = fused_blocks.residual_unit(x, p, d)

    carry = jnp.zeros((2, 6 * d, c), jnp.float32)
    outs = []
    for lo, hi in [(0, 100), (100, 350), (350, 520)]:
        out, carry = fused_blocks.residual_unit_stream(x[:, lo:hi], carry, p, d)
        outs.append(np.asarray(out))
    got = np.concatenate(outs, axis=1)
    np.testing.assert_array_equal(got, np.asarray(want))


def test_routing_gates():
    """should_fuse: off on CPU by default, forced by env, killed by env,
    and never for wide channels or non-f32."""
    import jax

    x = jnp.zeros((1, 8, 96), jnp.float32)
    on_tpu = jax.default_backend() == "tpu"
    assert fused_blocks.residual_unit_should_fuse(x) == on_tpu

    import os
    from unittest import mock

    with mock.patch.dict(os.environ, {"QWEN3_TTS_FORCE_VOCODER_KERNELS": "1"}):
        assert fused_blocks.residual_unit_should_fuse(x)
        assert not fused_blocks.residual_unit_should_fuse(
            jnp.zeros((1, 8, 768), jnp.float32)
        )
        assert not fused_blocks.residual_unit_should_fuse(
            jnp.zeros((1, 8, 96), jnp.bfloat16)
        )
    with mock.patch.dict(
        os.environ,
        {"QWEN3_TTS_FORCE_VOCODER_KERNELS": "1", "QWEN3_TTS_NO_VOCODER_KERNELS": "1"},
    ):
        assert not fused_blocks.residual_unit_should_fuse(x)
