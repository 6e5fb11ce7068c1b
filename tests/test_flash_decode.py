"""Flash-style decode attention vs dense reference."""

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_tts_tpu.ops import nn


def test_flash_decode_matches_dense():
    rs = np.random.RandomState(0)
    b, h, kv, d, max_seq = 1, 8, 4, 16, 640
    q = jnp.asarray(rs.randn(b, 1, h, d).astype(np.float32))
    cache_k = jnp.asarray(rs.randn(b, max_seq, kv, d).astype(np.float32))
    cache_v = jnp.asarray(rs.randn(b, max_seq, kv, d).astype(np.float32))
    scale = 1.0 / d**0.5

    for pos in (0, 1, 255, 256, 300, 511, 639):
        key_pos = jnp.arange(max_seq)
        mask = (key_pos[None, :] <= jnp.array([[pos]]))[None, None, None, 0]
        mask = (key_pos <= pos)[None, None, None, None, :]
        dense = nn.gqa_attention(q, cache_k, cache_v, mask, scale)
        flash = nn.decode_attention_flash(q, cache_k, cache_v, jnp.int32(pos), scale)
        np.testing.assert_allclose(
            np.asarray(flash), np.asarray(dense), atol=2e-5, rtol=1e-4,
            err_msg=f"pos={pos}",
        )


def test_flash_decode_vmapped():
    """Per-instance positions under vmap: extra blocks must be no-ops."""
    rs = np.random.RandomState(1)
    h, kv, d, max_seq = 4, 2, 8, 512
    B = 3
    q = jnp.asarray(rs.randn(B, 1, 1, h, d).astype(np.float32))
    ck = jnp.asarray(rs.randn(B, 1, max_seq, kv, d).astype(np.float32))
    cv = jnp.asarray(rs.randn(B, 1, max_seq, kv, d).astype(np.float32))
    positions = jnp.array([3, 257, 500], jnp.int32)
    scale = 1.0 / d**0.5

    batched = jax.vmap(
        lambda qq, k, v, p: nn.decode_attention_flash(qq, k, v, p, scale)
    )(q, ck, cv, positions)

    for i in range(B):
        single = nn.decode_attention_flash(
            q[i], ck[i], cv[i], positions[i], scale
        )
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(single), atol=2e-5, rtol=1e-4
        )
