"""Jacobi code-predictor decode must match the sequential greedy decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.models import code_predictor as cp
from qwen3_tts_tpu.models import weights as W
from qwen3_tts_tpu.models.config import CodePredictorConfig

pytestmark = pytest.mark.slow  # heavy integration tier; `make test-fast` skips



@pytest.mark.parametrize("with_projection", [False, True])
def test_jacobi_matches_sequential(with_projection):
    cfg = CodePredictorConfig(
        hidden_size=32 if with_projection else 64,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        vocab_size=96,
        codec_embed_dim=64 if with_projection else None,
    )
    params = W.init_code_predictor_params(jax.random.PRNGKey(5), cfg, jnp.float32)
    embed_dim = cfg.embed_dim

    for trial in range(4):
        k = jax.random.PRNGKey(100 + trial)
        k1, k2 = jax.random.split(k)
        hidden = jax.random.normal(k1, (1, 1, embed_dim), jnp.float32)
        semantic = jax.random.normal(k2, (1, 1, embed_dim), jnp.float32)

        seq = np.asarray(cp.predict_acoustic_codes(params, cfg, hidden, semantic))
        jac = np.asarray(
            cp.predict_acoustic_codes_jacobi(params, cfg, hidden, semantic)
        )
        np.testing.assert_array_equal(seq, jac, err_msg=f"trial {trial}")
