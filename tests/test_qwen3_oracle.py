"""Transformer-stack parity against HF transformers' Qwen3 implementation.

The talker/code-predictor layers are Qwen3-style decoders (QK-norm GQA +
SwiGLU + RoPE). This test instantiates a tiny random HF ``Qwen3Model``,
ports its weights into our stacked-layer pytree, and asserts hidden-state
agreement — the strongest local oracle for RoPE/QK-norm/GQA semantics
before real checkpoints are available.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from qwen3_tts_tpu.ops import nn


def small_qwen3():
    from transformers.models.qwen3.configuration_qwen3 import Qwen3Config
    from transformers.models.qwen3.modeling_qwen3 import Qwen3Model

    cfg = Qwen3Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=128,
        rope_theta=1e6,
        rms_norm_eps=1e-6,
        attention_bias=False,
        use_cache=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    return cfg, Qwen3Model(cfg).eval()


def port_weights(model) -> dict:
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    n_layers = model.config.num_hidden_layers

    def stack(sub, transpose):
        mats = []
        for i in range(n_layers):
            w = sd[f"layers.{i}.{sub}"]
            mats.append(w.T if transpose else w)
        return jnp.asarray(np.stack(mats), jnp.float32)

    return {
        "q_proj": stack("self_attn.q_proj.weight", True),
        "k_proj": stack("self_attn.k_proj.weight", True),
        "v_proj": stack("self_attn.v_proj.weight", True),
        "o_proj": stack("self_attn.o_proj.weight", True),
        "q_norm": stack("self_attn.q_norm.weight", False),
        "k_norm": stack("self_attn.k_norm.weight", False),
        "input_ln": stack("input_layernorm.weight", False),
        "post_ln": stack("post_attention_layernorm.weight", False),
        "gate_proj": stack("mlp.gate_proj.weight", True),
        "up_proj": stack("mlp.up_proj.weight", True),
        "down_proj": stack("mlp.down_proj.weight", True),
    }


def test_layer_stack_matches_hf_qwen3():
    cfg, model = small_qwen3()
    layers = port_weights(model)
    stack_cfg = nn.LayerStackConfig(
        hidden_size=64,
        intermediate_size=96,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        head_dim=16,
        rms_norm_eps=1e-6,
        rope_theta=1e6,
    )

    rs = np.random.RandomState(0)
    ids = rs.randint(0, 128, size=(1, 12))
    with torch.no_grad():
        # HF applies the final norm; capture the pre-norm last hidden state.
        out = model(torch.from_numpy(ids), output_hidden_states=True)
    # hidden_states[-1] is pre-final-norm input to norm? In HF Qwen3Model the
    # last entry of hidden_states is post-final-norm. Compare against the
    # embedding-fed stack WITHOUT final norm via hidden_states[-2] + one
    # layer... simpler: run our stack and apply HF's final norm for the
    # comparison target.
    want_final = out.last_hidden_state.numpy()  # post final norm

    embed = model.embed_tokens(torch.from_numpy(ids)).detach().numpy()
    x = jnp.asarray(embed, jnp.float32)
    cache = nn.init_kv_cache(stack_cfg, 1, 12, jnp.float32)
    h, _ = nn.run_layer_stack(
        layers, x, stack_cfg, cache, jnp.arange(12, dtype=jnp.int32), jnp.int32(0)
    )
    final_w = jnp.asarray(model.norm.weight.detach().numpy(), jnp.float32)
    got = np.asarray(nn.rms_norm(h, final_w, 1e-6))

    np.testing.assert_allclose(got, want_final, atol=2e-5, rtol=1e-4)


def test_decode_matches_prefill_hf_semantics():
    """Incremental decode with our KV cache equals full-sequence forward."""
    cfg, model = small_qwen3()
    layers = port_weights(model)
    stack_cfg = nn.LayerStackConfig(
        hidden_size=64, intermediate_size=96, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=16, rms_norm_eps=1e-6, rope_theta=1e6,
    )
    rs = np.random.RandomState(1)
    x_full = jnp.asarray(rs.randn(1, 9, 64).astype(np.float32) * 0.1)

    cache = nn.init_kv_cache(stack_cfg, 1, 16, jnp.float32)
    h_full, _ = nn.run_layer_stack(
        layers, x_full, stack_cfg, cache, jnp.arange(9, dtype=jnp.int32), jnp.int32(0)
    )

    cache = nn.init_kv_cache(stack_cfg, 1, 16, jnp.float32)
    h_pre, cache = nn.run_layer_stack(
        layers, x_full[:, :6], stack_cfg, cache, jnp.arange(6, dtype=jnp.int32), jnp.int32(0)
    )
    outs = [h_pre]
    for t in range(6, 9):
        h_t, cache = nn.run_layer_stack(
            layers, x_full[:, t : t + 1], stack_cfg, cache,
            jnp.array([t], jnp.int32), jnp.int32(t),
        )
        outs.append(h_t)
    h_inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(h_inc), np.asarray(h_full), atol=2e-5, rtol=1e-4
    )


def test_self_attn_prefill_bit_identical():
    """Fresh-cache prefill via the S x S self-attention fast path matches the
    full-bucket masked read to f32 summation order (the skipped rows were
    exact zeros in the softmax, but the narrower reduction rounds
    differently by ~1 ulp, and later layers' K/V inherit that)."""
    cfg, model = small_qwen3()
    layers = port_weights(model)
    stack_cfg = nn.LayerStackConfig(
        hidden_size=64, intermediate_size=96, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=16, rms_norm_eps=1e-6, rope_theta=1e6,
    )
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(1, 12, 64).astype(np.float32) * 0.1)
    positions = jnp.arange(12, dtype=jnp.int32)

    # Big cache bucket with garbage rows past the prompt: the fast path must
    # still match because those rows were masked in the slow path anyway.
    cache_a = nn.init_kv_cache(stack_cfg, 1, 64, jnp.float32)
    h_a, kv_a = nn.run_layer_stack(
        layers, x, stack_cfg, cache_a, positions, jnp.int32(0)
    )
    cache_b = nn.init_kv_cache(stack_cfg, 1, 64, jnp.float32)
    h_b, kv_b = nn.run_layer_stack(
        layers, x, stack_cfg, cache_b, positions, jnp.int32(0),
        self_attn_prefill=True,
    )
    np.testing.assert_allclose(
        np.asarray(h_a), np.asarray(h_b), atol=1e-6, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(kv_a.k), np.asarray(kv_b.k), atol=1e-6, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(kv_a.v), np.asarray(kv_b.v), atol=1e-6, rtol=1e-5
    )
