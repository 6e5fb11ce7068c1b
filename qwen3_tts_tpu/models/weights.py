"""Parameter pytree construction: safetensors loading and random init.

Weight-name maps follow the HF checkpoint layout consumed by the reference
(src/models/talker.rs:374-422, src/models/code_predictor.rs:156-218). Linear
weights are stored transposed to [in, out] so the hot path is plain
``x @ w`` (row-major activations hitting the MXU without relayout);
embeddings stay [vocab, dim]; per-layer tensors are stacked along a leading
layer axis for the lax.scan layer stack.

Random init exists for weight-free tests and synthetic-weight benchmarking
(the reference's VarMap zero-init fixture pattern, e.g. transformer.rs:479).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp

from .config import CodePredictorConfig, TalkerConfig


def load_safetensors(path: str | Path) -> dict[str, jnp.ndarray]:
    """Load a safetensors file into a flat dict of jnp arrays (bf16-aware)."""
    from safetensors import safe_open

    out: dict[str, jnp.ndarray] = {}
    with safe_open(str(path), framework="flax") as f:
        for key in f.keys():
            out[key] = f.get_tensor(key)
    return out


def _t(w: jnp.ndarray, dtype) -> jnp.ndarray:
    """Transpose a [out, in] HF linear weight to [in, out] in compute dtype."""
    return jnp.asarray(w, dtype).T


def _stack_layer_params(
    weights: dict[str, jnp.ndarray], prefix: str, num_layers: int, dtype
) -> dict[str, jnp.ndarray]:
    """Stack per-layer tensors: '{prefix}.{i}.self_attn.q_proj.weight' etc."""

    def stack(sub: str, transpose: bool) -> jnp.ndarray:
        mats = []
        for i in range(num_layers):
            w = weights[f"{prefix}.{i}.{sub}"]
            mats.append(_t(w, dtype) if transpose else jnp.asarray(w, dtype))
        return jnp.stack(mats)

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


def load_talker_params(
    weights: dict[str, jnp.ndarray], cfg: TalkerConfig, dtype=jnp.bfloat16
) -> dict:
    return {
        "text_embedding": jnp.asarray(weights["talker.model.text_embedding.weight"], dtype),
        "text_projection": {
            "fc1_w": _t(weights["talker.text_projection.linear_fc1.weight"], dtype),
            "fc1_b": jnp.asarray(weights["talker.text_projection.linear_fc1.bias"], dtype),
            "fc2_w": _t(weights["talker.text_projection.linear_fc2.weight"], dtype),
            "fc2_b": jnp.asarray(weights["talker.text_projection.linear_fc2.bias"], dtype),
        },
        "codec_embedding": jnp.asarray(weights["talker.model.codec_embedding.weight"], dtype),
        "layers": _stack_layer_params(
            weights, "talker.model.layers", cfg.num_hidden_layers, dtype
        ),
        "norm": jnp.asarray(weights["talker.model.norm.weight"], dtype),
        "codec_head": _t(weights["talker.codec_head.weight"], dtype),
    }


def load_code_predictor_params(
    weights: dict[str, jnp.ndarray], cfg: CodePredictorConfig, dtype=jnp.bfloat16
) -> dict:
    p = "talker.code_predictor"
    n = cfg.num_acoustic
    params: dict = {
        "codec_embeddings": jnp.stack(
            [
                jnp.asarray(weights[f"{p}.model.codec_embedding.{i}.weight"], dtype)
                for i in range(n)
            ]
        ),
        "layers": _stack_layer_params(
            weights, f"{p}.model.layers", cfg.num_hidden_layers, dtype
        ),
        "norm": jnp.asarray(weights[f"{p}.model.norm.weight"], dtype),
        "lm_heads": jnp.stack(
            [_t(weights[f"{p}.lm_head.{i}.weight"], dtype) for i in range(n)]
        ),
        "mtp_proj": None,
    }
    if cfg.needs_projection:
        params["mtp_proj"] = {
            "w": _t(weights[f"{p}.small_to_mtp_projection.weight"], dtype),
            "b": jnp.asarray(weights[f"{p}.small_to_mtp_projection.bias"], dtype),
        }
    return params


def fuse_layer_params(stacked: dict) -> dict:
    """Single-chip optimization: concat q|k|v and gate|up projections.

    One [hidden, (H+2KV)*D] matmul replaces three per attention block and one
    [hidden, 2*inter] replaces two per MLP — fewer kernel launches and HBM
    passes in the latency-bound decode loop. The unfused tree stays canonical
    for tensor-parallel sharding (fused axes don't split evenly across tp).
    """
    fused = dict(stacked)
    fused["qkv_proj"] = jnp.concatenate(
        [stacked["q_proj"], stacked["k_proj"], stacked["v_proj"]], axis=-1
    )
    fused["gateup_proj"] = jnp.concatenate(
        [stacked["gate_proj"], stacked["up_proj"]], axis=-1
    )
    for key in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"):
        del fused[key]
    return fused


def fuse_model_params(params: dict) -> dict:
    """Apply fuse_layer_params to a talker/code-predictor param tree."""
    out = dict(params)
    out["layers"] = fuse_layer_params(params["layers"])
    return out


# ---------------------------------------------------------------------------
# Random init (tests / synthetic benchmarking)
# ---------------------------------------------------------------------------


def _randn(key, shape, dtype, scale=0.02):
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)


def init_layer_stack(key, num_layers, hidden, inter, heads, kv_heads, head_dim, dtype):
    ks = jax.random.split(key, 7)
    qdim, kvdim = heads * head_dim, kv_heads * head_dim
    return {
        "q_proj": _randn(ks[0], (num_layers, hidden, qdim), dtype),
        "k_proj": _randn(ks[1], (num_layers, hidden, kvdim), dtype),
        "v_proj": _randn(ks[2], (num_layers, hidden, kvdim), dtype),
        "o_proj": _randn(ks[3], (num_layers, qdim, hidden), dtype),
        "q_norm": jnp.ones((num_layers, head_dim), dtype),
        "k_norm": jnp.ones((num_layers, head_dim), dtype),
        "input_ln": jnp.ones((num_layers, hidden), dtype),
        "post_ln": jnp.ones((num_layers, hidden), dtype),
        "gate_proj": _randn(ks[4], (num_layers, hidden, inter), dtype),
        "up_proj": _randn(ks[5], (num_layers, hidden, inter), dtype),
        "down_proj": _randn(ks[6], (num_layers, inter, hidden), dtype),
    }


def init_talker_params(key, cfg: TalkerConfig, dtype=jnp.bfloat16) -> dict:
    ks = jax.random.split(key, 6)
    return {
        "text_embedding": _randn(ks[0], (cfg.text_vocab_size, cfg.text_embed_dim), dtype),
        "text_projection": {
            "fc1_w": _randn(ks[1], (cfg.text_embed_dim, cfg.text_proj_intermediate), dtype),
            "fc1_b": jnp.zeros((cfg.text_proj_intermediate,), dtype),
            "fc2_w": _randn(ks[2], (cfg.text_proj_intermediate, cfg.hidden_size), dtype),
            "fc2_b": jnp.zeros((cfg.hidden_size,), dtype),
        },
        "codec_embedding": _randn(ks[3], (cfg.codec_vocab_size, cfg.hidden_size), dtype),
        "layers": init_layer_stack(
            ks[4],
            cfg.num_hidden_layers,
            cfg.hidden_size,
            cfg.intermediate_size,
            cfg.num_attention_heads,
            cfg.num_key_value_heads,
            cfg.head_dim,
            dtype,
        ),
        "norm": jnp.ones((cfg.hidden_size,), dtype),
        "codec_head": _randn(ks[5], (cfg.hidden_size, cfg.codec_vocab_size), dtype),
    }


def init_code_predictor_params(key, cfg: CodePredictorConfig, dtype=jnp.bfloat16) -> dict:
    ks = jax.random.split(key, 4)
    n = cfg.num_acoustic
    params: dict = {
        "codec_embeddings": _randn(ks[0], (n, cfg.vocab_size, cfg.embed_dim), dtype),
        "layers": init_layer_stack(
            ks[1],
            cfg.num_hidden_layers,
            cfg.hidden_size,
            cfg.intermediate_size,
            cfg.num_attention_heads,
            cfg.num_key_value_heads,
            cfg.head_dim,
            dtype,
        ),
        "norm": jnp.ones((cfg.hidden_size,), dtype),
        "lm_heads": _randn(ks[2], (n, cfg.hidden_size, cfg.vocab_size), dtype),
        "mtp_proj": None,
    }
    if cfg.needs_projection:
        params["mtp_proj"] = {
            "w": _randn(ks[3], (cfg.embed_dim, cfg.hidden_size), dtype),
            "b": jnp.zeros((cfg.hidden_size,), dtype),
        }
    return params
