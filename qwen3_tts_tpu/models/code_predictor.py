"""Code predictor: 5-layer decoder emitting 15 acoustic codes per frame.

Per frame (reference: src/models/code_predictor.rs:320-416):
  1. prefill the 5-layer stack with [talker_hidden, semantic_embed]
     (projected 2048->1024 on 1.7B models),
  2. greedy-predict acoustic code 0 from lm_head[0] at the last position,
  3. 14 single-token decode steps: embed the previous code with the previous
     group's embedding table, run the stack, predict with the group's head.

TPU design: the whole inner loop is a ``lax.scan`` over the 14 remaining
groups with the stacked per-group embedding tables and lm heads as scan
inputs — XLA slices each group's [vocab, dim] table per iteration without
dynamic gathers, and the KV cache (17 rows) lives entirely in registers/VMEM
for the duration of the frame. Everything is argmax (no sampling), so the
frame is fully deterministic given the talker hidden state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import nn
from ..ops import quant
from .config import CodePredictorConfig

# 2 prefill positions + 15 decode tokens; the 15th is never attended but
# keeping the power-of-two-ish row count static avoids special-casing.
CP_MAX_SEQ = 17


def _maybe_project(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    proj = params.get("mtp_proj")
    if proj is None:
        return x
    return x @ proj["w"] + proj["b"]


def _head(heads, index_or_slice):
    """Index/slice the stacked lm heads, plain [G, K, V] or quantized dict."""
    if quant.is_quantized(heads):
        return {"q8": heads["q8"][index_or_slice], "scale": heads["scale"][index_or_slice]}
    return heads[index_or_slice]


def scan_slices(params: dict, cfg: CodePredictorConfig):
    """Pre-slice the per-group scan inputs ONCE (outside any frame loop).

    The decode scan consumes embedding tables [:n-1] and lm heads [1:n];
    slicing stacked arrays inside the generation while-body materializes
    ~175 MB of copies per frame (measured 0.49 ms/frame in the 1.7B trace —
    xprof slice.315/316). Callers hoist these and pass them through.
    """
    n = cfg.num_acoustic
    return params["codec_embeddings"][: n - 1], _head(params["lm_heads"], slice(1, n))


def predict_acoustic_codes(
    params: dict,
    cfg: CodePredictorConfig,
    talker_hidden: jnp.ndarray,
    semantic_embed: jnp.ndarray,
    hoisted_scan_slices=None,
) -> jnp.ndarray:
    """All 15 acoustic codes for one frame.

    talker_hidden, semantic_embed: [1, 1, embed_dim] (talker hidden size).
    Returns int32 [num_acoustic]. ``hoisted_scan_slices``: see scan_slices().

    With fused+int8 weights the 14 decode steps run through the fused
    whole-layer Pallas kernels (ops/fused_layer.py) — 2 launches per layer
    step instead of 4 dequant matmuls plus a dozen XLA glue ops.
    """
    from ..ops import fused_layer

    if fused_layer.supports_cp_frame_kernel(params, cfg):
        # Whole-frame streaming kernel: 5-layer weights resident in VMEM
        # across all 16 positions (journal R2.5) — one pallas_call/frame.
        return fused_layer.streamed_cp_frame(
            params, cfg, talker_hidden, semantic_embed
        )
    if quant.pallas_allowed() and fused_layer.supports_fused_step(params["layers"]):
        # Under pallas_dequant_scope(False) — batched (vmapped) or
        # tp-sharded programs — fall through to the generic stack: its
        # quant.mm dots are XLA dequant-then-dot, which vmap folds into
        # matmul rows (one weight read per step for ALL streams). The
        # fused per-layer pallas_calls here would instead be grid-repeated
        # per example by vmap's batching rule: measured 9.4 ms/frame of a
        # 13.9 ms/frame batch-8 int8 loop was this CP scan (journal R4.9).
        return _predict_acoustic_codes_fused(
            params, cfg, talker_hidden, semantic_embed, hoisted_scan_slices
        )
    stack_cfg = cfg.layer_stack()
    cache = nn.init_kv_cache(stack_cfg, batch=1, max_seq=CP_MAX_SEQ, dtype=talker_hidden.dtype)

    # --- prefill: [talker_hidden, semantic_embed] ---
    x = jnp.concatenate([talker_hidden, semantic_embed], axis=1)
    x = _maybe_project(params, x)
    positions = jnp.arange(2, dtype=jnp.int32)
    h, cache = nn.run_layer_stack(
        params["layers"], x, stack_cfg, cache, positions, jnp.int32(0),
        self_attn_prefill=True,
    )
    h = nn.rms_norm(h, params["norm"], cfg.rms_norm_eps)

    last = h[:, 1:2, :]
    logits0 = quant.mm(last, _head(params["lm_heads"], 0))
    code0 = jnp.argmax(logits0[:, 0, :], axis=-1).astype(jnp.int32)[0]

    # --- 14 decode steps over groups 1..14 ---
    def step(carry, group_inputs):
        prev_code, cache, pos = carry
        embed_table, lm_head = group_inputs  # [vocab, embed_dim], [hidden, vocab]
        x = embed_table[prev_code][None, None, :]
        x = _maybe_project(params, x)
        h, cache = nn.run_layer_stack(
            params["layers"], x, stack_cfg, cache, pos[None], pos
        )
        h = nn.rms_norm(h, params["norm"], cfg.rms_norm_eps)
        logits = quant.mm(h[:, 0, :], lm_head)
        code = jnp.argmax(logits, axis=-1).astype(jnp.int32)[0]
        return (code, cache, pos + 1), code

    init = (code0, cache, jnp.int32(2))
    # Group g embeds with table g-1 and predicts with head g.
    xs = hoisted_scan_slices if hoisted_scan_slices is not None else scan_slices(params, cfg)
    (_, _, _), rest = jax.lax.scan(step, init, xs)
    return jnp.concatenate([code0[None], rest], axis=0)


def _predict_acoustic_codes_fused(
    params: dict,
    cfg: CodePredictorConfig,
    talker_hidden: jnp.ndarray,
    semantic_embed: jnp.ndarray,
    hoisted_scan_slices=None,
) -> jnp.ndarray:
    """Fused-kernel variant of the 15-code frame (identical codes).

    Prefill (2 rows) runs the standard stack once; the cache is then
    reshaped ONCE into the kernel-native [L, S, KV*D] layout and the 14
    decode steps scan the two fused whole-layer kernels per layer.
    """
    from ..ops import fused_layer

    stack_cfg = cfg.layer_stack()
    cache = nn.init_kv_cache(stack_cfg, batch=1, max_seq=CP_MAX_SEQ, dtype=talker_hidden.dtype)

    x = jnp.concatenate([talker_hidden, semantic_embed], axis=1)
    x = _maybe_project(params, x)
    positions = jnp.arange(2, dtype=jnp.int32)
    h, cache = nn.run_layer_stack(
        params["layers"], x, stack_cfg, cache, positions, jnp.int32(0),
        self_attn_prefill=True,
    )
    h = nn.rms_norm(h, params["norm"], cfg.rms_norm_eps)
    logits0 = quant.mm(h[:, 1:2, :], _head(params["lm_heads"], 0))
    code0 = jnp.argmax(logits0[:, 0, :], axis=-1).astype(jnp.int32)[0]

    kvd = stack_cfg.num_kv_heads * stack_cfg.head_dim
    ck = cache.k.reshape(stack_cfg.num_layers, CP_MAX_SEQ, kvd)
    cv = cache.v.reshape(stack_cfg.num_layers, CP_MAX_SEQ, kvd)
    inv_freq = nn.rope_inv_freq(stack_cfg.head_dim, stack_cfg.rope_theta)
    cos_t, sin_t = nn.rope_cos_sin(
        jnp.arange(CP_MAX_SEQ, dtype=jnp.float32), inv_freq
    )

    pack = params.get("stream_pack")

    def step(carry, group_inputs):
        prev_code, ck, cv, pos = carry
        embed_table, lm_head = group_inputs
        x = embed_table[prev_code][None, None, :]
        x = _maybe_project(params, x)
        h, ck, cv = fused_layer.run_fused_decode_step(
            params["layers"], x, stack_cfg, ck, cv, pos, cos_t, sin_t, pack
        )
        h = nn.rms_norm(h, params["norm"], cfg.rms_norm_eps)
        logits = quant.mm(h[:, 0, :], lm_head)
        code = jnp.argmax(logits, axis=-1).astype(jnp.int32)[0]
        return (code, ck, cv, pos + 1), code

    init = (code0, ck, cv, jnp.int32(2))
    xs = hoisted_scan_slices if hoisted_scan_slices is not None else scan_slices(params, cfg)
    (_, _, _, _), rest = jax.lax.scan(step, init, xs)
    return jnp.concatenate([code0[None], rest], axis=0)


def predict_acoustic_codes_jacobi(
    params: dict,
    cfg: CodePredictorConfig,
    talker_hidden: jnp.ndarray,
    semantic_embed: jnp.ndarray,
    max_iters: int = 16,
) -> jnp.ndarray:
    """Greedy fixed-point (Jacobi) decoding of all 15 acoustic codes.

    The sequential loop reads the 5-layer weights 15 times per frame and is
    purely HBM-bandwidth-bound. Instead, iterate the *whole* 16-position
    frame as one batched causal forward and repeat until the code vector is
    a fixed point. Because position g's logits depend only on positions
    < g (causal attention, greedy argmax), after k iterations the first k
    codes equal the sequential result — so the fixed point IS the greedy
    sequence and the loop terminates in at most num_acoustic iterations,
    typically far fewer. One weight pass per iteration instead of 15.
    (Lookahead/Jacobi decoding, cf. arXiv:2402.02057.)
    """
    stack_cfg = cfg.layer_stack()
    n = cfg.num_acoustic
    prefix = jnp.concatenate([talker_hidden, semantic_embed], axis=1)
    prefix = _maybe_project(params, prefix)  # [1, 2, hidden]
    tables = params["codec_embeddings"]  # [15, vocab, embed_dim]
    heads = params["lm_heads"]  # [15, hidden, vocab]

    def iteration(codes: jnp.ndarray) -> jnp.ndarray:
        # Positions 2..16 embed codes 0..13 with their group tables.
        embs = jnp.take_along_axis(
            tables[: n - 1], codes[: n - 1, None, None], axis=1
        )[:, 0, :]  # [14, embed_dim]
        embs = _maybe_project(params, embs[None])  # [1, 14, hidden]
        seq = jnp.concatenate([prefix, embs], axis=1)  # [1, 16, hidden]
        h = nn.run_layer_stack_nocache(params["layers"], seq, stack_cfg)
        h = nn.rms_norm(h, params["norm"], cfg.rms_norm_eps)
        # Position 1+g predicts code g with head g.
        hg = h[0, 1 : 1 + n, :]  # [15, hidden]
        if quant.is_quantized(heads):
            logits = (
                jnp.einsum(
                    "gh,ghv->gv",
                    hg,
                    heads["q8"].astype(hg.dtype),
                    preferred_element_type=jnp.float32,
                )
                * heads["scale"]
            )
        else:
            logits = jnp.einsum("gh,ghv->gv", hg, heads)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def cond(carry):
        codes, prev, it = carry
        return jnp.any(codes != prev) & (it < max_iters)

    def body(carry):
        codes, _, it = carry
        return iteration(codes), codes, it + 1

    init = iteration(jnp.zeros((n,), jnp.int32))
    codes, _, _ = jax.lax.while_loop(
        cond, body, (init, jnp.full((n,), -1, jnp.int32), jnp.int32(1))
    )
    return codes


def acoustic_embedding_sum(params: dict, codes: jnp.ndarray) -> jnp.ndarray:
    """Sum of per-group embeddings of a frame's acoustic codes.

    codes: int32 [num_acoustic]. Returns [1, 1, embed_dim]. One batched gather
    (take_along_axis over the stacked [G, vocab, dim] tables) instead of 15
    small lookups (reference: code_predictor.rs:497-519).
    """
    tables = params["codec_embeddings"]  # [G, vocab, dim]
    picked = jnp.take_along_axis(
        tables, codes[:, None, None].astype(jnp.int32), axis=1
    )  # [G, 1, dim]
    return picked.sum(axis=0)[None]


def embed_codes_for_group(params: dict, group_idx: int, codes: jnp.ndarray) -> jnp.ndarray:
    """Embed a [T] code sequence with acoustic group ``group_idx``'s table -> [1, T, dim]."""
    return params["codec_embeddings"][group_idx][codes][None]
