"""Talker model: 28-layer GQA decoder generating semantic codec tokens.

Functional JAX implementation. Parameters are a pytree (see
``qwen3_tts_tpu.models.weights``); every function here is jit-traceable with
static shapes so the whole prefill + generation pipeline compiles to a single
XLA program.

Behavioral parity reference: /root/reference/src/models/talker.rs (dual
text/codec embeddings, SiLU text projection, the three variant prompt
layouts, final-norm + codec head).

Prompt layouts (each row of the prompt embedding is one position):

CustomVoice (talker.rs:451-491), 10 positions:
    [0..3)  text_proj(text_emb([im_start, assistant, newline]))
    [3..9)  text_proj(text_emb([pad x5, bos])) + codec_emb([think, think_bos,
            lang, think_eos, speaker, codec_pad])
    [9]     text_proj(text_emb(first_text)) + codec_emb(codec_bos)

VoiceClone (talker.rs:511-563): same as CustomVoice but the speaker slot
holds the continuous x-vector instead of codec_emb(speaker); in ICL mode the
final (first_text + codec_bos) position is omitted (9 positions).

VoiceDesign (talker.rs:585-626): ChatML instruct prefix prepended; no speaker
slot (overlay is pad x4 + bos over [think, think_bos, lang, think_eos,
codec_pad]); 9 positions after the instruct.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import fused_layer, nn
from . import tokens as T
from .config import TalkerConfig


def text_project(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Text projection: fc1 -> SiLU -> fc2 (both with bias)."""
    tp = params["text_projection"]
    h = jax.nn.silu(x @ tp["fc1_w"] + tp["fc1_b"])
    return h @ tp["fc2_w"] + tp["fc2_b"]


def embed_text(params: dict, ids: jnp.ndarray) -> jnp.ndarray:
    """Projected text embeddings for token ids of any shape -> [..., hidden]."""
    return text_project(params, params["text_embedding"][ids])


def embed_codec(params: dict, ids: jnp.ndarray) -> jnp.ndarray:
    """Codec-vocabulary embeddings [..., hidden]."""
    return params["codec_embedding"][ids]


def _role_prefix(params: dict) -> jnp.ndarray:
    """[3, hidden] projected embeddings of <|im_start|>assistant\\n."""
    ids = jnp.array([T.IM_START, T.ASSISTANT, T.NEWLINE], dtype=jnp.int32)
    return embed_text(params, ids)


def _ids(*vals) -> jnp.ndarray:
    """Stack python-int and traced scalars into an int32 id vector."""
    return jnp.stack([jnp.asarray(v, jnp.int32) for v in vals])


def build_custom_voice_prompt(
    params: dict, first_text_id: jnp.ndarray, speaker_id, lang_id
) -> jnp.ndarray:
    """CustomVoice prompt embedding [1, 10, hidden]. ``speaker_id``/``lang_id``
    may be traced scalars (voice switching without recompilation)."""
    role = _role_prefix(params)
    codec_ids = _ids(
        T.CODEC_THINK, T.CODEC_THINK_BOS, lang_id, T.CODEC_THINK_EOS, speaker_id, T.CODEC_PAD
    )
    overlay_text = embed_text(
        params, jnp.array([T.TTS_PAD] * 5 + [T.TTS_BOS], dtype=jnp.int32)
    )
    overlay = overlay_text + embed_codec(params, codec_ids)
    first = embed_text(params, first_text_id[None]) + embed_codec(
        params, jnp.array([T.CODEC_BOS], dtype=jnp.int32)
    )
    return jnp.concatenate([role, overlay, first], axis=0)[None]


def build_voice_clone_prompt(
    params: dict,
    first_text_id: jnp.ndarray,
    speaker_embed: jnp.ndarray,
    lang_id: int,
    icl_mode: bool,
) -> jnp.ndarray:
    """VoiceClone prompt embedding [1, 10, hidden] (or [1, 9, hidden] in ICL).

    ``speaker_embed``: [hidden] continuous x-vector replacing the discrete
    speaker token embedding.
    """
    role = _role_prefix(params)
    prefix = embed_codec(
        params, _ids(T.CODEC_THINK, T.CODEC_THINK_BOS, lang_id, T.CODEC_THINK_EOS)
    )
    pad = embed_codec(params, jnp.array([T.CODEC_PAD], dtype=jnp.int32))
    codec_rows = jnp.concatenate(
        [prefix, speaker_embed.astype(prefix.dtype)[None], pad], axis=0
    )
    overlay_text = embed_text(
        params, jnp.array([T.TTS_PAD] * 5 + [T.TTS_BOS], dtype=jnp.int32)
    )
    overlay = overlay_text + codec_rows
    rows = [role, overlay]
    if not icl_mode:
        first = embed_text(params, first_text_id[None]) + embed_codec(
            params, jnp.array([T.CODEC_BOS], dtype=jnp.int32)
        )
        rows.append(first)
    return jnp.concatenate(rows, axis=0)[None]


def build_voice_design_suffix(
    params: dict, first_text_id: jnp.ndarray, lang_id
) -> jnp.ndarray:
    """VoiceDesign post-instruct rows [9, hidden]: role(3) + overlay(5) + first(1)."""
    role = _role_prefix(params)
    codec_ids = _ids(
        T.CODEC_THINK, T.CODEC_THINK_BOS, lang_id, T.CODEC_THINK_EOS, T.CODEC_PAD
    )
    overlay_text = embed_text(
        params, jnp.array([T.TTS_PAD] * 4 + [T.TTS_BOS], dtype=jnp.int32)
    )
    overlay = overlay_text + embed_codec(params, codec_ids)
    first = embed_text(params, first_text_id[None]) + embed_codec(
        params, jnp.array([T.CODEC_BOS], dtype=jnp.int32)
    )
    return jnp.concatenate([role, overlay, first], axis=0)


def build_trailing_text(
    params: dict, text_ids: jnp.ndarray, text_len: jnp.ndarray
) -> jnp.ndarray:
    """Per-frame text-fusion rows [Tb, hidden], right-filled with tts_pad.

    Row i holds text token i+1 for i < text_len-1, tts_eos at i = text_len-1,
    and tts_pad beyond — matching the reference's trailing-text schedule
    (src/lib.rs:508-519) with a static bucket length Tb = text_ids.shape[0].
    """
    tb = text_ids.shape[0]
    emb = embed_text(params, text_ids)  # [Tb, hidden]
    shifted = jnp.concatenate([emb[1:], jnp.zeros_like(emb[:1])], axis=0)
    eos = embed_text(params, jnp.array([T.TTS_EOS], dtype=jnp.int32))
    pad = embed_text(params, jnp.array([T.TTS_PAD], dtype=jnp.int32))
    idx = jnp.arange(tb)[:, None]
    out = jnp.where(idx < text_len - 1, shifted, jnp.where(idx == text_len - 1, eos, pad))
    return out


def build_icl_rows(
    params: dict,
    all_text_ids: jnp.ndarray,  # [Tb] ref_text + target_text + tts_eos, padded
    n_text: jnp.ndarray,  # [] int32 true text length (incl. tts_eos)
    codec_rows: jnp.ndarray,  # [Cb, hidden] codec_bos + summed ref codec embeds
    n_codec: jnp.ndarray,  # [] int32 true codec row count
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """ICL prompt rows (streaming element-wise overlay, talker.rs:690-709).

    The ICL block has exactly ``n_codec`` rows: row i = codec_rows[i] +
    (text_emb[i] if i < n_text else tts_pad). Text tokens beyond n_codec
    become per-frame trailing context. Returns (icl_rows [1, Cb, hidden]
    right-padded, trailing [Tb, hidden], trailing_len []).
    """
    tb = all_text_ids.shape[0]
    cb = codec_rows.shape[0]
    text_emb = embed_text(params, all_text_ids)  # [Tb, hidden]
    pad = embed_text(params, jnp.array([T.TTS_PAD], dtype=jnp.int32))[0]

    ci = jnp.arange(cb)[:, None]
    text_part = jnp.where(
        ci < jnp.minimum(n_text, tb),
        text_emb[jnp.minimum(jnp.arange(cb), tb - 1)],
        pad,
    )
    icl_rows = (codec_rows + text_part)[None]

    # trailing[i] = text_emb[n_codec + i] for i < n_text - n_codec, else pad
    ti = jnp.arange(tb)[:, None]
    src = jnp.clip(jnp.arange(tb) + n_codec, 0, tb - 1)
    trailing = jnp.where(ti < n_text - n_codec, text_emb[src], pad)
    trailing_len = jnp.maximum(n_text - n_codec, 0)
    return icl_rows, trailing, trailing_len


def build_icl_rows_sequential(
    params: dict,
    all_text_ids: jnp.ndarray,  # [Tb] ref_text + target_text + tts_eos, padded
    n_text: jnp.ndarray,
    codec_rows: jnp.ndarray,  # [Cb, hidden] codec_bos + summed ref codec embeds
    n_codec: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Non-streaming ICL layout (talker.rs:674-689, the mlx-audio variant).

    Two sequential blocks instead of element-wise overlay:
    ``[text + codec_pad (n_text rows) || codec + tts_pad (n_codec rows)]`` —
    all text is consumed in the prefix, so trailing is just tts_pad.
    Returns (icl_rows [1, Tb+Cb, hidden] right-padded with true length
    n_text + n_codec, trailing [1, hidden] pad rows, trailing_len=0).
    """
    tb = all_text_ids.shape[0]
    cb = codec_rows.shape[0]
    text_emb = embed_text(params, all_text_ids)  # [Tb, hidden]
    pad = embed_text(params, jnp.array([T.TTS_PAD], dtype=jnp.int32))[0]
    codec_pad = embed_codec(params, jnp.array([T.CODEC_PAD], dtype=jnp.int32))[0]

    text_block = text_emb + codec_pad  # [Tb, hidden]
    codec_block = codec_rows + pad  # [Cb, hidden]

    rows = jnp.zeros((tb + cb, text_block.shape[-1]), text_block.dtype)
    rows = jax.lax.dynamic_update_slice(rows, text_block, (0, 0))
    # Codec block starts right after the true text length, overwriting any
    # padded text rows; garbage stays strictly to the right.
    rows = jax.lax.dynamic_update_slice(rows, codec_block, (n_text, 0))

    trailing = pad[None]  # [1, hidden]
    return rows[None], trailing, jnp.int32(0)


def tts_pad_embed(params: dict) -> jnp.ndarray:
    """[1, hidden] projected tts_pad embedding (post-trailing filler)."""
    return embed_text(params, jnp.array([T.TTS_PAD], dtype=jnp.int32))


def forward(
    params: dict,
    cfg: TalkerConfig,
    x: jnp.ndarray,
    cache: nn.KVCache,
    positions: jnp.ndarray,
    write_pos: jnp.ndarray,
    self_attn_prefill: bool = False,
) -> tuple[jnp.ndarray, nn.KVCache]:
    """Run the layer stack on embeddings x [1, S, hidden]; returns normed hidden."""
    h, cache = nn.run_layer_stack(
        params["layers"], x, cfg.layer_stack(), cache, positions, write_pos,
        self_attn_prefill=self_attn_prefill,
    )
    h = nn.rms_norm(h, params["norm"], cfg.rms_norm_eps)
    return h, cache


def codec_logits(params: dict, hidden: jnp.ndarray) -> jnp.ndarray:
    """Codec head on (already normed) hidden states: [..., codec_vocab]."""
    from ..ops.quant import mm

    return mm(hidden, params["codec_head"])


def prefill(
    params: dict,
    cfg: TalkerConfig,
    prompt: jnp.ndarray,
    prefill_len: jnp.ndarray,
    cache: nn.KVCache,
    write_pos: jnp.ndarray | int = 0,
) -> tuple[jnp.ndarray, jnp.ndarray, nn.KVCache]:
    """Prefill with a right-padded prompt embedding [1, Pb, hidden].

    Returns (last_hidden [1,1,hidden] normed, logits [1, codec_vocab] at the
    last valid position, updated cache).
    """
    pb = prompt.shape[1]
    # A prefill at static write_pos 0 starts from a fresh cache, so attention
    # only needs the prompt's own rows (nn.run_layer_stack self_attn_prefill
    # fast path) — S x S instead of S x max_seq reads, exact up to f32
    # summation order.
    fresh = isinstance(write_pos, int) and write_pos == 0
    write_pos = jnp.asarray(write_pos, jnp.int32)
    positions = write_pos + jnp.arange(pb, dtype=jnp.int32)
    h, cache = forward(
        params, cfg, prompt, cache, positions, write_pos, self_attn_prefill=fresh
    )
    last = jax.lax.dynamic_slice_in_dim(h, prefill_len - 1, 1, axis=1)
    logits = codec_logits(params, last)[:, 0, :]
    return last, logits, cache


def stream_plane_mode(params: dict, cfg: TalkerConfig, cache: nn.KVCache) -> bool:
    """True when decode steps will run the streaming Pallas kernel, which
    takes the cache as [L, S, KV*D] planes (batch-1, manual-DMA kernel).

    Callers that loop decode steps (generation/core.py) should then carry
    the cache in plane form across the whole loop: reshaping the 63 MB
    5-D KVCache to planes inside the loop body cost ~0.27 ms/frame of
    layout copies at 1.7B (xplane trace), paid once per loop when hoisted.
    """
    return (
        params.get("stream_pack") is not None
        and cache.k.ndim == 5
        and cache.k.shape[1] == 1
        and cache.max_seq <= fused_layer.TALKER_STREAM_MAX_SEQ
    )


def decode_step_planes(
    params: dict,
    cfg: TalkerConfig,
    step_embed: jnp.ndarray,
    pos: jnp.ndarray,
    ck: jnp.ndarray,  # [L, S, KV*D]
    cv: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One streamed-kernel generation step on plane-form caches.

    Same math as ``decode_step`` in stream mode, minus the per-step 5-D
    reshape. Returns (normed hidden, logits, ck, cv).
    """
    stack_cfg = cfg.layer_stack()
    inv_freq = nn.rope_inv_freq(stack_cfg.head_dim, stack_cfg.rope_theta)
    cos_row, sin_row = nn.rope_cos_sin(pos.astype(jnp.float32)[None], inv_freq)
    h, ck, cv = fused_layer.streamed_talker_step(
        params["layers"], params["stream_pack"], step_embed, stack_cfg,
        ck, cv, pos, cos_row, sin_row,
    )
    h = nn.rms_norm(h, params["norm"], cfg.rms_norm_eps)
    logits = codec_logits(params, h)[:, 0, :]
    return h, logits, ck, cv


def tp_plane_mode(params: dict, cfg: TalkerConfig, cache: nn.KVCache, mesh) -> bool:
    """True when decode steps run the tensor-parallel per-chip kernels
    (ops/fused_layer.tp_decode_step): mesh attached, tp re-layout built by
    Qwen3TTS.shard(), batch-1 serving cache. Like stream_plane_mode, the
    cache is then carried as [L, S, KV*D] planes (KV*D tp-sharded)."""
    return (
        mesh is not None
        and params.get("tp_pack") is not None
        and cache.k.ndim == 5
        and cache.k.shape[1] == 1
    )


def decode_step_planes_tp(
    params: dict,
    cfg: TalkerConfig,
    step_embed: jnp.ndarray,
    pos: jnp.ndarray,
    ck: jnp.ndarray,  # [L, S, KV*D] (KV*D tp-sharded)
    cv: jnp.ndarray,
    mesh,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One tensor-parallel generation step on plane-form caches.

    Per-chip fused kernels with psums between sub-layers (Megatron-style
    TP, new design beyond the strictly single-device reference,
    src/lib.rs:169-172). Returns (normed hidden, logits, ck, cv)."""
    stack_cfg = cfg.layer_stack()
    inv_freq = nn.rope_inv_freq(stack_cfg.head_dim, stack_cfg.rope_theta)
    cos_row, sin_row = nn.rope_cos_sin(pos.astype(jnp.float32)[None], inv_freq)
    h, ck, cv = fused_layer.tp_decode_step(
        params["layers"], params["tp_pack"], step_embed, stack_cfg,
        ck, cv, pos, cos_row, sin_row, mesh,
    )
    h = nn.rms_norm(h, params["norm"], cfg.rms_norm_eps)
    logits = codec_logits(params, h)[:, 0, :]
    return h, logits, ck, cv


def decode_step(
    params: dict,
    cfg: TalkerConfig,
    step_embed: jnp.ndarray,
    pos: jnp.ndarray,
    cache: nn.KVCache,
) -> tuple[jnp.ndarray, jnp.ndarray, nn.KVCache]:
    """One generation step with a pre-fused input embedding [1, 1, hidden].

    With int8 stream-packed weights and a cache small enough for the VMEM
    slices, the whole 28-layer step runs as ONE streaming Pallas kernel
    (ops/fused_layer.streamed_talker_step, journal R2.4); otherwise the
    standard XLA layer scan. Returns (normed hidden [1,1,hidden],
    logits [1, codec_vocab], cache).
    """
    stack_cfg = cfg.layer_stack()
    if stream_plane_mode(params, cfg, cache):
        kvd = stack_cfg.num_kv_heads * stack_cfg.head_dim
        shape5 = cache.k.shape
        ck = cache.k.reshape(stack_cfg.num_layers, cache.max_seq, kvd)
        cv = cache.v.reshape(stack_cfg.num_layers, cache.max_seq, kvd)
        h, logits, ck, cv = decode_step_planes(
            params, cfg, step_embed, pos, ck, cv
        )
        cache = nn.KVCache(ck.reshape(shape5), cv.reshape(shape5))
        return h, logits, cache
    positions = pos[None].astype(jnp.int32)
    h, cache = forward(params, cfg, step_embed, cache, positions, pos)
    logits = codec_logits(params, h)[:, 0, :]
    return h, logits, cache
