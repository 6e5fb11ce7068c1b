"""Jitted prefill programs: prompt assembly + prefill + first-token sampling.

One XLA program per variant x bucket builds the prompt embedding **on
device** (the reference assembles prompts with dozens of small eager tensor
ops, src/models/talker.rs:451-710 — each of those would be a host dispatch
here), runs the layer stack, samples the first semantic token, and returns
the generation carry plus the trailing-text schedule. Speaker and language
condition via traced scalars, so switching voices never recompiles.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models import talker
from ..models.config import TalkerConfig
from ..ops import nn, quant, sampling
from . import core


def _finish(
    talker_params: dict,
    tcfg: TalkerConfig,
    scfg: sampling.SamplingConfig,
    prompt: jnp.ndarray,
    prefill_len: jnp.ndarray,
    cache: nn.KVCache,
    uniforms: jnp.ndarray,
    max_new_tokens: int,
    trailing: jnp.ndarray,
    trailing_len: jnp.ndarray,
    mesh=None,
):
    # Trace-scoped dequant routing: sharded prefill programs must not emit
    # the non-partitionable Pallas dequant matmul (ops/quant.py). Disable
    # is sticky, so mesh=None here never re-enables inside an outer
    # sharded scope (the batch entry points).
    with quant.pallas_dequant_scope(mesh is None):
        last, logits, cache = talker.prefill(
            talker_params, tcfg, prompt, prefill_len, cache
        )
        state = core.init_state(
            scfg, logits, last, prefill_len, cache, uniforms, max_new_tokens
        )
        pad = talker.tts_pad_embed(talker_params)[0]
    return state, trailing, trailing_len, pad


def custom_voice_impl(
    talker_params: dict,
    tcfg: TalkerConfig,
    scfg: sampling.SamplingConfig,
    text_ids: jnp.ndarray,  # [Tb] right-padded
    text_len: jnp.ndarray,  # [] int32
    speaker_id: jnp.ndarray,  # [] int32 codec speaker token
    lang_id: jnp.ndarray,  # [] int32 codec language token
    cache: nn.KVCache,
    uniforms: jnp.ndarray,
    max_new_tokens: int,
    *,
    mesh=None,
):
    prompt = talker.build_custom_voice_prompt(
        talker_params, text_ids[0], speaker_id, lang_id
    )
    trailing = talker.build_trailing_text(talker_params, text_ids, text_len)
    return _finish(
        talker_params,
        tcfg,
        scfg,
        prompt,
        jnp.int32(prompt.shape[1]),
        cache,
        uniforms,
        max_new_tokens,
        trailing,
        text_len,
        mesh=mesh,
    )


prefill_custom_voice = partial(
    jax.jit,
    static_argnames=("tcfg", "scfg", "max_new_tokens", "mesh"),
    donate_argnames=("cache",),
)(custom_voice_impl)


def voice_design_impl(
    talker_params: dict,
    tcfg: TalkerConfig,
    scfg: sampling.SamplingConfig,
    text_ids: jnp.ndarray,  # [Tb]
    text_len: jnp.ndarray,
    instruct_ids: jnp.ndarray,  # [Ib] right-padded ChatML instruct tokens
    instruct_len: jnp.ndarray,
    lang_id: jnp.ndarray,
    cache: nn.KVCache,
    uniforms: jnp.ndarray,
    max_new_tokens: int,
    *,
    mesh=None,
):
    ib = instruct_ids.shape[0]
    instruct_emb = talker.embed_text(talker_params, instruct_ids)  # [Ib, H]
    suffix = talker.build_voice_design_suffix(talker_params, text_ids[0], lang_id)
    # Right-padded prompt: instruct rows then the 9 suffix rows at instruct_len.
    prompt = jnp.zeros((1, ib + 9, suffix.shape[-1]), suffix.dtype)
    prompt = jax.lax.dynamic_update_slice(prompt, instruct_emb[None], (0, 0, 0))
    prompt = jax.lax.dynamic_update_slice(prompt, suffix[None], (0, instruct_len, 0))
    trailing = talker.build_trailing_text(talker_params, text_ids, text_len)
    return _finish(
        talker_params,
        tcfg,
        scfg,
        prompt,
        instruct_len + 9,
        cache,
        uniforms,
        max_new_tokens,
        trailing,
        text_len,
        mesh=mesh,
    )


prefill_voice_design = partial(
    jax.jit,
    static_argnames=("tcfg", "scfg", "max_new_tokens", "mesh"),
    donate_argnames=("cache",),
)(voice_design_impl)


def voice_clone_xvector_impl(
    talker_params: dict,
    tcfg: TalkerConfig,
    scfg: sampling.SamplingConfig,
    text_ids: jnp.ndarray,
    text_len: jnp.ndarray,
    speaker_embed: jnp.ndarray,  # [hidden]
    lang_id: jnp.ndarray,
    cache: nn.KVCache,
    uniforms: jnp.ndarray,
    max_new_tokens: int,
    *,
    mesh=None,
):
    prompt = talker.build_voice_clone_prompt(
        talker_params, text_ids[0], speaker_embed, lang_id, icl_mode=False
    )
    trailing = talker.build_trailing_text(talker_params, text_ids, text_len)
    return _finish(
        talker_params,
        tcfg,
        scfg,
        prompt,
        jnp.int32(prompt.shape[1]),
        cache,
        uniforms,
        max_new_tokens,
        trailing,
        text_len,
        mesh=mesh,
    )


prefill_voice_clone_xvector = partial(
    jax.jit,
    static_argnames=("tcfg", "scfg", "max_new_tokens", "mesh"),
    donate_argnames=("cache",),
)(voice_clone_xvector_impl)


def voice_clone_icl_impl(
    talker_params: dict,
    tcfg: TalkerConfig,
    scfg: sampling.SamplingConfig,
    all_text_ids: jnp.ndarray,  # [Tb] ref + target + tts_eos
    n_text: jnp.ndarray,
    speaker_embed: jnp.ndarray,  # [hidden]
    codec_rows: jnp.ndarray,  # [Cb, hidden] codec_bos + ref codec sums, padded
    n_codec: jnp.ndarray,
    lang_id: jnp.ndarray,
    cache: nn.KVCache,
    uniforms: jnp.ndarray,
    max_new_tokens: int,
    sequential: bool = False,
    *,
    mesh=None,
):
    base = talker.build_voice_clone_prompt(
        talker_params,
        all_text_ids[0],  # unused in ICL mode (no first-text position)
        speaker_embed,
        lang_id,
        icl_mode=True,
    )  # [1, 9, H]
    if sequential:
        icl_rows, trailing, trailing_len = talker.build_icl_rows_sequential(
            talker_params, all_text_ids, n_text, codec_rows, n_codec
        )
        icl_len = n_text + n_codec
    else:
        icl_rows, trailing, trailing_len = talker.build_icl_rows(
            talker_params, all_text_ids, n_text, codec_rows, n_codec
        )
        icl_len = n_codec
    prompt = jnp.concatenate([base, icl_rows], axis=1)
    prefill_len = base.shape[1] + icl_len
    return _finish(
        talker_params,
        tcfg,
        scfg,
        prompt,
        prefill_len,
        cache,
        uniforms,
        max_new_tokens,
        trailing,
        trailing_len,
        mesh=mesh,
    )


prefill_voice_clone_icl = partial(
    jax.jit,
    static_argnames=("tcfg", "scfg", "max_new_tokens", "sequential", "mesh"),
    donate_argnames=("cache",),
)(voice_clone_icl_impl)
