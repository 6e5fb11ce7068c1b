"""Batched (throughput-mode) generation: many utterances, one loop.

The per-frame loop is HBM-bandwidth-bound (every frame streams the full
talker + code-predictor weights), so batching B independent utterances
through one vmapped while_loop amortizes the weight reads across streams —
near-B x aggregate throughput on a single chip. This is new TPU-native
capability: the reference is strictly batch-1 (kv_cache.rs:262).

Correctness under vmap: a vmapped while_loop runs its body while ANY stream
is live; the body freezes EOS-done streams (core.generate_frames), so each
stream's output is identical to its single-stream run given the same seed.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from ..models.config import CodePredictorConfig, TalkerConfig
from ..ops import quant, sampling
from . import core, prefill

def _batch_pallas_dequant(mesh) -> bool:
    """Whether batched programs trace the Pallas dequant matmul.

    Default False: the int8 matmul's custom_vmap rule folds the stream axis
    into matmul rows (ops/quant.py:_int8_mm_core_vmap) so a vmapped Pallas
    program reads the batch-invariant weights ONCE (27.6 -> 20.0 ms/frame at
    1.7B int8 batch 8 vs jax.vmap's repeat-the-kernel rule), but the
    cast-fused XLA dequant dot is measured equal-or-better at every batch
    size (19.5 at batch 8, 7.0 at batch 1 — journal R4.8), and it is the
    only path GSPMD can partition when the weights are tp-sharded.
    QWEN3_TTS_BATCH_PALLAS_DEQUANT=1 opts in for A/B runs (unsharded
    only). NOTE: the scope also re-enables the code predictor's fused
    per-layer Pallas path, which vmap grid-repeats per example (journal
    R4.9) — A/B numbers under this flag include that CP regression.
    """
    if mesh is not None:
        return False
    return os.environ.get("QWEN3_TTS_BATCH_PALLAS_DEQUANT") == "1"


# vmap axes: params shared (None), per-utterance tensors batched (0).
_batched_prefill_cv = jax.vmap(
    prefill.custom_voice_impl,
    in_axes=(None, None, None, 0, 0, 0, 0, 0, 0, None),
)

# Clone (x-vector) prompts batch identically to custom-voice: the 10-row
# layout is shared, with a per-stream [hidden] vector at the speaker slot.
# Preset-speaker streams coalesce into the same program by passing their
# codec speaker-token embedding as the vector (bit-identical rows; see
# models/talker.py build_voice_clone_prompt vs build_custom_voice_prompt).
_batched_prefill_clone = jax.vmap(
    prefill.voice_clone_xvector_impl,
    in_axes=(None, None, None, 0, 0, 0, 0, 0, 0, None),
)

_batched_prefill_design = jax.vmap(
    prefill.voice_design_impl,
    in_axes=(None, None, None, 0, 0, 0, 0, 0, 0, 0, None),
)

# ICL clone rows bucket like text: per-stream ref-code sums [Cb, hidden] at a
# shared bucket, true length traced. x-vector-only streams ride the same
# program as the degenerate n_codec=1 (codec_bos-only) case, whose prompt and
# trailing rows are exactly the 10-row x-vector layout's.
_batched_prefill_icl = jax.vmap(
    prefill.voice_clone_icl_impl,
    in_axes=(None, None, None, 0, 0, 0, 0, 0, 0, 0, 0, None),
)

# The unscoped impl with mesh closed to None: the batch entry points below
# own the Pallas-dequant trace scope (their ``mesh`` static arg), and the
# per-chip tp kernels are batch-1-only regardless (tp_plane_mode).
# ``frame_limit`` is batched (axis 0): ICL streams carry per-stream frame
# budgets (the reference's 6-tokens-per-text-token cap, src/lib.rs:915-929);
# uniform batches pass a broadcast [B] array.
_batched_generate = jax.vmap(
    partial(core._generate_frames, mesh=None),
    in_axes=(None, None, None, None, None, 0, 0, 0, None, 0, 0),
)


@partial(
    jax.jit,
    static_argnames=("tcfg", "scfg", "max_new_tokens", "mesh", "w8a8"),
    donate_argnames=("caches",),
)
def prefill_custom_voice_batch(
    talker_params: dict,
    tcfg: TalkerConfig,
    scfg: sampling.SamplingConfig,
    text_ids: jnp.ndarray,  # [B, Tb]
    text_lens: jnp.ndarray,  # [B]
    speaker_ids: jnp.ndarray,  # [B]
    lang_ids: jnp.ndarray,  # [B]
    caches,  # KVCache with leading batch axis on k/v
    uniforms: jnp.ndarray,  # [B, max_new + 1]
    max_new_tokens: int,
    mesh=None,
    w8a8: bool = False,
):
    """Returns (batched GenState, trailing [B, Tb, H], trailing_lens [B], pad)."""
    with quant.pallas_dequant_scope(_batch_pallas_dequant(mesh)), quant.w8a8_scope(w8a8):
        return _batched_prefill_cv(
            talker_params,
            tcfg,
            scfg,
            text_ids,
            text_lens,
            speaker_ids,
            lang_ids,
            caches,
            uniforms,
            max_new_tokens,
        )


@partial(
    jax.jit,
    static_argnames=("tcfg", "scfg", "max_new_tokens", "mesh", "w8a8"),
    donate_argnames=("caches",),
)
def prefill_voice_clone_batch(
    talker_params: dict,
    tcfg: TalkerConfig,
    scfg: sampling.SamplingConfig,
    text_ids: jnp.ndarray,  # [B, Tb]
    text_lens: jnp.ndarray,  # [B]
    speaker_vecs: jnp.ndarray,  # [B, hidden] x-vectors / speaker-token embeds
    lang_ids: jnp.ndarray,  # [B]
    caches,
    uniforms: jnp.ndarray,  # [B, max_new + 1]
    max_new_tokens: int,
    mesh=None,
    w8a8: bool = False,
):
    """Batched x-vector clone prefill (10-row layout, per-stream vectors)."""
    with quant.pallas_dequant_scope(_batch_pallas_dequant(mesh)), quant.w8a8_scope(w8a8):
        return _batched_prefill_clone(
            talker_params, tcfg, scfg, text_ids, text_lens, speaker_vecs,
            lang_ids, caches, uniforms, max_new_tokens,
        )


@partial(
    jax.jit,
    static_argnames=("tcfg", "scfg", "max_new_tokens", "mesh", "w8a8"),
    donate_argnames=("caches",),
)
def prefill_voice_design_batch(
    talker_params: dict,
    tcfg: TalkerConfig,
    scfg: sampling.SamplingConfig,
    text_ids: jnp.ndarray,  # [B, Tb]
    text_lens: jnp.ndarray,  # [B]
    instruct_ids: jnp.ndarray,  # [B, Ib] right-padded ChatML instruct tokens
    instruct_lens: jnp.ndarray,  # [B]
    lang_ids: jnp.ndarray,  # [B]
    caches,
    uniforms: jnp.ndarray,
    max_new_tokens: int,
    mesh=None,
    w8a8: bool = False,
):
    """Batched voice-design prefill ([Ib + 9]-row layout, per-stream
    instructs right-padded to a shared bucket)."""
    with quant.pallas_dequant_scope(_batch_pallas_dequant(mesh)), quant.w8a8_scope(w8a8):
        return _batched_prefill_design(
            talker_params, tcfg, scfg, text_ids, text_lens, instruct_ids,
            instruct_lens, lang_ids, caches, uniforms, max_new_tokens,
        )


@partial(
    jax.jit,
    static_argnames=("tcfg", "scfg", "max_new_tokens", "sequential", "mesh", "w8a8"),
    donate_argnames=("caches",),
)
def prefill_voice_clone_icl_batch(
    talker_params: dict,
    tcfg: TalkerConfig,
    scfg: sampling.SamplingConfig,
    all_text_ids: jnp.ndarray,  # [B, Tb] ref + target + tts_eos, padded
    n_texts: jnp.ndarray,  # [B]
    speaker_vecs: jnp.ndarray,  # [B, hidden]
    codec_rows: jnp.ndarray,  # [B, Cb, hidden] codec_bos + ref sums, padded
    n_codecs: jnp.ndarray,  # [B]
    lang_ids: jnp.ndarray,  # [B]
    caches,
    uniforms: jnp.ndarray,
    max_new_tokens: int,
    sequential: bool = False,
    mesh=None,
    w8a8: bool = False,
):
    """Batched ICL-clone prefill: per-stream ref-code rows at a shared
    bucket, true lengths traced. x-vector-only streams coalesce as the
    degenerate n_codec=1 (codec_bos-only) case — identical rows to the
    10-position x-vector layout (models/talker.py)."""
    fn = _batched_prefill_icl
    if sequential:
        fn = jax.vmap(
            partial(prefill.voice_clone_icl_impl, sequential=True),
            in_axes=(None, None, None, 0, 0, 0, 0, 0, 0, 0, 0, None),
        )
    with quant.pallas_dequant_scope(_batch_pallas_dequant(mesh)), quant.w8a8_scope(w8a8):
        return fn(
            talker_params, tcfg, scfg, all_text_ids, n_texts, speaker_vecs,
            codec_rows, n_codecs, lang_ids, caches, uniforms, max_new_tokens,
        )


@partial(
    jax.jit,
    static_argnames=("tcfg", "cpcfg", "scfg", "mesh", "w8a8"),
    donate_argnames=("states",),
)
def generate_frames_batch(
    talker_params: dict,
    cp_params: dict,
    tcfg: TalkerConfig,
    cpcfg: CodePredictorConfig,
    scfg: sampling.SamplingConfig,
    states: core.GenState,  # leaves batched on axis 0
    trailing: jnp.ndarray,  # [B, Tb, H]
    trailing_lens: jnp.ndarray,  # [B]
    pad_embed: jnp.ndarray,  # [H] (shared)
    uniforms: jnp.ndarray,  # [B, max_new + 1]
    frame_limit: jnp.ndarray,  # [B] per-stream frame budgets
    mesh=None,
    w8a8: bool = False,
) -> core.GenState:
    from dataclasses import replace

    # Tiered decode attention off under vmap: lax.switch with a batched
    # selector lowers to compute-ALL-branches, which would read ~2x the
    # cache instead of less (ops/nn.py LayerStackConfig.decode_tiering).
    tcfg = replace(tcfg, decode_tiering=False)
    # The streaming whole-step kernels (manual DMA, aliased HBM caches) and
    # the per-chip tp kernels are strictly batch-1; strip the packs so
    # vmapped streams use the generic fused/XLA paths.
    talker_params = {
        k: v for k, v in talker_params.items()
        if k not in ("stream_pack", "tp_pack")
    }
    cp_params = {
        k: v for k, v in cp_params.items()
        if k not in ("stream_pack", "tp_pack")
    }
    with quant.pallas_dequant_scope(_batch_pallas_dequant(mesh)), quant.w8a8_scope(w8a8):
        return _batched_generate(
            talker_params,
            cp_params,
            tcfg,
            cpcfg,
            scfg,
            states,
            trailing,
            trailing_lens,
            pad_embed,
            uniforms,
            frame_limit,
        )
