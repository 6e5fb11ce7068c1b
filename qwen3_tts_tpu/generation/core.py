"""Fully-jitted autoregressive generation core.

The reference spends most of its engineering minimizing per-frame GPU
syncs, landing at one 4-byte device->host read per frame for the EOS check
(src/lib.rs:530-656). On TPU the idiomatic answer dissolves that machinery:
the entire frame loop is a single ``lax.while_loop`` inside one XLA program.
The EOS check lives in the loop *condition* on-device, the KV caches are
donated fixed-shape buffers updated in place, the repetition-penalty mask is
a scattered update in the carry, and the seeded uniform sequence is a
precomputed constant — **zero** host round-trips until the final frame
tensor is fetched.

Per-frame body (mirrors the reference loop order, src/lib.rs:580-652):
  1. embed current semantic token,
  2. code predictor: 15 acoustic codes (argmax, deterministic),
  3. store frame [semantic, acoustic x15],
  4. residual-VQ fuse: semantic embed + sum(acoustic embeds) + trailing text,
  5. talker decode step -> logits,
  6. penalties (repetition, suppression, min-new-tokens) -> sample,
  7. update penalty mask / counters; done := (next == EOS).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models import code_predictor as cp
from ..models import talker
from ..models import tokens as T
from ..models.config import CodePredictorConfig, TalkerConfig
from ..ops import nn, sampling


class GenState(NamedTuple):
    """Carried state of the generation while_loop (a donatable pytree)."""

    cache: nn.KVCache  # talker KV cache (inside generate_frames' while_loop
    # the stream-kernel path carries it as ([L,S,KV*D], [L,S,KV*D]) planes)
    last_hidden: jnp.ndarray  # [1, 1, hidden] normed talker hidden
    token: jnp.ndarray  # [] int32 current semantic token
    penalty_mask: jnp.ndarray  # [codec_vocab] float32
    frames: jnp.ndarray  # [max_new, 16] int32
    frame_idx: jnp.ndarray  # [] int32 frames generated so far
    pos: jnp.ndarray  # [] int32 next talker cache write position
    done: jnp.ndarray  # [] bool


def init_state(
    scfg: sampling.SamplingConfig,
    prefill_logits: jnp.ndarray,
    last_hidden: jnp.ndarray,
    prefill_len: jnp.ndarray,
    cache: nn.KVCache,
    uniforms: jnp.ndarray,
    max_new_tokens: int,
) -> GenState:
    """Sample the first semantic token from prefill logits and seed the carry."""
    vocab = prefill_logits.shape[-1]
    penalty_mask = jnp.zeros((vocab,), jnp.float32)
    suppression = sampling.build_suppression_mask(vocab, scfg.eos_token_id)
    logits = sampling.apply_generation_penalties(
        prefill_logits, penalty_mask, suppression, scfg, jnp.int32(0)
    )
    token = sampling.sample(logits, scfg, uniforms[0])[0]
    penalty_mask = penalty_mask.at[token].set(1.0)
    return GenState(
        cache=cache,
        last_hidden=last_hidden,
        token=token,
        penalty_mask=penalty_mask,
        frames=jnp.zeros((max_new_tokens, T.NUM_CODE_GROUPS), jnp.int32),
        frame_idx=jnp.int32(0),
        pos=prefill_len.astype(jnp.int32),
        done=token == scfg.eos_token_id,
    )


def generate_frames(
    talker_params: dict,
    cp_params: dict,
    tcfg: TalkerConfig,
    cpcfg: CodePredictorConfig,
    scfg: sampling.SamplingConfig,
    state: GenState,
    trailing: jnp.ndarray,  # [Tb, hidden] per-frame text additions
    trailing_len: jnp.ndarray,  # [] int32
    pad_embed: jnp.ndarray,  # [hidden] tts_pad addition after trailing
    uniforms: jnp.ndarray,  # [max_new + 1] float32 seeded uniform stream
    frame_limit: jnp.ndarray,  # [] int32: run until frame_idx reaches this
    mesh=None,  # jax.sharding.Mesh for tp/dp serving (None = single chip)
) -> GenState:
    """Advance the loop until EOS or ``frame_limit`` frames exist.

    Non-streaming passes frame_limit = max_new_tokens; streaming re-enters
    with the returned carry and a raised limit, one chunk at a time.
    ``mesh`` routes decode steps to the tensor-parallel kernels
    (talker.decode_step_planes_tp) and scopes the Pallas dequant matmul off
    for the GSPMD-sharded remainder of the program (ops/quant.py).
    """
    from ..ops import quant

    with quant.pallas_dequant_scope(mesh is None):
        return _generate_frames(
            talker_params, cp_params, tcfg, cpcfg, scfg, state, trailing,
            trailing_len, pad_embed, uniforms, frame_limit, mesh,
        )


def _generate_frames(
    talker_params: dict,
    cp_params: dict,
    tcfg: TalkerConfig,
    cpcfg: CodePredictorConfig,
    scfg: sampling.SamplingConfig,
    state: GenState,
    trailing: jnp.ndarray,
    trailing_len: jnp.ndarray,
    pad_embed: jnp.ndarray,
    uniforms: jnp.ndarray,
    frame_limit: jnp.ndarray,
    mesh,
) -> GenState:
    suppression = sampling.build_suppression_mask(
        state.penalty_mask.shape[0], scfg.eos_token_id
    )
    # Stream-kernel mode: carry the KV cache as the kernel's [L, S, KV*D]
    # planes across the WHOLE loop. The 5-D <-> plane reshape then happens
    # once per loop entry/exit instead of per frame (the per-step reshape
    # materialized ~0.27 ms/frame of layout copies at 1.7B).
    # Under a serving mesh the same plane carry drives the tensor-parallel
    # per-chip kernels instead (KV*D plane dim sharded over tp).
    tp_mode = talker.tp_plane_mode(talker_params, tcfg, state.cache, mesh)
    plane_mode = tp_mode or (
        mesh is None and talker.stream_plane_mode(talker_params, tcfg, state.cache)
    )
    if plane_mode:
        shape5 = state.cache.k.shape
        layers5, _, seq5, kv5, d5 = shape5
        state = state._replace(
            cache=(
                state.cache.k.reshape(layers5, seq5, kv5 * d5),
                state.cache.v.reshape(layers5, seq5, kv5 * d5),
            )
        )
    max_new = state.frames.shape[0]
    # Never run past the frames buffer: a frame_limit above max_new would
    # clamp dynamic_update_slice writes onto the last row (corrupting it)
    # and re-use the final uniform. Callers clamp max_length to the bucket
    # too; this is the in-loop guarantee.
    frame_limit = jnp.minimum(jnp.asarray(frame_limit, jnp.int32), max_new)
    tb = trailing.shape[0]
    # Hoist the CP scan-table slices out of the while body (0.49 ms/frame
    # of per-frame copies otherwise — see code_predictor.scan_slices).
    cp_slices = cp.scan_slices(cp_params, cpcfg) if cpcfg.decode_mode != "jacobi" else None

    def cond(s: GenState):
        return jnp.logical_not(s.done) & (s.frame_idx < frame_limit)

    def body(s: GenState) -> GenState:
        semantic_embed = talker.embed_codec(talker_params, s.token)[None, None, :]

        if cpcfg.decode_mode == "jacobi":
            codes = cp.predict_acoustic_codes_jacobi(
                cp_params, cpcfg, s.last_hidden, semantic_embed
            )
        else:
            codes = cp.predict_acoustic_codes(
                cp_params, cpcfg, s.last_hidden, semantic_embed, cp_slices
            )
        frame = jnp.concatenate([s.token[None], codes], axis=0)
        frames = jax.lax.dynamic_update_slice(s.frames, frame[None, :], (s.frame_idx, 0))

        acoustic_sum = cp.acoustic_embedding_sum(cp_params, codes).astype(
            semantic_embed.dtype
        )
        text_add = jnp.where(
            s.frame_idx < trailing_len,
            trailing[jnp.minimum(s.frame_idx, tb - 1)],
            pad_embed,
        ).astype(semantic_embed.dtype)[None, None, :]
        step_input = semantic_embed + acoustic_sum + text_add

        if tp_mode:
            hidden, logits, ck, cv = talker.decode_step_planes_tp(
                talker_params, tcfg, step_input, s.pos, *s.cache, mesh
            )
            cache = (ck, cv)
        elif plane_mode:
            hidden, logits, ck, cv = talker.decode_step_planes(
                talker_params, tcfg, step_input, s.pos, *s.cache
            )
            cache = (ck, cv)
        else:
            hidden, logits, cache = talker.decode_step(
                talker_params, tcfg, step_input, s.pos, s.cache
            )

        token_count = s.frame_idx + 1
        logits = sampling.apply_generation_penalties(
            logits, s.penalty_mask, suppression, scfg, token_count
        )
        uniform = uniforms[jnp.minimum(token_count, max_new)]
        next_token = sampling.sample(logits, scfg, uniform)[0]
        penalty_mask = s.penalty_mask.at[next_token].set(1.0)

        # Under vmap (dp-batched serving) the body runs while ANY instance is
        # live; freeze the visible per-lane outputs of instances that already
        # hit EOS so batching is exact. The KV cache and ``pos`` are exempt
        # and advance freely for done lanes: their tokens/frames are frozen
        # above, rows a done lane writes past its live frontier are never
        # read by anything visible, and ``pos`` stays within the cache bound
        # (body runs at most frame_limit <= max_new iterations). Selecting
        # the cache here was 2x ~31 MB of where + copy per frame at 1.7B —
        # it kept the old cache value live across the select, so XLA could
        # not alias the in-place kernel cache update into the loop carry
        # (~0.5 ms/frame of pure data movement in the int8 trace).
        sel = lambda old, upd: jnp.where(s.done, old, upd)  # noqa: E731
        return GenState(
            cache=cache,
            last_hidden=sel(s.last_hidden, hidden),
            token=sel(s.token, next_token),
            penalty_mask=sel(s.penalty_mask, penalty_mask),
            frames=sel(s.frames, frames),
            frame_idx=sel(s.frame_idx, s.frame_idx + 1),
            pos=s.pos + 1,
            done=s.done | (next_token == scfg.eos_token_id),
        )

    final = jax.lax.while_loop(cond, body, state)
    if plane_mode:
        final = final._replace(
            cache=nn.KVCache(
                final.cache[0].reshape(shape5), final.cache[1].reshape(shape5)
            )
        )
    return final


@partial(jax.jit, static_argnames=("tcfg", "scfg", "max_new_tokens"), donate_argnames=("cache",))
def prefill_and_start(
    talker_params: dict,
    tcfg: TalkerConfig,
    scfg: sampling.SamplingConfig,
    prompt: jnp.ndarray,
    prefill_len: jnp.ndarray,
    cache: nn.KVCache,
    uniforms: jnp.ndarray,
    max_new_tokens: int,
) -> GenState:
    """Jitted prefill + first-token sampling, returning the initial carry."""
    last_hidden, logits, cache = talker.prefill(
        talker_params, tcfg, prompt, prefill_len, cache
    )
    return init_state(
        scfg, logits, last_hidden, prefill_len, cache, uniforms, max_new_tokens
    )


@partial(
    jax.jit,
    static_argnames=("tcfg", "cpcfg", "scfg", "mesh"),
    donate_argnames=("state",),
)
def generate_frames_jit(
    talker_params: dict,
    cp_params: dict,
    tcfg: TalkerConfig,
    cpcfg: CodePredictorConfig,
    scfg: sampling.SamplingConfig,
    state: GenState,
    trailing: jnp.ndarray,
    trailing_len: jnp.ndarray,
    pad_embed: jnp.ndarray,
    uniforms: jnp.ndarray,
    frame_limit: jnp.ndarray,
    mesh=None,
) -> GenState:
    return generate_frames(
        talker_params,
        cp_params,
        tcfg,
        cpcfg,
        scfg,
        state,
        trailing,
        trailing_len,
        pad_embed,
        uniforms,
        frame_limit,
        mesh,
    )
