"""Per-frame debug generation: the forensic workhorse for cross-impl diffs.

Replays the production loop (generation/core.py body order) one frame at a
time OUTSIDE ``lax.while_loop``, capturing what the jitted loop never
exposes: per-frame post-penalty logits (top-k), the sampled semantic token,
and the 15 acoustic codes. Token stream is identical to the production loop
(same ops, same order, same uniforms), so a divergence found here is a
divergence there.

TPU equivalent of the reference CLI's low-level debug loop
(/root/reference/src/bin/generate_audio.rs:357-760), which prints per-frame
token/logit lines and binary dumps for first-divergent-frame comparison
against the official Python implementation.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..models import code_predictor as cp
from ..models import talker
from ..ops import sampling


@dataclass
class FrameDebug:
    frame: int
    semantic_token: int
    codes: np.ndarray  # [15] int32
    top_ids: np.ndarray  # [top] int32, post-penalty logits descending
    top_logits: np.ndarray  # [top] float32


@dataclass
class DebugTrace:
    frames: list[FrameDebug] = field(default_factory=list)

    def code_matrix(self) -> np.ndarray:
        """[T, 16] int32 — same layout as the production frames buffer."""
        if not self.frames:
            return np.zeros((0, 16), np.int32)
        return np.stack(
            [np.concatenate([[f.semantic_token], f.codes]) for f in self.frames]
        ).astype(np.int32)


def debug_generate(model, session, top: int = 5) -> DebugTrace:
    """Drive a fresh StreamingSession's state frame-by-frame with capture.

    ``session`` must be unadvanced (frames_emitted == 0). The session's carry
    is consumed; use the returned trace, not the session, afterwards.
    """
    tcfg = model.config.talker
    cpcfg = model.config.code_predictor
    scfg = session.scfg
    state = session.state
    uniforms = session.uniforms
    trailing = session.trailing
    trailing_len = session.trailing_len
    pad = session.pad_embed

    suppression = sampling.build_suppression_mask(
        state.penalty_mask.shape[0], scfg.eos_token_id
    )
    max_new = state.frames.shape[0]
    limit = min(session.options.max_length, max_new)
    tb = trailing.shape[0]
    cp_slices = (
        cp.scan_slices(model.cp_params, cpcfg)
        if cpcfg.decode_mode != "jacobi"
        else None
    )
    trace = DebugTrace()

    token = state.token
    last_hidden = state.last_hidden
    cache = state.cache
    penalty_mask = state.penalty_mask
    pos = state.pos
    done = bool(state.done)

    for i in range(limit):
        if done:
            break
        semantic_embed = talker.embed_codec(model.talker_params, token)[None, None, :]
        if cpcfg.decode_mode == "jacobi":
            codes = cp.predict_acoustic_codes_jacobi(
                model.cp_params, cpcfg, last_hidden, semantic_embed
            )
        else:
            codes = cp.predict_acoustic_codes(
                model.cp_params, cpcfg, last_hidden, semantic_embed, cp_slices
            )

        acoustic_sum = cp.acoustic_embedding_sum(model.cp_params, codes).astype(
            semantic_embed.dtype
        )
        text_add = jnp.where(
            jnp.int32(i) < trailing_len,
            trailing[min(i, tb - 1)],
            pad,
        ).astype(semantic_embed.dtype)[None, None, :]
        step_input = semantic_embed + acoustic_sum + text_add

        hidden, logits, cache = talker.decode_step(
            model.talker_params, tcfg, step_input, pos, cache
        )
        token_count = jnp.int32(i + 1)
        logits = sampling.apply_generation_penalties(
            logits, penalty_mask, suppression, scfg, token_count
        )
        uniform = uniforms[min(i + 1, max_new)]
        next_token = sampling.sample(logits, scfg, uniform)[0]
        penalty_mask = penalty_mask.at[next_token].set(1.0)

        logits_np = np.asarray(logits[0], np.float32)
        order = np.argsort(-logits_np)[:top]
        trace.frames.append(
            FrameDebug(
                frame=i,
                semantic_token=int(token),
                codes=np.asarray(codes, np.int32),
                top_ids=order.astype(np.int32),
                top_logits=logits_np[order],
            )
        )

        last_hidden = hidden
        token = next_token
        pos = pos + 1
        done = bool(token == scfg.eos_token_id)

    return trace


def first_divergence(ours: np.ndarray, ref: np.ndarray) -> dict | None:
    """Locate the first divergent frame between two [T, 16] code matrices.

    Returns None when the overlapping frames agree, else a dict naming the
    frame, the stage (semantic = talker sampling; acoustic group g = code
    predictor head g), and both rows.
    """
    n = min(len(ours), len(ref))
    for i in range(n):
        if not np.array_equal(ours[i], ref[i]):
            groups = np.nonzero(ours[i] != ref[i])[0]
            stage = (
                "semantic (talker sampling)"
                if groups[0] == 0
                else f"acoustic group {int(groups[0])} (code predictor)"
            )
            return {
                "frame": i,
                "stage": stage,
                "divergent_groups": groups.tolist(),
                "ours": ours[i].tolist(),
                "ref": ref[i].tolist(),
            }
    if len(ours) != len(ref):
        return {
            "frame": n,
            "stage": f"length (ours {len(ours)} vs ref {len(ref)} frames)",
            "divergent_groups": [],
            "ours": [],
            "ref": [],
        }
    return None
