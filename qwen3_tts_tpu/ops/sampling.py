"""On-device sampling pipeline: temperature -> top-k -> top-p -> multinomial.

Pure jnp functions designed to live inside a jitted ``lax.while_loop`` body:
static shapes, no data-dependent control flow, no host transfers. The math
follows the reference's device path (src/generation/sampling.rs:140-319) so
that, given identical logits and the same uniform draw, the same token is
selected:

* top-k keeps every logit >= the k-th largest (ties inclusive),
* top-p sorts descending, softmaxes, and removes tokens whose *exclusive*
  cumulative probability already reached p; tokens equal to the smallest kept
  logit survive,
* multinomial takes the first index whose inclusive cumsum of probabilities
  reaches the uniform draw.

Penalty application order matches src/lib.rs:1271-1322: repetition penalty,
then control-token suppression, then min-new-tokens EOS blocking.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..models import tokens as T

NEG_INF = float("-inf")


@dataclass(frozen=True)
class SamplingConfig:
    """Static sampling hyperparameters (baked into the jitted program)."""

    temperature: float = 0.9
    top_k: int = 50
    top_p: float = 0.9
    repetition_penalty: float = 1.05
    eos_token_id: int = T.CODEC_EOS
    min_new_tokens: int = 2

    @property
    def greedy(self) -> bool:
        return self.temperature < 0.01


def top_k_filter(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Keep logits >= the k-th largest value per row; rest -> -inf."""
    vocab = logits.shape[-1]
    k = min(k, vocab)
    sorted_desc = -jnp.sort(-logits, axis=-1)
    threshold = sorted_desc[..., k - 1 : k]
    return jnp.where(logits >= threshold, logits, NEG_INF)


def top_p_filter(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filtering via descending sort + exclusive-cumsum threshold."""
    sorted_desc = -jnp.sort(-logits, axis=-1)
    probs = jnp.exp(sorted_desc - sorted_desc.max(axis=-1, keepdims=True))
    probs = probs / probs.sum(axis=-1, keepdims=True)
    cumulative = jnp.cumsum(probs, axis=-1)
    exclusive = jnp.concatenate(
        [jnp.zeros_like(cumulative[..., :1]), cumulative[..., :-1]], axis=-1
    )
    removed = exclusive >= jnp.asarray(p, logits.dtype)
    kept = jnp.where(removed, jnp.asarray(float("inf"), logits.dtype), sorted_desc)
    min_kept = kept.min(axis=-1, keepdims=True)
    return jnp.where(logits >= min_kept, logits, NEG_INF)


def multinomial(probs: jnp.ndarray, uniform: jnp.ndarray) -> jnp.ndarray:
    """First index whose inclusive cumulative probability >= uniform.

    ``probs``: [batch, vocab]; ``uniform``: scalar or [batch]. Returns [batch]
    int32 token indices.
    """
    vocab = probs.shape[-1]
    cumulative = jnp.cumsum(probs, axis=-1)
    u = jnp.broadcast_to(jnp.asarray(uniform, probs.dtype), probs.shape[:-1])[..., None]
    hit = cumulative >= u
    positions = jnp.arange(1, vocab + 1, dtype=probs.dtype)
    masked = jnp.where(hit, positions, jnp.asarray(vocab + 1, probs.dtype))
    return jnp.argmin(masked, axis=-1).astype(jnp.int32)


def _fused_top_k_top_p(logits: jnp.ndarray, k: int, p: float) -> jnp.ndarray:
    """top-k then top-p using only the top-k values (no full-vocab sort).

    Equivalent to top_k_filter followed by top_p_filter: after the top-k
    mask only k finite logits remain, so the nucleus statistics are fully
    determined by the k largest values — ``lax.top_k`` (O(V log k)) replaces
    the full descending sort (profiled at ~220 us/frame on the 3072 vocab).

    Tie handling matches the sequential filters: both keep every logit
    >= the final threshold, and tied values contribute equal probabilities,
    so the threshold value is order-independent.
    """
    vocab = logits.shape[-1]
    k = min(k, vocab)
    top_vals, _ = jax.lax.top_k(logits, k)  # [batch, k], descending
    thr_k = top_vals[..., k - 1 : k]

    probs = jnp.exp(top_vals - top_vals[..., :1])
    probs = probs / probs.sum(axis=-1, keepdims=True)
    cumulative = jnp.cumsum(probs, axis=-1)
    exclusive = jnp.concatenate(
        [jnp.zeros_like(cumulative[..., :1]), cumulative[..., :-1]], axis=-1
    )
    removed = exclusive >= jnp.asarray(p, logits.dtype)
    kept = jnp.where(removed, jnp.asarray(float("inf"), logits.dtype), top_vals)
    min_kept = kept.min(axis=-1, keepdims=True)
    threshold = jnp.maximum(min_kept, thr_k)
    return jnp.where(logits >= threshold, logits, NEG_INF)


def sample(
    logits: jnp.ndarray, cfg: SamplingConfig, uniform: jnp.ndarray
) -> jnp.ndarray:
    """Full sampling pipeline on float32 logits [batch, vocab] -> [batch] ids."""
    logits = logits.astype(jnp.float32)
    if cfg.temperature != 1.0 and cfg.temperature > 0.0:
        logits = logits / jnp.float32(cfg.temperature)
    if cfg.greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if cfg.top_k > 0 and 0.0 < cfg.top_p < 1.0:
        logits = _fused_top_k_top_p(logits, cfg.top_k, cfg.top_p)
    elif cfg.top_k > 0:
        logits = top_k_filter(logits, cfg.top_k)
    elif 0.0 < cfg.top_p < 1.0:
        logits = top_p_filter(logits, cfg.top_p)
    probs = jnp.exp(logits - logits.max(axis=-1, keepdims=True))
    probs = probs / probs.sum(axis=-1, keepdims=True)
    return multinomial(probs, uniform)


def build_suppression_mask(
    vocab_size: int = T.CODEC_VOCAB_SIZE, eos_token_id: int = T.CODEC_EOS
) -> jnp.ndarray:
    """Boolean [vocab] mask: True on suppressed control range [vocab-1024, vocab)
    except EOS (reference: src/generation/tts.rs:21-43)."""
    ids = jnp.arange(vocab_size)
    in_range = ids >= (vocab_size - 1024)
    return in_range & (ids != eos_token_id)


def apply_repetition_penalty(
    logits: jnp.ndarray, penalty_mask: jnp.ndarray, penalty: float
) -> jnp.ndarray:
    """Divide positive / multiply negative logits of previously-seen tokens.

    ``penalty_mask``: float [vocab], 1.0 where the token has been sampled
    before (maintained on-device by the generation loop).
    """
    if abs(penalty - 1.0) < 1e-9:
        return logits
    factor = jnp.where(
        logits > 0.0, jnp.float32(1.0 / penalty), jnp.float32(penalty)
    )
    factor = jnp.where(penalty_mask > 0.0, factor, jnp.float32(1.0))
    return logits * factor


def apply_generation_penalties(
    logits: jnp.ndarray,
    penalty_mask: jnp.ndarray,
    suppression_mask: jnp.ndarray,
    cfg: SamplingConfig,
    token_count: jnp.ndarray,
) -> jnp.ndarray:
    """Repetition penalty -> suppression -> min-new-tokens EOS block.

    ``token_count`` is a traced scalar (tokens sampled so far); EOS blocking is
    a select so the jitted body stays branch-free.
    """
    logits = logits.astype(jnp.float32)
    logits = apply_repetition_penalty(logits, penalty_mask, cfg.repetition_penalty)
    logits = jnp.where(suppression_mask, NEG_INF, logits)
    vocab = logits.shape[-1]
    eos_onehot = jnp.arange(vocab) == cfg.eos_token_id
    block_eos = token_count < cfg.min_new_tokens
    return jnp.where(block_eos & eos_onehot, NEG_INF, logits)
