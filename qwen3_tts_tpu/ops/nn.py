"""Shared transformer ops for the talker and code-predictor stacks.

TPU-first design notes
----------------------
* All layer weights are **stacked along a leading layer axis** and the
  transformer runs as a single ``lax.scan`` over layers: one compiled layer
  body instead of 28 unrolled copies. This slashes compile time and lets XLA
  pipeline HBM weight streaming.
* KV caches are fixed-shape ``[num_layers, batch, max_seq, kv_heads, head_dim]``
  arrays updated functionally with ``dynamic_update_slice``; under jit +
  buffer donation XLA performs the update in place — the TPU equivalent of
  the reference's CUDA ``copy2d`` InplaceOp2 (src/models/kv_cache.rs:131-226).
* Attention masks are computed from a traced current-length scalar
  (``position >= cur_len`` -> masked), so prompt lengths can be bucketed and
  padded without affecting results and without recompilation per length.
* Norm/softmax run in float32 and cast back, matching the reference's
  half-precision policy (candle computes rms_norm/softmax in f32 internally).

Behavioral parity reference: /root/reference/src/models/transformer.rs
(QK-norm GQA, SwiGLU MLP, pre-norm residual layout) — re-expressed
functionally for XLA rather than ported.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .quant import mm


@dataclass(frozen=True)
class LayerStackConfig:
    """Shape config for a stack of identical decoder layers."""

    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1e6
    # When set, [3, S] position streams use interleaved MRoPE (mrope_cos_sin);
    # plain [S] positions always use standard RoPE (the two coincide for TTS).
    mrope_section: tuple[int, int, int] | None = None
    # Opt-in lax.switch static-window decode attention. MEASURED SLOWER on
    # TPU v5e (10.96 vs 9.51 ms/frame at the 2048 bucket): the in-loop
    # branch defeats XLA's pipelining of one dense cache read (journal
    # R2.2). Long-generation attention cost is instead handled by segmented
    # cache growth at the session level (pipeline.StreamingSession), which
    # keeps every compiled program branch-free. Primitive kept
    # correctness-tested for future work.
    decode_tiering: bool = False


class KVCache(NamedTuple):
    """Pre-allocated per-stack KV cache.

    k, v: [num_layers, batch, max_seq, num_kv_heads, head_dim]
    """

    k: jnp.ndarray
    v: jnp.ndarray

    @property
    def max_seq(self) -> int:
        return self.k.shape[2]


def init_kv_cache(
    cfg: LayerStackConfig, batch: int, max_seq: int, dtype=jnp.bfloat16
) -> KVCache:
    shape = (cfg.num_layers, batch, max_seq, cfg.num_kv_heads, cfg.head_dim)
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """RMSNorm with float32 accumulation, cast back to input dtype."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def rope_inv_freq(head_dim: int, theta: float) -> jnp.ndarray:
    """[head_dim/2] inverse frequencies: theta^(-2i/D), float32."""
    exponents = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    return 1.0 / (theta**exponents)


def rope_cos_sin(
    positions: jnp.ndarray, inv_freq: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables [..., head_dim/2] for float32 positions.

    The model's MRoPE section [24, 20, 20] degenerates to standard RoPE for
    TTS because all three position streams carry the same value
    (reference: src/models/transformer.rs:154-181), so a single table
    suffices. For genuinely multimodal position streams use
    ``mrope_cos_sin``.
    """
    freqs = positions[..., None].astype(jnp.float32) * inv_freq
    return jnp.cos(freqs), jnp.sin(freqs)


def mrope_cos_sin(
    positions_thw: jnp.ndarray,  # [3, S] temporal/height/width position streams
    inv_freq: jnp.ndarray,  # [head_dim/2]
    mrope_section: tuple[int, int, int],
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Interleaved multimodal RoPE tables [S, head_dim/2].

    Frequency-index layout follows the HF Qwen3-Omni interleaved convention
    (modeling_qwen3_omni_moe.apply_interleaved_mrope): start from the
    temporal stream everywhere, then the height stream overwrites indices
    ``1::3`` below ``3*section[1]`` and the width stream ``2::3`` below
    ``3*section[2]`` — [T H W T H W ... T T], preserving frequency
    continuity per stream. When the three streams are equal this reduces
    exactly to ``rope_cos_sin`` (the TTS degeneracy the reference relies on,
    transformer.rs:112-182); carrying the full machinery guards against a
    future checkpoint conditioning T/H/W separately.
    """
    freqs = positions_thw[:, :, None].astype(jnp.float32) * inv_freq  # [3, S, D/2]
    idx = jnp.arange(inv_freq.shape[0])
    h_mask = (idx % 3 == 1) & (idx < 3 * mrope_section[1])
    w_mask = (idx % 3 == 2) & (idx < 3 * mrope_section[2])
    out = jnp.where(h_mask, freqs[1], freqs[0])
    out = jnp.where(w_mask, freqs[2], out)
    return jnp.cos(out), jnp.sin(out)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Split-half rotary embedding on [..., seq, heads, head_dim].

    cos/sin: [seq, head_dim/2] (broadcast over batch and heads).
    """
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    cos = cos[..., :, None, :].astype(x.dtype)
    sin = sin[..., :, None, :].astype(x.dtype)
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


def swiglu(x: jnp.ndarray, gate_w: jnp.ndarray, up_w: jnp.ndarray, down_w: jnp.ndarray) -> jnp.ndarray:
    """SwiGLU MLP; weights pre-transposed to [in, out]."""
    gate = jax.nn.silu(x @ gate_w)
    return (gate * (x @ up_w)) @ down_w


def swiglu_layer(layer_params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """SwiGLU using either fused [gate|up] or separate projections."""
    if "gateup_proj" in layer_params:
        gu = mm(x, layer_params["gateup_proj"])
        inter = gu.shape[-1] // 2
        return mm(jax.nn.silu(gu[..., :inter]) * gu[..., inter:], layer_params["down_proj"])
    gate = jax.nn.silu(mm(x, layer_params["gate_proj"]))
    return mm(gate * mm(x, layer_params["up_proj"]), layer_params["down_proj"])


def gqa_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray | None,
    scale: float,
) -> jnp.ndarray:
    """Grouped-query attention.

    q: [B, Sq, H, D]; k, v: [B, Sk, KV, D]; H = KV * G.
    mask: broadcastable to [B, 1, 1, Sq, Sk] boolean, True = attend.
    Returns [B, Sq, H, D]. Softmax in float32.
    """
    b, sq, h, d = q.shape
    kv = k.shape[2]
    g = h // kv
    qg = q.reshape(b, sq, kv, g, d)
    # scores: [B, KV, G, Sq, Sk]
    scores = jnp.einsum("bqkgd,bskd->bkgqs", qg, k, preferred_element_type=jnp.float32)
    scores = scores * jnp.float32(scale)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.float32(-1e30))
    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bkgqs,bskd->bqkgd", weights, v)
    return out.reshape(b, sq, h, d)


def decode_attention_tiers(max_seq: int, base: int = 256) -> tuple[int, ...]:
    """Static cache-window tiers (256, 512, 1024, ..., max_seq)."""
    tiers: list[int] = []
    w = base
    while w < max_seq:
        tiers.append(w)
        w *= 2
    tiers.append(max_seq)
    return tuple(tiers)


def tiered_decode_attention(
    q: jnp.ndarray,  # [B, 1, H, D]
    cache_k: jnp.ndarray,  # [B, max_seq, KV, D]
    cache_v: jnp.ndarray,
    mask: jnp.ndarray,  # broadcastable to [B, KV, G, 1, max_seq]
    scale: float,
    pos: jnp.ndarray,  # [] int32: row just written (highest live index)
) -> jnp.ndarray:
    """Decode attention over the smallest static window covering ``pos``.

    ``lax.switch`` selects one of the ``decode_attention_tiers`` windows, so
    the HBM read per frame tracks the live prefix instead of the full bucket
    (journal R1.8/R1.9: the blocked flash loop lost to dense XLA attention,
    but static windows keep XLA's one-big-dense-read pipelining while
    shrinking the read). Exact: every window covers all unmasked rows.
    """
    max_seq = cache_k.shape[1]
    tiers = decode_attention_tiers(max_seq)
    idx = jnp.int32(0)
    for t in tiers[:-1]:
        idx = idx + (pos + 1 > t).astype(jnp.int32)

    def make_branch(w: int):
        def branch(args):
            q_, ck, cv, m = args
            return gqa_attention(q_, ck[:, :w], cv[:, :w], m[..., :w], scale)

        return branch

    return jax.lax.switch(idx, [make_branch(w) for w in tiers], (q, cache_k, cache_v, mask))


DECODE_FLASH_BLOCK = 256


def decode_attention_flash(
    q: jnp.ndarray,  # [B, 1, H, D]
    cache_k: jnp.ndarray,  # [B, max_seq, KV, D]
    cache_v: jnp.ndarray,
    pos: jnp.ndarray,  # [] int32 current query position (row already written)
    scale: float,
) -> jnp.ndarray:
    """Online-softmax decode attention over only the live cache prefix.

    Dense decode attention touches all ``max_seq`` rows every frame even when
    only ``pos+1`` are live — at the 2048-frame bucket that is ~2300 rows
    from frame one. This flash-style loop processes 256-row blocks with a
    dynamic trip count of ``pos // 256 + 1``, so attention cost tracks the
    actual sequence length. Mathematically identical softmax (running
    max/denominator); returns [B, 1, H, D].
    """
    b, _, h, d = q.shape
    kv = cache_k.shape[2]
    g = h // kv
    blk = DECODE_FLASH_BLOCK
    qg = q.reshape(b, kv, g, d)

    max_seq = cache_k.shape[1]

    def body(i, carry):
        m, l, acc = carry
        # dynamic_slice clamps the start when the final block would overrun a
        # non-multiple max_seq; mask by GLOBAL row index so clamped overlap
        # rows (already seen by the previous block) contribute nothing.
        start = jnp.minimum(i * blk, max_seq - blk)
        k_blk = jax.lax.dynamic_slice(cache_k, (0, start, 0, 0), (b, blk, kv, d))
        v_blk = jax.lax.dynamic_slice(cache_v, (0, start, 0, 0), (b, blk, kv, d))
        scores = jnp.einsum(
            "bkgd,bskd->bkgs", qg, k_blk, preferred_element_type=jnp.float32
        ) * jnp.float32(scale)
        global_idx = start + jnp.arange(blk, dtype=jnp.int32)
        valid = (global_idx <= pos) & (global_idx >= i * blk)
        scores = jnp.where(valid[None, None, None, :], scores, jnp.float32(-1e30))
        m_new = jnp.maximum(m, scores.max(axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)  # [b, kv, g, 1]
        p = jnp.exp(scores - m_new)  # [b, kv, g, s]
        l = l * alpha + p.sum(axis=-1, keepdims=True)
        pv = jnp.einsum("bkgs,bskd->bkgd", p, v_blk.astype(jnp.float32))
        acc = acc * alpha + pv
        return m_new, l, acc

    n_blocks = pos // blk + 1
    m0 = jnp.full((b, kv, g, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, kv, g, 1), jnp.float32)
    acc0 = jnp.zeros((b, kv, g, d), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
    out = acc / l
    return out.reshape(b, 1, h, d).astype(q.dtype)


def _attention_block(
    layer_params: dict,
    x: jnp.ndarray,
    cfg: LayerStackConfig,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    write_pos: jnp.ndarray,
    mask: jnp.ndarray | None,
    self_only: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """QKV projection + QK-norm + RoPE + cache update + GQA attention.

    x: [B, S, hidden]. cache_k/v: [B, max_seq, KV, D]; the S new K/V rows are
    written at ``write_pos`` and attention runs against the full cache with
    ``mask`` hiding unwritten positions.

    ``self_only=True`` (fresh-cache prefill fast path): attention reads only
    the S freshly projected K/V rows instead of the full ``max_seq`` cache —
    an S x S problem instead of S x max_seq. Exact when the cache holds no
    earlier live rows (write_pos == 0 into a fresh cache): the mask already
    hid every other row, this skips reading them (results agree to f32
    summation order — the skipped columns were exact softmax zeros, but the
    narrower reduction rounds ~1 ulp differently). ``mask`` must then be
    [..., Sq, S].
    """
    b, s, _ = x.shape
    q_dim = cfg.num_heads * cfg.head_dim
    kv_dim = cfg.num_kv_heads * cfg.head_dim
    if "qkv_proj" in layer_params:
        # Fused single-pass projection (see weights.fuse_layer_params).
        qkv = mm(x, layer_params["qkv_proj"])
        q, k, v = (
            qkv[..., :q_dim],
            qkv[..., q_dim : q_dim + kv_dim],
            qkv[..., q_dim + kv_dim :],
        )
    else:
        q = mm(x, layer_params["q_proj"])
        k = mm(x, layer_params["k_proj"])
        v = mm(x, layer_params["v_proj"])
    q = q.reshape(b, s, cfg.num_heads, cfg.head_dim)
    k = k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
    v = v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)

    # Per-head RMSNorm on Q and K (Qwen3 QK-norm).
    q = rms_norm(q, layer_params["q_norm"], cfg.rms_norm_eps)
    k = rms_norm(k, layer_params["k_norm"], cfg.rms_norm_eps)

    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    cache_k = jax.lax.dynamic_update_slice(cache_k, k.astype(cache_k.dtype), (0, write_pos, 0, 0))
    cache_v = jax.lax.dynamic_update_slice(cache_v, v.astype(cache_v.dtype), (0, write_pos, 0, 0))

    scale = 1.0 / (cfg.head_dim**0.5)
    # Decode steps use tiered static-window attention (see
    # tiered_decode_attention). The earlier blocked flash loop
    # (decode_attention_flash) measured SLOWER than dense (10.08 vs 9.92
    # ms/frame at the 2048 bucket) because of its sequential block loop;
    # static windows keep the dense read pattern but shrink it.
    if self_only:
        # Cast through the cache dtype so the operands match what the
        # full-cache read path would have attended against.
        attn = gqa_attention(
            q, k.astype(cache_k.dtype), v.astype(cache_v.dtype), mask, scale
        )
    elif s == 1 and cfg.decode_tiering and cache_k.shape[1] > 512 and mask is not None:
        attn = tiered_decode_attention(q, cache_k, cache_v, mask, scale, write_pos)
    else:
        attn = gqa_attention(q, cache_k, cache_v, mask, scale)
    out = mm(attn.reshape(b, s, cfg.num_heads * cfg.head_dim), layer_params["o_proj"])
    return out, cache_k, cache_v


def decoder_layer(
    layer_params: dict,
    x: jnp.ndarray,
    cfg: LayerStackConfig,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    write_pos: jnp.ndarray,
    mask: jnp.ndarray | None,
    self_only: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pre-norm decoder layer: RMSNorm -> attn -> +res -> RMSNorm -> MLP -> +res.

    The reference fuses residual-add + post-norm in a CUDA kernel
    (src/models/fused_ops.rs); under XLA the identical add+rsqrt+mul chain is
    fused automatically, so no Pallas kernel is needed here.
    """
    attn_out, cache_k, cache_v = _attention_block(
        layer_params,
        rms_norm(x, layer_params["input_ln"], cfg.rms_norm_eps),
        cfg,
        cos,
        sin,
        cache_k,
        cache_v,
        write_pos,
        mask,
        self_only=self_only,
    )
    h = x + attn_out
    mlp_out = swiglu_layer(
        layer_params, rms_norm(h, layer_params["post_ln"], cfg.rms_norm_eps)
    )
    return h + mlp_out, cache_k, cache_v


def run_layer_stack_nocache(
    stacked_params: dict,
    x: jnp.ndarray,
    cfg: LayerStackConfig,
) -> jnp.ndarray:
    """Causal self-attention over a short full sequence with no KV cache.

    Used by the code predictor's Jacobi decoder where the whole 16-token
    frame is recomputed per iteration — cheaper than cache bookkeeping at
    this length.
    """
    s = x.shape[1]
    inv_freq = rope_inv_freq(cfg.head_dim, cfg.rope_theta)
    positions = jnp.arange(s, dtype=jnp.float32)
    cos, sin = rope_cos_sin(positions, inv_freq)
    mask = jnp.tril(jnp.ones((s, s), bool))[None, None, None]

    q_dim = cfg.num_heads * cfg.head_dim
    kv_dim = cfg.num_kv_heads * cfg.head_dim

    def body(h, layer_params):
        b = h.shape[0]
        h_norm = rms_norm(h, layer_params["input_ln"], cfg.rms_norm_eps)
        if "qkv_proj" in layer_params:
            qkv = mm(h_norm, layer_params["qkv_proj"])
            q = qkv[..., :q_dim]
            k = qkv[..., q_dim : q_dim + kv_dim]
            v = qkv[..., q_dim + kv_dim :]
        else:
            q = mm(h_norm, layer_params["q_proj"])
            k = mm(h_norm, layer_params["k_proj"])
            v = mm(h_norm, layer_params["v_proj"])
        q = rms_norm(q.reshape(b, s, cfg.num_heads, cfg.head_dim), layer_params["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim), layer_params["k_norm"], cfg.rms_norm_eps)
        v = v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = gqa_attention(q, k, v, mask, 1.0 / cfg.head_dim**0.5)
        h = h + mm(attn.reshape(b, s, cfg.num_heads * cfg.head_dim), layer_params["o_proj"])
        mlp_out = swiglu_layer(
            layer_params, rms_norm(h, layer_params["post_ln"], cfg.rms_norm_eps)
        )
        return h + mlp_out, None

    h, _ = jax.lax.scan(body, x, stacked_params)
    return h


def run_layer_stack(
    stacked_params: dict,
    x: jnp.ndarray,
    cfg: LayerStackConfig,
    cache: KVCache,
    positions: jnp.ndarray,
    write_pos: jnp.ndarray,
    self_attn_prefill: bool = False,
) -> tuple[jnp.ndarray, KVCache]:
    """Run all layers via lax.scan against the full pre-allocated cache.

    x: [B, S, hidden] new token embeddings at absolute ``positions`` [S]
    (int32); their K/V rows are written starting at cache row ``write_pos``.
    Works for prefill (S = padded prompt length, write_pos = offset) and
    decode (S = 1) alike.

    Masking invariant: prompts are *right*-padded, so any garbage cache row
    always sits strictly above every valid query position until the write
    frontier overwrites it. A pure causal mask ``key_row <= query_position``
    is therefore exact — no separate valid-length term, and bucketing prompt
    lengths never changes results.

    ``self_attn_prefill=True``: caller guarantees this is a fresh-cache
    prefill (write_pos == 0, no earlier live rows). Attention then runs over
    only the S new rows (S x S) instead of the whole ``max_seq`` bucket —
    identical up to f32 summation order (the bucket rows it skips were all
    masked to exact softmax zeros), and the attention read shrinks by
    max_seq/S (~16x for a 128-row prompt in a 2096-row cache). This was the
    dominant prefill cost on the TTFA path (reference FA2-prefill
    equivalent: src/models/transformer.rs:289-325).
    """
    max_seq = cache.max_seq

    inv_freq = rope_inv_freq(cfg.head_dim, cfg.rope_theta)
    if positions.ndim == 2:  # [3, S] multimodal streams -> interleaved MRoPE
        assert cfg.mrope_section is not None, "mrope positions need mrope_section"
        cos, sin = mrope_cos_sin(positions, inv_freq, cfg.mrope_section)
        positions = positions[0]  # temporal stream orders the causal mask
    else:
        cos, sin = rope_cos_sin(positions.astype(jnp.float32), inv_freq)

    if self_attn_prefill:
        # Keys are the S fresh rows at ``positions``; causal over the prompt.
        mask = positions[None, :] <= positions[:, None]
        mask = mask[None, None, None, :, :]  # [B=1, KV=1, G=1, Sq, S]
    else:
        key_pos = jnp.arange(max_seq, dtype=jnp.int32)
        mask = key_pos[None, :] <= positions[:, None]
        mask = mask[None, None, None, :, :]  # [B=1, KV=1, G=1, Sq, Sk]

    def body(h, layer_inputs):
        layer_params, ck, cv = layer_inputs
        h, ck, cv = decoder_layer(
            layer_params, h, cfg, cos, sin, ck, cv, write_pos, mask,
            self_only=self_attn_prefill,
        )
        return h, (ck, cv)

    h, (new_k, new_v) = jax.lax.scan(body, x, (stacked_params, cache.k, cache.v))
    return h, KVCache(new_k, new_v)
