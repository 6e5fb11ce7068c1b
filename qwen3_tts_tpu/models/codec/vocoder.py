"""Decoder12Hz vocoder: 16-codebook codec frames -> 24 kHz waveform.

Pipeline (parity reference: /root/reference/src/models/codec/decoder_12hz.rs):
  1. RVQ de-embed: semantic codebook (codes mod 2048) and 15 summed acoustic
     codebooks, each projected 256 -> 512 by a 1x1 conv, then summed.
     Codebooks are normalized at load: embedding_sum / clamp(cluster_usage).
     The mod-2048 runs on device (the reference round-trips through the CPU
     here, decoder_12hz.rs:424-429 — fixed by design on TPU).
  2. Causal pre-conv k3 512 -> 1024, input_proj -> 512.
  3. 8-layer causal pre-transformer (16 heads x 64, layer-scale, RoPE theta
     1e4, rms eps 1e-5), final norm, output_proj -> 1024.
  4. 2 upsample stages (TransConv x2 + ConvNeXt) -> init conv k7 -> 1536.
  5. 4 BigVGAN decoder blocks (rates 8, 5, 4, 3, channels halving).
  6. Final SnakeBeta + conv k7 -> 1 channel, clamp to [-1, 1].

Total upsampling 2*2*8*5*4*3 = 1920 samples per 80 ms frame. Everything is
causal, so right-padding the frame axis to a static bucket and trimming
1920 * T_true samples is bit-exact — that is how both batch decode (one jit
per bucket) and streaming chunk decode work. Runs in float32, matching the
reference's dtype policy.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import nn as tnn
from . import blocks


@dataclass(frozen=True)
class VocoderConfig:
    codebook_dim: int = 512
    latent_dim: int = 1024
    hidden_size: int = 512
    num_layers: int = 8
    num_heads: int = 16
    head_dim: int = 64
    intermediate_size: int = 1024
    num_quantizers: int = 16
    codebook_size: int = 2048
    codebook_embed_dim: int = 256
    upsampling_ratios: tuple[int, ...] = (2, 2)
    decoder_dim: int = 1536
    upsample_rates: tuple[int, ...] = (8, 5, 4, 3)
    rms_norm_eps: float = 1e-5
    rope_theta: float = 1e4
    final_kernel: int = 7

    @property
    def total_upsample(self) -> int:
        total = 1
        for r in self.upsampling_ratios + self.upsample_rates:
            total *= r
        return total


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _pre_transformer(params: dict, cfg: VocoderConfig, x: jnp.ndarray) -> jnp.ndarray:
    """8 causal attention layers with layer-scale; x: [B, T, hidden]."""
    b, t, _ = x.shape
    h_heads, d = cfg.num_heads, cfg.head_dim

    inv_freq = tnn.rope_inv_freq(d, cfg.rope_theta)
    cos, sin = tnn.rope_cos_sin(jnp.arange(t, dtype=jnp.float32), inv_freq)
    causal = jnp.tril(jnp.ones((t, t), bool))[None, None, None]

    def layer(h, p):
        normed = tnn.rms_norm(h, p["input_ln"], cfg.rms_norm_eps)
        q = (normed @ p["q_proj"]).reshape(b, t, h_heads, d)
        k = (normed @ p["k_proj"]).reshape(b, t, h_heads, d)
        v = (normed @ p["v_proj"]).reshape(b, t, h_heads, d)
        q = tnn.apply_rope(q, cos, sin)
        k = tnn.apply_rope(k, cos, sin)
        attn = tnn.gqa_attention(q, k, v, causal, 1.0 / d**0.5)
        attn = attn.reshape(b, t, h_heads * d) @ p["o_proj"]
        h = h + attn * p["attn_scale"]
        normed = tnn.rms_norm(h, p["post_ln"], cfg.rms_norm_eps)
        mlp = (jax.nn.silu(normed @ p["gate_proj"]) * (normed @ p["up_proj"])) @ p["down_proj"]
        return h + mlp * p["mlp_scale"], None

    h, _ = jax.lax.scan(layer, x, params["layers"])
    return h


def rvq_deembed(params: dict, cfg: VocoderConfig, codes: jnp.ndarray) -> jnp.ndarray:
    """Codes [B, 16, T] int32 -> quantized latent [B, T, codebook_dim]."""
    first = params["first_codebook"][codes[:, 0, :] % cfg.codebook_size]  # [B,T,256]
    first = first @ params["first_output_proj"]  # [B,T,512]

    # Sum the 15 acoustic codebook lookups: one vmapped gather over the
    # stacked [15, codebook_size, 256] tables.
    rest_codes = codes[:, 1:, :]  # [B, 15, T]
    emb = jax.vmap(lambda tbl, ids: tbl[ids], in_axes=(0, 1), out_axes=1)(
        params["rest_codebooks"], rest_codes
    )  # [B, 15, T, 256]
    rest_proj = emb.sum(axis=1) @ params["rest_output_proj"]  # [B, T, 512]
    return first + rest_proj


def decode(params: dict, cfg: VocoderConfig, codes: jnp.ndarray) -> jnp.ndarray:
    """Decode codec tokens [B=1, 16, T] -> waveform [B, T * 1920] float32.

    Runs under ``default_matmul_precision("highest")``: the vocoder is the
    audio-fidelity-critical f32 stage (reference keeps it F32 regardless of
    device, src/lib.rs:344-345), and TPU would otherwise lower f32 convs to
    bf16 passes.
    """
    with jax.default_matmul_precision("highest"):
        return _decode_impl(params, cfg, codes)


def _decode_impl(params: dict, cfg: VocoderConfig, codes: jnp.ndarray) -> jnp.ndarray:
    q = rvq_deembed(params, cfg, codes.astype(jnp.int32)).astype(jnp.float32)

    h = blocks.causal_conv1d(q, params["pre_conv_w"], params["pre_conv_b"])  # -> latent_dim
    h = h @ params["input_proj_w"] + params["input_proj_b"]  # -> hidden
    h = _pre_transformer(params, cfg, h)
    h = tnn.rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
    h = h @ params["output_proj_w"] + params["output_proj_b"]  # -> latent_dim

    for stage, ratio in zip(params["upsample"], cfg.upsampling_ratios):
        h = blocks.upsample_stage(h, stage, ratio)

    h = blocks.causal_conv1d(h, params["init_conv_w"], params["init_conv_b"])
    for block, rate in zip(params["decoder_blocks"], cfg.upsample_rates):
        h = blocks.decoder_block(h, block, rate)

    h = blocks.snake_beta(h, params["final_snake_alpha"], params["final_snake_beta"])
    h = blocks.causal_conv1d(h, params["final_conv_w"], params["final_conv_b"])
    return jnp.clip(h[..., 0], -1.0, 1.0)


@partial(jax.jit, static_argnames=("cfg",))
def decode_jit(params: dict, cfg: VocoderConfig, codes: jnp.ndarray) -> jnp.ndarray:
    return decode(params, cfg, codes)


# ---------------------------------------------------------------------------
# Sample-exact streaming decode
# ---------------------------------------------------------------------------
#
# The reference's streaming vocoder sees only chunk-local context, so its
# streamed audio is merely frame-count-identical to batch decode
# (/root/reference/src/lib.rs streaming; tests/streaming_e2e.rs:150-157).
# This stack is all-causal, which lets us do better: carrying
#   * per-conv left-context rows (exactly each conv's causal pad width —
#     carried zeros at cold start coincide with the batch path's zero
#     left-padding, so the very first chunk is already exact),
#   * a KV cache for the causal pre-transformer (full attention history),
# across chunks makes concat(stream chunks) IDENTICAL to the one-shot batch
# decode, at per-chunk cost equal to chunk-local decode (no margin
# recompute).


def _conv_ctx_rows(k: int, dilation: int = 1) -> int:
    return dilation * (k - 1)


def _tconv_ctx_rows(k: int, stride: int) -> int:
    # Polyphase taps m = 0..ceil(k/s)-1: output u consumes inputs u-m.
    return -(-k // stride) - 1


class VocoderStreamState(NamedTuple):
    """Carried vocoder state for sample-exact chunked decode.

    kv_k, kv_v: [L, B, maxT, H, D] pre-transformer KV cache.
    conv:       nested dict of per-conv left-context rows (each entry is
                the last ``ctx`` input rows seen by that conv, at its own
                time resolution).
    pos:        [] int32 frames decoded so far.
    """

    kv_k: jnp.ndarray
    kv_v: jnp.ndarray
    conv: dict
    pos: jnp.ndarray


def init_stream_state(
    cfg: VocoderConfig, max_frames: int, batch: int = 1
) -> VocoderStreamState:
    """One jitted program builds the whole ~30-leaf state: leaf-by-leaf
    ``jnp.zeros`` would be ~30 separate device dispatches at session start,
    measured directly on the time-to-first-audio path."""
    return _init_stream_state_jit(cfg, max_frames, batch)


@partial(jax.jit, static_argnames=("cfg", "max_frames", "batch"))
def _init_stream_state_jit(
    cfg: VocoderConfig, max_frames: int, batch: int
) -> VocoderStreamState:
    kv_shape = (cfg.num_layers, batch, max_frames, cfg.num_heads, cfg.head_dim)

    def rows(n, ch):
        return jnp.zeros((batch, n, ch), jnp.float32)

    conv: dict = {
        "pre_conv": rows(_conv_ctx_rows(3), cfg.codebook_dim),
        "upsample": [],
        "init_conv": rows(_conv_ctx_rows(7), cfg.latent_dim),
        "blocks": [],
    }
    for ratio in cfg.upsampling_ratios:
        conv["upsample"].append(
            {
                "up": rows(_tconv_ctx_rows(2 * ratio, ratio), cfg.latent_dim),
                "dw": rows(_conv_ctx_rows(7), cfg.latent_dim),
            }
        )
    ch = cfg.decoder_dim
    for rate in cfg.upsample_rates:
        out_ch = ch // 2
        conv["blocks"].append(
            {
                "up": rows(_tconv_ctx_rows(2 * rate, rate), ch),
                "res1": rows(_conv_ctx_rows(7, 1), out_ch),
                "res2": rows(_conv_ctx_rows(7, 3), out_ch),
                "res3": rows(_conv_ctx_rows(7, 9), out_ch),
            }
        )
        ch = out_ch
    conv["final"] = rows(_conv_ctx_rows(cfg.final_kernel), ch)
    return VocoderStreamState(
        kv_k=jnp.zeros(kv_shape, jnp.float32),
        kv_v=jnp.zeros(kv_shape, jnp.float32),
        conv=conv,
        pos=jnp.int32(0),
    )


def _conv_stream(x, state, kernel, bias, dilation: int = 1, groups: int = 1):
    """Streaming causal conv: prepend the carried ``ctx = d*(k-1)`` input
    rows, convolve, return (this chunk's outputs, new carry). Identical math
    to the batch ``causal_conv1d`` rows [pos, pos+T): carried zeros at cold
    start equal the batch path's zero left-padding."""
    ctx = state.shape[1]
    if ctx == 0:
        return blocks.causal_conv1d(x, kernel, bias, dilation, groups), state
    x_ext = jnp.concatenate([state, x], axis=1)
    out = blocks.causal_conv1d(x_ext, kernel, bias, dilation, groups)[:, ctx:, :]
    return out, x_ext[:, -ctx:, :]


def _tconv_stream(x, state, kernel, bias, stride: int):
    """Streaming causal transposed conv (polyphase): output row u*stride+r
    consumes inputs u-m, m < ceil(k/s); carrying those rows makes the kept
    chunk outputs identical to the batch computation."""
    ctx = state.shape[1]
    if ctx == 0:
        return blocks.causal_trans_conv1d(x, kernel, bias, stride), state
    x_ext = jnp.concatenate([state, x], axis=1)
    out = blocks.causal_trans_conv1d(x_ext, kernel, bias, stride)[:, ctx * stride :, :]
    return out, x_ext[:, -ctx:, :]


def _convnext_stream(x, dw_state, p):
    dim = x.shape[-1]
    h, new_dw = _conv_stream(x, dw_state, p["dwconv_w"], p["dwconv_b"], groups=dim)
    h = blocks.layer_norm(h, p["norm_w"], p["norm_b"])
    h = h @ p["pwconv1_w"] + p["pwconv1_b"]
    h = jax.nn.gelu(h, approximate=False)
    h = h @ p["pwconv2_w"] + p["pwconv2_b"]
    return x + h * p["gamma"], new_dw


def _residual_unit_stream(x, st, p, dilation: int):
    from . import fused_blocks

    if fused_blocks.residual_unit_should_fuse(x):
        # Same fused kernel as the batch path (streaming must track batch
        # decode); the carry is the RAW input tail — equivalent to the
        # post-snake carry below since snake is pointwise and snake(0) == 0.
        return fused_blocks.residual_unit_stream(x, st, p, dilation)
    h = blocks.snake_beta(x, p["act1_alpha"], p["act1_beta"])
    h, new_st = _conv_stream(h, st, p["conv1_w"], p["conv1_b"], dilation=dilation)
    h = blocks.snake_beta(h, p["act2_alpha"], p["act2_beta"])
    h = blocks.causal_conv1d(h, p["conv2_w"], p["conv2_b"])  # k=1: no context
    return x + h, new_st


def _pre_transformer_cached(
    params: dict,
    cfg: VocoderConfig,
    x: jnp.ndarray,  # [B, S, hidden] new rows at absolute positions pos..pos+S
    kv_k: jnp.ndarray,  # [L, B, maxT, H, D]
    kv_v: jnp.ndarray,
    pos: jnp.ndarray,  # [] int32
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Streaming pre-transformer: identical math to ``_pre_transformer`` with
    the K/V history read from (and appended to) a cache.

    Bit-parity argument with the batch path: scores/softmax for a query at
    absolute position p cover exactly rows 0..p in both (cache rows beyond
    ``pos+S`` are masked to -1e30 -> exact softmax zeros -> exact 0.0
    contributions in the value sum), and every row-wise matmul reduces over
    the same contraction dim regardless of sequence length.
    """
    b, s, _ = x.shape
    h_heads, d = cfg.num_heads, cfg.head_dim
    max_t = kv_k.shape[2]

    inv_freq = tnn.rope_inv_freq(d, cfg.rope_theta)
    positions = pos + jnp.arange(s, dtype=jnp.int32)
    cos, sin = tnn.rope_cos_sin(positions.astype(jnp.float32), inv_freq)
    key_pos = jnp.arange(max_t, dtype=jnp.int32)
    mask = (key_pos[None, :] <= positions[:, None])[None, None, None]

    def layer(h, inputs):
        p, ck, cv = inputs
        normed = tnn.rms_norm(h, p["input_ln"], cfg.rms_norm_eps)
        q = (normed @ p["q_proj"]).reshape(b, s, h_heads, d)
        k = (normed @ p["k_proj"]).reshape(b, s, h_heads, d)
        v = (normed @ p["v_proj"]).reshape(b, s, h_heads, d)
        q = tnn.apply_rope(q, cos, sin)
        k = tnn.apply_rope(k, cos, sin)
        ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, pos, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, pos, 0, 0))
        attn = tnn.gqa_attention(q, ck, cv, mask, 1.0 / d**0.5)
        attn = attn.reshape(b, s, h_heads * d) @ p["o_proj"]
        h = h + attn * p["attn_scale"]
        normed = tnn.rms_norm(h, p["post_ln"], cfg.rms_norm_eps)
        mlp = (jax.nn.silu(normed @ p["gate_proj"]) * (normed @ p["up_proj"])) @ p["down_proj"]
        return h + mlp * p["mlp_scale"], (ck, cv)

    h, (kv_k, kv_v) = jax.lax.scan(layer, x, (params["layers"], kv_k, kv_v))
    return h, kv_k, kv_v


def decode_stream_chunk(
    params: dict,
    cfg: VocoderConfig,
    state: VocoderStreamState,
    codes: jnp.ndarray,  # [B, 16, S] the next S frames
) -> tuple[jnp.ndarray, VocoderStreamState]:
    """Decode the next chunk of frames, carrying exact causal context.

    Returns ([B, S * total_upsample] f32 audio, updated state). The audio
    equals the corresponding slice of the one-shot batch ``decode`` of all
    frames fed so far (up to matmul-tiling ulps; see tests/test_vocoder.py),
    at per-chunk cost equal to chunk-local decode.
    """
    with jax.default_matmul_precision("highest"):
        return _decode_stream_chunk_impl(params, cfg, state, codes)


def _decode_stream_chunk_impl(params, cfg, state, codes):
    s = codes.shape[-1]
    cs = state.conv
    new_cs = {"upsample": [], "blocks": []}
    q = rvq_deembed(params, cfg, codes.astype(jnp.int32)).astype(jnp.float32)

    h, new_cs["pre_conv"] = _conv_stream(
        q, cs["pre_conv"], params["pre_conv_w"], params["pre_conv_b"]
    )
    h = h @ params["input_proj_w"] + params["input_proj_b"]

    h, kv_k, kv_v = _pre_transformer_cached(
        params, cfg, h, state.kv_k, state.kv_v, state.pos
    )
    h = tnn.rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
    h = h @ params["output_proj_w"] + params["output_proj_b"]  # [B, S, latent]

    for stage, st, ratio in zip(
        params["upsample"], cs["upsample"], cfg.upsampling_ratios
    ):
        h, new_up = _tconv_stream(h, st["up"], stage["up_w"], stage["up_b"], ratio)
        h, new_dw = _convnext_stream(h, st["dw"], stage["convnext"])
        new_cs["upsample"].append({"up": new_up, "dw": new_dw})

    h, new_cs["init_conv"] = _conv_stream(
        h, cs["init_conv"], params["init_conv_w"], params["init_conv_b"]
    )
    for block, st, rate in zip(
        params["decoder_blocks"], cs["blocks"], cfg.upsample_rates
    ):
        hb = blocks.snake_beta(h, block["snake_alpha"], block["snake_beta"])
        h, new_up = _tconv_stream(hb, st["up"], block["up_w"], block["up_b"], rate)
        new_blk = {"up": new_up}
        for key, dil in (("res1", 1), ("res2", 3), ("res3", 9)):
            h, new_blk[key] = _residual_unit_stream(h, st[key], block[key], dil)
        new_cs["blocks"].append(new_blk)

    h = blocks.snake_beta(h, params["final_snake_alpha"], params["final_snake_beta"])
    h, new_cs["final"] = _conv_stream(
        h, cs["final"], params["final_conv_w"], params["final_conv_b"]
    )
    wav = jnp.clip(h[..., 0], -1.0, 1.0)

    new_state = VocoderStreamState(
        kv_k=kv_k, kv_v=kv_v, conv=new_cs, pos=state.pos + s
    )
    return wav, new_state


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def decode_stream_chunk_jit(params, cfg: VocoderConfig, state, codes):
    return decode_stream_chunk(params, cfg, state, codes)


def decode_bucketed(
    params: dict, cfg: VocoderConfig, codes: np.ndarray, bucket: int = 64
) -> np.ndarray:
    """Host wrapper: right-pad the frame axis to a bucket multiple (exact for
    this all-causal stack), decode under jit, trim to the true sample count."""
    t = codes.shape[-1]
    if t == 0:
        return np.zeros((codes.shape[0], 0), np.float32)
    padded_t = ((t + bucket - 1) // bucket) * bucket
    padded = np.zeros((codes.shape[0], codes.shape[1], padded_t), np.int32)
    padded[..., :t] = codes
    wav = decode_jit(params, cfg, jnp.asarray(padded))
    return np.asarray(wav[:, : t * cfg.total_upsample])


# ---------------------------------------------------------------------------
# Parameter loading / init
# ---------------------------------------------------------------------------


def _conv_w(w: jnp.ndarray) -> jnp.ndarray:
    """HF conv/trans-conv weight [A, B, K] -> [K, B, A] (WIO for causal conv;
    [K, Cout, Cin] staging orientation for transposed conv)."""
    return jnp.asarray(w, jnp.float32).transpose(2, 1, 0)


def _lin(w: jnp.ndarray) -> jnp.ndarray:
    return jnp.asarray(w, jnp.float32).T


def _normalized_codebook(embedding_sum: jnp.ndarray, cluster_usage: jnp.ndarray):
    usage = jnp.clip(jnp.asarray(cluster_usage, jnp.float32), 1e-7, None)
    return jnp.asarray(embedding_sum, jnp.float32) / usage[:, None]


def _convnext_params(w: dict, p: str) -> dict:
    return {
        "dwconv_w": _conv_w(w[f"{p}.dwconv.conv.weight"]),
        "dwconv_b": jnp.asarray(w[f"{p}.dwconv.conv.bias"], jnp.float32),
        "norm_w": jnp.asarray(w[f"{p}.norm.weight"], jnp.float32),
        "norm_b": jnp.asarray(w[f"{p}.norm.bias"], jnp.float32),
        "pwconv1_w": _lin(w[f"{p}.pwconv1.weight"]),
        "pwconv1_b": jnp.asarray(w[f"{p}.pwconv1.bias"], jnp.float32),
        "pwconv2_w": _lin(w[f"{p}.pwconv2.weight"]),
        "pwconv2_b": jnp.asarray(w[f"{p}.pwconv2.bias"], jnp.float32),
        "gamma": jnp.asarray(w[f"{p}.gamma"], jnp.float32),
    }


def _residual_unit_params(w: dict, p: str) -> dict:
    return {
        "act1_alpha": jnp.asarray(w[f"{p}.act1.alpha"], jnp.float32),
        "act1_beta": jnp.asarray(w[f"{p}.act1.beta"], jnp.float32),
        "conv1_w": _conv_w(w[f"{p}.conv1.conv.weight"]),
        "conv1_b": jnp.asarray(w[f"{p}.conv1.conv.bias"], jnp.float32),
        "act2_alpha": jnp.asarray(w[f"{p}.act2.alpha"], jnp.float32),
        "act2_beta": jnp.asarray(w[f"{p}.act2.beta"], jnp.float32),
        "conv2_w": _conv_w(w[f"{p}.conv2.conv.weight"]),
        "conv2_b": jnp.asarray(w[f"{p}.conv2.conv.bias"], jnp.float32),
    }


def load_vocoder_params(w: dict, cfg: VocoderConfig = VocoderConfig()) -> dict:
    """Build the vocoder pytree from speech-tokenizer safetensors weights.

    Key map matches decoder_12hz.rs:185-402.
    """
    layers = []
    for i in range(cfg.num_layers):
        p = f"decoder.pre_transformer.layers.{i}"
        layers.append(
            {
                "input_ln": jnp.asarray(w[f"{p}.input_layernorm.weight"], jnp.float32),
                "q_proj": _lin(w[f"{p}.self_attn.q_proj.weight"]),
                "k_proj": _lin(w[f"{p}.self_attn.k_proj.weight"]),
                "v_proj": _lin(w[f"{p}.self_attn.v_proj.weight"]),
                "o_proj": _lin(w[f"{p}.self_attn.o_proj.weight"]),
                "attn_scale": jnp.asarray(w[f"{p}.self_attn_layer_scale.scale"], jnp.float32),
                "post_ln": jnp.asarray(w[f"{p}.post_attention_layernorm.weight"], jnp.float32),
                "gate_proj": _lin(w[f"{p}.mlp.gate_proj.weight"]),
                "up_proj": _lin(w[f"{p}.mlp.up_proj.weight"]),
                "down_proj": _lin(w[f"{p}.mlp.down_proj.weight"]),
                "mlp_scale": jnp.asarray(w[f"{p}.mlp_layer_scale.scale"], jnp.float32),
            }
        )
    stacked_layers = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

    upsample = []
    for i, _ in enumerate(cfg.upsampling_ratios):
        p = f"decoder.upsample.{i}"
        upsample.append(
            {
                "up_w": _conv_w(w[f"{p}.0.conv.weight"]),
                "up_b": jnp.asarray(w[f"{p}.0.conv.bias"], jnp.float32),
                "convnext": _convnext_params(w, f"{p}.1"),
            }
        )

    decoder_blocks = []
    for i, _ in enumerate(cfg.upsample_rates):
        bp = f"decoder.decoder.{i + 1}.block"
        decoder_blocks.append(
            {
                "snake_alpha": jnp.asarray(w[f"{bp}.0.alpha"], jnp.float32),
                "snake_beta": jnp.asarray(w[f"{bp}.0.beta"], jnp.float32),
                "up_w": _conv_w(w[f"{bp}.1.conv.weight"]),
                "up_b": jnp.asarray(w[f"{bp}.1.conv.bias"], jnp.float32),
                "res1": _residual_unit_params(w, f"{bp}.2"),
                "res2": _residual_unit_params(w, f"{bp}.3"),
                "res3": _residual_unit_params(w, f"{bp}.4"),
            }
        )

    return {
        "first_codebook": _normalized_codebook(
            w["decoder.quantizer.rvq_first.vq.layers.0._codebook.embedding_sum"],
            w["decoder.quantizer.rvq_first.vq.layers.0._codebook.cluster_usage"],
        ),
        "rest_codebooks": jnp.stack(
            [
                _normalized_codebook(
                    w[f"decoder.quantizer.rvq_rest.vq.layers.{i}._codebook.embedding_sum"],
                    w[f"decoder.quantizer.rvq_rest.vq.layers.{i}._codebook.cluster_usage"],
                )
                for i in range(cfg.num_quantizers - 1)
            ]
        ),
        # 1x1 conv weights [out, in, 1] -> dense [in, out]
        "first_output_proj": _lin(
            jnp.asarray(w["decoder.quantizer.rvq_first.output_proj.weight"])[:, :, 0]
        ),
        "rest_output_proj": _lin(
            jnp.asarray(w["decoder.quantizer.rvq_rest.output_proj.weight"])[:, :, 0]
        ),
        "pre_conv_w": _conv_w(w["decoder.pre_conv.conv.weight"]),
        "pre_conv_b": jnp.asarray(w["decoder.pre_conv.conv.bias"], jnp.float32),
        "input_proj_w": _lin(w["decoder.pre_transformer.input_proj.weight"]),
        "input_proj_b": jnp.asarray(w["decoder.pre_transformer.input_proj.bias"], jnp.float32),
        "layers": stacked_layers,
        "final_norm": jnp.asarray(w["decoder.pre_transformer.norm.weight"], jnp.float32),
        "output_proj_w": _lin(w["decoder.pre_transformer.output_proj.weight"]),
        "output_proj_b": jnp.asarray(w["decoder.pre_transformer.output_proj.bias"], jnp.float32),
        "upsample": upsample,
        "init_conv_w": _conv_w(w["decoder.decoder.0.conv.weight"]),
        "init_conv_b": jnp.asarray(w["decoder.decoder.0.conv.bias"], jnp.float32),
        "decoder_blocks": decoder_blocks,
        "final_snake_alpha": jnp.asarray(w["decoder.decoder.5.alpha"], jnp.float32),
        "final_snake_beta": jnp.asarray(w["decoder.decoder.5.beta"], jnp.float32),
        "final_conv_w": _conv_w(w["decoder.decoder.6.conv.weight"]),
        "final_conv_b": jnp.asarray(w["decoder.decoder.6.conv.bias"], jnp.float32),
    }


def init_vocoder_params(key, cfg: VocoderConfig = VocoderConfig()) -> dict:
    """Random-init vocoder pytree (tests / synthetic benchmarking)."""

    def rnd(k, shape, scale=0.02):
        return jax.random.normal(k, shape, jnp.float32) * scale

    keys = iter(jax.random.split(key, 256))

    def conv(cin, cout, k):
        return rnd(next(keys), (k, cin, cout)), jnp.zeros((cout,), jnp.float32)

    def tconv(cin, cout, k):
        return rnd(next(keys), (k, cout, cin)), jnp.zeros((cout,), jnp.float32)

    def convnext(dim):
        return {
            "dwconv_w": rnd(next(keys), (7, 1, dim)),
            "dwconv_b": jnp.zeros((dim,), jnp.float32),
            "norm_w": jnp.ones((dim,), jnp.float32),
            "norm_b": jnp.zeros((dim,), jnp.float32),
            "pwconv1_w": rnd(next(keys), (dim, 4 * dim)),
            "pwconv1_b": jnp.zeros((4 * dim,), jnp.float32),
            "pwconv2_w": rnd(next(keys), (4 * dim, dim)),
            "pwconv2_b": jnp.zeros((dim,), jnp.float32),
            "gamma": jnp.ones((dim,), jnp.float32),
        }

    def res_unit(dim):
        c1w, c1b = conv(dim, dim, 7)
        c2w, c2b = conv(dim, dim, 1)
        return {
            "act1_alpha": jnp.zeros((dim,), jnp.float32),
            "act1_beta": jnp.zeros((dim,), jnp.float32),
            "conv1_w": c1w,
            "conv1_b": c1b,
            "act2_alpha": jnp.zeros((dim,), jnp.float32),
            "act2_beta": jnp.zeros((dim,), jnp.float32),
            "conv2_w": c2w,
            "conv2_b": c2b,
        }

    hd = cfg.num_heads * cfg.head_dim
    layers = [
        {
            "input_ln": jnp.ones((cfg.hidden_size,), jnp.float32),
            "q_proj": rnd(next(keys), (cfg.hidden_size, hd)),
            "k_proj": rnd(next(keys), (cfg.hidden_size, hd)),
            "v_proj": rnd(next(keys), (cfg.hidden_size, hd)),
            "o_proj": rnd(next(keys), (hd, cfg.hidden_size)),
            "attn_scale": jnp.full((cfg.hidden_size,), 0.01, jnp.float32),
            "post_ln": jnp.ones((cfg.hidden_size,), jnp.float32),
            "gate_proj": rnd(next(keys), (cfg.hidden_size, cfg.intermediate_size)),
            "up_proj": rnd(next(keys), (cfg.hidden_size, cfg.intermediate_size)),
            "down_proj": rnd(next(keys), (cfg.intermediate_size, cfg.hidden_size)),
            "mlp_scale": jnp.full((cfg.hidden_size,), 0.01, jnp.float32),
        }
        for _ in range(cfg.num_layers)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

    pre_w, pre_b = conv(cfg.codebook_dim, cfg.latent_dim, 3)
    init_w, init_b = conv(cfg.latent_dim, cfg.decoder_dim, 7)

    upsample = []
    for r in cfg.upsampling_ratios:
        uw, ub = tconv(cfg.latent_dim, cfg.latent_dim, 2 * r)
        upsample.append({"up_w": uw, "up_b": ub, "convnext": convnext(cfg.latent_dim)})

    decoder_blocks = []
    ch = cfg.decoder_dim
    for r in cfg.upsample_rates:
        out_ch = ch // 2
        uw, ub = tconv(ch, out_ch, 2 * r)
        decoder_blocks.append(
            {
                "snake_alpha": jnp.zeros((ch,), jnp.float32),
                "snake_beta": jnp.zeros((ch,), jnp.float32),
                "up_w": uw,
                "up_b": ub,
                "res1": res_unit(out_ch),
                "res2": res_unit(out_ch),
                "res3": res_unit(out_ch),
            }
        )
        ch = out_ch

    fw, fb = conv(ch, 1, cfg.final_kernel)
    ed = cfg.codebook_embed_dim
    return {
        "first_codebook": rnd(next(keys), (cfg.codebook_size, ed), 1.0),
        "rest_codebooks": rnd(next(keys), (cfg.num_quantizers - 1, cfg.codebook_size, ed), 1.0),
        "first_output_proj": rnd(next(keys), (ed, cfg.codebook_dim)),
        "rest_output_proj": rnd(next(keys), (ed, cfg.codebook_dim)),
        "pre_conv_w": pre_w,
        "pre_conv_b": pre_b,
        "input_proj_w": rnd(next(keys), (cfg.latent_dim, cfg.hidden_size)),
        "input_proj_b": jnp.zeros((cfg.hidden_size,), jnp.float32),
        "layers": stacked,
        "final_norm": jnp.ones((cfg.hidden_size,), jnp.float32),
        "output_proj_w": rnd(next(keys), (cfg.hidden_size, cfg.latent_dim)),
        "output_proj_b": jnp.zeros((cfg.latent_dim,), jnp.float32),
        "upsample": upsample,
        "init_conv_w": init_w,
        "init_conv_b": init_b,
        "decoder_blocks": decoder_blocks,
        "final_snake_alpha": jnp.zeros((ch,), jnp.float32),
        "final_snake_beta": jnp.zeros((ch,), jnp.float32),
        "final_conv_w": fw,
        "final_conv_b": fb,
    }
