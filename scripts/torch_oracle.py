"""Independent PyTorch transcription of the Qwen3-TTS pipeline.

This is the numerical oracle for tier-3 validation: a from-scratch torch/f32
implementation of every compute stage (talker transformer, code predictor,
Decoder12Hz vocoder, ECAPA speaker encoder) that loads the SAME HF
safetensors key layout as the JAX package but shares none of its code.

Used two ways:
  * ``scripts/dump_reference_values.py`` runs it over a real checkpoint and
    writes stage dumps for ``tests/test_reference_golden.py`` — the
    equivalent of the reference's Python-dump harness
    (/root/reference/tests/reference_validation.rs:11-47 +
    scripts/download_test_data.sh).
  * ``tests/test_fullstack_oracles.py`` compares it against the JAX models
    end-to-end on a synthetic checkpoint (the reference's philosophy of
    stage-by-stage torch-oracle coverage, reference_validation.rs:155-3003).

Everything runs float32, eval mode, no_grad — matching the official Python
implementation's CPU numerics.

Architecture sources (behavior only, no code): /root/reference/src/models/
{talker.rs, code_predictor.rs, transformer.rs, speaker.rs,
codec/decoder_12hz.rs, codec/decoder_block.rs, codec/causal_conv.rs,
codec/causal_trans_conv.rs, codec/convnext_block.rs, codec/snake_beta.rs}.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def _t(w) -> torch.Tensor:
    return torch.as_tensor(np.asarray(w), dtype=torch.float32)


# ---------------------------------------------------------------------------
# Shared transformer pieces (Qwen3: pre-norm, QK-norm GQA, SwiGLU, RoPE)
# ---------------------------------------------------------------------------


def rms_norm(x: torch.Tensor, weight: torch.Tensor, eps: float) -> torch.Tensor:
    var = (x * x).mean(dim=-1, keepdim=True)
    return x * torch.rsqrt(var + eps) * weight


def rope_cos_sin(positions: torch.Tensor, head_dim: int, theta: float):
    exponents = torch.arange(0, head_dim, 2, dtype=torch.float32) / head_dim
    inv_freq = 1.0 / (theta**exponents)
    freqs = positions[:, None].float() * inv_freq[None, :]
    return torch.cos(freqs), torch.sin(freqs)


def apply_rope(x: torch.Tensor, cos: torch.Tensor, sin: torch.Tensor) -> torch.Tensor:
    """x: [B, S, H, D]; cos/sin: [S, D/2] (split-half rotation)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return torch.cat([x1 * c - x2 * s, x2 * c + x1 * s], dim=-1)


class DecoderLayer:
    """One Qwen3 decoder layer from flat HF weights at ``{prefix}.{i}``."""

    def __init__(self, w: dict, prefix: str, heads: int, kv_heads: int,
                 head_dim: int, eps: float):
        self.heads, self.kv_heads, self.head_dim, self.eps = heads, kv_heads, head_dim, eps
        g = lambda k: _t(w[f"{prefix}.{k}"])
        self.q_proj = g("self_attn.q_proj.weight")
        self.k_proj = g("self_attn.k_proj.weight")
        self.v_proj = g("self_attn.v_proj.weight")
        self.o_proj = g("self_attn.o_proj.weight")
        self.q_norm = g("self_attn.q_norm.weight")
        self.k_norm = g("self_attn.k_norm.weight")
        self.input_ln = g("input_layernorm.weight")
        self.post_ln = g("post_attention_layernorm.weight")
        self.gate = g("mlp.gate_proj.weight")
        self.up = g("mlp.up_proj.weight")
        self.down = g("mlp.down_proj.weight")

    def __call__(self, x: torch.Tensor, cos, sin, mask) -> torch.Tensor:
        b, s, _ = x.shape
        h, kv, d = self.heads, self.kv_heads, self.head_dim
        normed = rms_norm(x, self.input_ln, self.eps)
        q = (normed @ self.q_proj.T).view(b, s, h, d)
        k = (normed @ self.k_proj.T).view(b, s, kv, d)
        v = (normed @ self.v_proj.T).view(b, s, kv, d)
        q = rms_norm(q, self.q_norm, self.eps)
        k = rms_norm(k, self.k_norm, self.eps)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        # GQA: repeat kv heads
        rep = h // kv
        k = k.repeat_interleave(rep, dim=2)
        v = v.repeat_interleave(rep, dim=2)
        scores = torch.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(d)
        scores = scores.masked_fill(~mask, float("-inf"))
        attn = torch.softmax(scores, dim=-1)
        out = torch.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, s, h * d)
        x = x + out @ self.o_proj.T
        normed = rms_norm(x, self.post_ln, self.eps)
        mlp = (F.silu(normed @ self.gate.T) * (normed @ self.up.T)) @ self.down.T
        return x + mlp


class TransformerStack:
    def __init__(self, w: dict, prefix: str, num_layers: int, heads: int,
                 kv_heads: int, head_dim: int, eps: float, theta: float):
        self.layers = [
            DecoderLayer(w, f"{prefix}.{i}", heads, kv_heads, head_dim, eps)
            for i in range(num_layers)
        ]
        self.head_dim, self.theta = head_dim, theta

    def __call__(self, x: torch.Tensor) -> torch.Tensor:
        """Full causal forward, no cache. x: [B, S, hidden]."""
        s = x.shape[1]
        cos, sin = rope_cos_sin(torch.arange(s), self.head_dim, self.theta)
        mask = torch.tril(torch.ones(s, s, dtype=torch.bool))[None, None]
        for layer in self.layers:
            x = layer(x, cos, sin, mask)
        return x


# ---------------------------------------------------------------------------
# Talker
# ---------------------------------------------------------------------------


class TalkerOracle:
    """Talker: dual embeddings, SiLU text projection, 28-layer stack, codec head."""

    def __init__(self, w: dict, cfg):
        self.cfg = cfg
        self.text_embedding = _t(w["talker.model.text_embedding.weight"])
        self.fc1_w = _t(w["talker.text_projection.linear_fc1.weight"])
        self.fc1_b = _t(w["talker.text_projection.linear_fc1.bias"])
        self.fc2_w = _t(w["talker.text_projection.linear_fc2.weight"])
        self.fc2_b = _t(w["talker.text_projection.linear_fc2.bias"])
        self.codec_embedding = _t(w["talker.model.codec_embedding.weight"])
        self.stack = TransformerStack(
            w, "talker.model.layers", cfg.num_hidden_layers,
            cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim,
            cfg.rms_norm_eps, cfg.rope_theta,
        )
        self.norm = _t(w["talker.model.norm.weight"])
        self.codec_head = _t(w["talker.codec_head.weight"])

    def embed_text_raw(self, ids) -> torch.Tensor:
        return self.text_embedding[torch.as_tensor(ids, dtype=torch.long)]

    def text_project(self, x: torch.Tensor) -> torch.Tensor:
        h = F.silu(x @ self.fc1_w.T + self.fc1_b)
        return h @ self.fc2_w.T + self.fc2_b

    def embed_text(self, ids) -> torch.Tensor:
        return self.text_project(self.embed_text_raw(ids))

    def embed_codec(self, ids) -> torch.Tensor:
        return self.codec_embedding[torch.as_tensor(ids, dtype=torch.long)]

    def forward_hidden(self, emb: torch.Tensor) -> torch.Tensor:
        """[B, S, hidden] embeddings -> normed hidden states."""
        h = self.stack(emb)
        return rms_norm(h, self.norm, self.cfg.rms_norm_eps)

    def codec_logits(self, hidden: torch.Tensor) -> torch.Tensor:
        return hidden @ self.codec_head.T

    def forward_logits(self, emb: torch.Tensor) -> torch.Tensor:
        return self.codec_logits(self.forward_hidden(emb))


# ---------------------------------------------------------------------------
# Code predictor
# ---------------------------------------------------------------------------


class CodePredictorOracle:
    def __init__(self, w: dict, cfg):
        self.cfg = cfg
        p = "talker.code_predictor"
        n = cfg.num_acoustic
        self.embeds = [_t(w[f"{p}.model.codec_embedding.{i}.weight"]) for i in range(n)]
        self.stack = TransformerStack(
            w, f"{p}.model.layers", cfg.num_hidden_layers,
            cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim,
            cfg.rms_norm_eps, cfg.rope_theta,
        )
        self.norm = _t(w[f"{p}.model.norm.weight"])
        self.heads = [_t(w[f"{p}.lm_head.{i}.weight"]) for i in range(n)]
        self.proj = None
        if cfg.needs_projection:
            self.proj = (
                _t(w[f"{p}.small_to_mtp_projection.weight"]),
                _t(w[f"{p}.small_to_mtp_projection.bias"]),
            )

    def _maybe_project(self, x: torch.Tensor) -> torch.Tensor:
        if self.proj is None:
            return x
        return x @ self.proj[0].T + self.proj[1]

    def predict(self, talker_hidden: torch.Tensor, semantic_embed: torch.Tensor) -> np.ndarray:
        """[1, 1, embed] x2 -> 15 greedy acoustic codes.

        Recomputes the full (short) sequence per group — mathematically
        identical to the reference's cached inner loop
        (code_predictor.rs:320-416) since attention is causal and greedy.
        """
        n = self.cfg.num_acoustic
        codes: list[int] = []
        prefix = self._maybe_project(torch.cat([talker_hidden, semantic_embed], dim=1))
        for g in range(n):
            embs = [
                self._maybe_project(self.embeds[j][codes[j]][None, None, :])
                for j in range(len(codes))
            ]
            seq = torch.cat([prefix] + embs, dim=1)
            h = self.stack(seq)
            h = rms_norm(h, self.norm, self.cfg.rms_norm_eps)
            logits = h[0, -1, :] @ self.heads[g].T
            codes.append(int(torch.argmax(logits)))
        return np.asarray(codes, np.int32)

    def acoustic_embedding_sum(self, codes) -> torch.Tensor:
        total = torch.zeros_like(self.embeds[0][0])
        for g, c in enumerate(np.asarray(codes).tolist()):
            total = total + self.embeds[g][c]
        return total[None, None, :]


# ---------------------------------------------------------------------------
# Decoder12Hz vocoder
# ---------------------------------------------------------------------------


def causal_conv1d(x: torch.Tensor, weight: torch.Tensor, bias: torch.Tensor,
                  dilation: int = 1, groups: int = 1) -> torch.Tensor:
    """x: [B, C, T] torch layout; weight: [Cout, Cin/groups, K]."""
    k = weight.shape[-1]
    pad = dilation * (k - 1)
    x = F.pad(x, (pad, 0))
    return F.conv1d(x, weight, bias, dilation=dilation, groups=groups)


def causal_trans_conv1d(x: torch.Tensor, weight: torch.Tensor, bias: torch.Tensor,
                        stride: int) -> torch.Tensor:
    """ConvTranspose1d trimmed to exactly T*stride (right trim k - stride)."""
    out = F.conv_transpose1d(x, weight, bias, stride=stride)
    return out[..., : x.shape[-1] * stride]


def snake_beta(x: torch.Tensor, alpha: torch.Tensor, beta: torch.Tensor) -> torch.Tensor:
    a = torch.exp(alpha)[None, :, None]
    inv_b = 1.0 / (torch.exp(beta)[None, :, None] + 1e-9)
    s = torch.sin(x * a)
    return x + s * s * inv_b


class VocoderOracle:
    """Decoder12Hz: RVQ de-embed -> pre-transformer -> upsample stack -> wave."""

    def __init__(self, w: dict, cfg):
        self.cfg = cfg
        g = lambda k: _t(w[k])

        def codebook(prefix):
            s = g(f"{prefix}._codebook.embedding_sum")
            u = g(f"{prefix}._codebook.cluster_usage").clamp(min=1e-7)
            return s / u[:, None]

        self.first_codebook = codebook("decoder.quantizer.rvq_first.vq.layers.0")
        self.rest_codebooks = [
            codebook(f"decoder.quantizer.rvq_rest.vq.layers.{i}")
            for i in range(cfg.num_quantizers - 1)
        ]
        self.first_proj = g("decoder.quantizer.rvq_first.output_proj.weight")  # [out,in,1]
        self.rest_proj = g("decoder.quantizer.rvq_rest.output_proj.weight")
        self.pre_conv = (g("decoder.pre_conv.conv.weight"), g("decoder.pre_conv.conv.bias"))
        self.input_proj = (g("decoder.pre_transformer.input_proj.weight"),
                           g("decoder.pre_transformer.input_proj.bias"))
        self.layers = []
        for i in range(cfg.num_layers):
            p = f"decoder.pre_transformer.layers.{i}"
            self.layers.append({
                "input_ln": g(f"{p}.input_layernorm.weight"),
                "q": g(f"{p}.self_attn.q_proj.weight"),
                "k": g(f"{p}.self_attn.k_proj.weight"),
                "v": g(f"{p}.self_attn.v_proj.weight"),
                "o": g(f"{p}.self_attn.o_proj.weight"),
                "attn_scale": g(f"{p}.self_attn_layer_scale.scale"),
                "post_ln": g(f"{p}.post_attention_layernorm.weight"),
                "gate": g(f"{p}.mlp.gate_proj.weight"),
                "up": g(f"{p}.mlp.up_proj.weight"),
                "down": g(f"{p}.mlp.down_proj.weight"),
                "mlp_scale": g(f"{p}.mlp_layer_scale.scale"),
            })
        self.final_norm = g("decoder.pre_transformer.norm.weight")
        self.output_proj = (g("decoder.pre_transformer.output_proj.weight"),
                            g("decoder.pre_transformer.output_proj.bias"))
        self.upsample = []
        for i in range(len(cfg.upsampling_ratios)):
            p = f"decoder.upsample.{i}"
            self.upsample.append({
                "up_w": g(f"{p}.0.conv.weight"), "up_b": g(f"{p}.0.conv.bias"),
                "cn": self._convnext(w, f"{p}.1"),
            })
        self.init_conv = (g("decoder.decoder.0.conv.weight"), g("decoder.decoder.0.conv.bias"))
        self.blocks = []
        for i in range(len(cfg.upsample_rates)):
            bp = f"decoder.decoder.{i + 1}.block"
            self.blocks.append({
                "alpha": g(f"{bp}.0.alpha"), "beta": g(f"{bp}.0.beta"),
                "up_w": g(f"{bp}.1.conv.weight"), "up_b": g(f"{bp}.1.conv.bias"),
                "res": [self._res_unit(w, f"{bp}.{j}") for j in (2, 3, 4)],
            })
        self.final_alpha = g("decoder.decoder.5.alpha")
        self.final_beta = g("decoder.decoder.5.beta")
        self.final_conv = (g("decoder.decoder.6.conv.weight"), g("decoder.decoder.6.conv.bias"))

    @staticmethod
    def _convnext(w, p):
        g = lambda k: _t(w[f"{p}.{k}"])
        return {"dw_w": g("dwconv.conv.weight"), "dw_b": g("dwconv.conv.bias"),
                "norm_w": g("norm.weight"), "norm_b": g("norm.bias"),
                "pw1_w": g("pwconv1.weight"), "pw1_b": g("pwconv1.bias"),
                "pw2_w": g("pwconv2.weight"), "pw2_b": g("pwconv2.bias"),
                "gamma": g("gamma")}

    @staticmethod
    def _res_unit(w, p):
        g = lambda k: _t(w[f"{p}.{k}"])
        return {"a1": g("act1.alpha"), "b1": g("act1.beta"),
                "c1_w": g("conv1.conv.weight"), "c1_b": g("conv1.conv.bias"),
                "a2": g("act2.alpha"), "b2": g("act2.beta"),
                "c2_w": g("conv2.conv.weight"), "c2_b": g("conv2.conv.bias")}

    def _convnext_fwd(self, x: torch.Tensor, p: dict) -> torch.Tensor:
        """x: [B, C, T]."""
        dim = x.shape[1]
        h = causal_conv1d(x, p["dw_w"], p["dw_b"], groups=dim)
        h = h.transpose(1, 2)  # [B, T, C]
        h = F.layer_norm(h, (dim,), p["norm_w"], p["norm_b"], eps=1e-6)
        h = h @ p["pw1_w"].T + p["pw1_b"]
        h = F.gelu(h, approximate="none")
        h = h @ p["pw2_w"].T + p["pw2_b"]
        h = (h * p["gamma"]).transpose(1, 2)
        return x + h

    def _res_fwd(self, x: torch.Tensor, p: dict, dilation: int) -> torch.Tensor:
        h = snake_beta(x, p["a1"], p["b1"])
        h = causal_conv1d(h, p["c1_w"], p["c1_b"], dilation=dilation)
        h = snake_beta(h, p["a2"], p["b2"])
        h = causal_conv1d(h, p["c2_w"], p["c2_b"])
        return x + h

    def _pre_transformer(self, x: torch.Tensor) -> torch.Tensor:
        """x: [B, T, hidden]; layer-scale attention blocks, RoPE theta 1e4."""
        b, t, _ = x.shape
        cfg = self.cfg
        cos, sin = rope_cos_sin(torch.arange(t), cfg.head_dim, cfg.rope_theta)
        mask = torch.tril(torch.ones(t, t, dtype=torch.bool))[None, None]
        for p in self.layers:
            normed = rms_norm(x, p["input_ln"], cfg.rms_norm_eps)
            q = (normed @ p["q"].T).view(b, t, cfg.num_heads, cfg.head_dim)
            k = (normed @ p["k"].T).view(b, t, cfg.num_heads, cfg.head_dim)
            v = (normed @ p["v"].T).view(b, t, cfg.num_heads, cfg.head_dim)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            scores = torch.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(cfg.head_dim)
            scores = scores.masked_fill(~mask, float("-inf"))
            attn = torch.softmax(scores, dim=-1)
            out = torch.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, -1)
            x = x + (out @ p["o"].T) * p["attn_scale"]
            normed = rms_norm(x, p["post_ln"], cfg.rms_norm_eps)
            mlp = (F.silu(normed @ p["gate"].T) * (normed @ p["up"].T)) @ p["down"].T
            x = x + mlp * p["mlp_scale"]
        return x

    def decode(self, codes: np.ndarray) -> np.ndarray:
        """codes: [1, 16, T] int -> waveform [T * total_upsample] float32."""
        codes = torch.as_tensor(np.asarray(codes), dtype=torch.long)
        first = self.first_codebook[codes[:, 0, :] % self.cfg.codebook_size]  # [B,T,256]
        first = F.conv1d(first.transpose(1, 2), self.first_proj)  # [B,512,T]
        rest = torch.zeros_like(
            self.rest_codebooks[0][codes[:, 1, :]]
        )
        for i, cb in enumerate(self.rest_codebooks):
            rest = rest + cb[codes[:, 1 + i, :]]
        rest = F.conv1d(rest.transpose(1, 2), self.rest_proj)
        q = first + rest  # [B, 512, T]

        h = causal_conv1d(q, *self.pre_conv)  # [B, latent, T]
        h = h.transpose(1, 2) @ self.input_proj[0].T + self.input_proj[1]  # [B,T,hidden]
        h = self._pre_transformer(h)
        h = rms_norm(h, self.final_norm, self.cfg.rms_norm_eps)
        h = (h @ self.output_proj[0].T + self.output_proj[1]).transpose(1, 2)  # [B,latent,T]

        for stage, ratio in zip(self.upsample, self.cfg.upsampling_ratios):
            h = causal_trans_conv1d(h, stage["up_w"], stage["up_b"], ratio)
            h = self._convnext_fwd(h, stage["cn"])

        h = causal_conv1d(h, *self.init_conv)
        for block, rate in zip(self.blocks, self.cfg.upsample_rates):
            h = snake_beta(h, block["alpha"], block["beta"])
            h = causal_trans_conv1d(h, block["up_w"], block["up_b"], rate)
            for res, dil in zip(block["res"], (1, 3, 9)):
                h = self._res_fwd(h, res, dil)

        h = snake_beta(h, self.final_alpha, self.final_beta)
        h = causal_conv1d(h, *self.final_conv)
        return np.asarray(h[:, 0, :].clamp(-1.0, 1.0))


# ---------------------------------------------------------------------------
# ECAPA-TDNN speaker encoder
# ---------------------------------------------------------------------------


def _reflect_same_conv(x: torch.Tensor, weight: torch.Tensor, bias: torch.Tensor,
                       dilation: int = 1) -> torch.Tensor:
    """x: [B, C, T]; PyTorch padding='same', padding_mode='reflect'."""
    k = weight.shape[-1]
    total = dilation * (k - 1)
    left, right = total // 2, total - total // 2
    if total > 0:
        x = F.pad(x, (left, right), mode="reflect")
    return F.conv1d(x, weight, bias, dilation=dilation)


class SpeakerOracle:
    def __init__(self, w: dict, cfg):
        self.cfg = cfg
        p = "speaker_encoder"
        g = lambda k: _t(w[f"{p}.{k}"])
        tdnn = lambda k: (g(f"{k}.conv.weight"), g(f"{k}.conv.bias"))
        self.initial = tdnn("blocks.0")
        self.se_blocks = []
        for i in range(1, 4):
            bp = f"blocks.{i}"
            self.se_blocks.append({
                "tdnn1": tdnn(f"{bp}.tdnn1"),
                "res2net": [tdnn(f"{bp}.res2net_block.blocks.{j}")
                            for j in range(cfg.enc_res2net_scale - 1)],
                "tdnn2": tdnn(f"{bp}.tdnn2"),
                "se1": (g(f"{bp}.se_block.conv1.weight"), g(f"{bp}.se_block.conv1.bias")),
                "se2": (g(f"{bp}.se_block.conv2.weight"), g(f"{bp}.se_block.conv2.bias")),
            })
        self.mfa = tdnn("mfa")
        self.asp_tdnn = tdnn("asp.tdnn")
        self.asp_conv = (g("asp.conv.weight"), g("asp.conv.bias"))
        self.fc = (g("fc.weight"), g("fc.bias"))

    @staticmethod
    def _tdnn(x, wb, dilation=1):
        return F.relu(_reflect_same_conv(x, wb[0], wb[1], dilation))

    def forward(self, mel: np.ndarray) -> np.ndarray:
        """mel: [B, n_mels, T] -> [B, enc_dim]."""
        cfg = self.cfg
        x = torch.as_tensor(np.asarray(mel), dtype=torch.float32)
        x = self._tdnn(x, self.initial, cfg.enc_dilations[0])
        se_outs = []
        h = x
        for i, blk in enumerate(self.se_blocks):
            inp = h
            h = self._tdnn(inp, blk["tdnn1"])
            # res2net split cascade
            scale = cfg.enc_res2net_scale
            chunk = h.shape[1] // scale
            outs = [h[:, :chunk]]
            for j, wb in enumerate(blk["res2net"]):
                piece = h[:, (j + 1) * chunk : (j + 2) * chunk]
                y = piece if j == 0 else piece + outs[-1]
                outs.append(self._tdnn(y, wb, cfg.enc_dilations[i + 1]))
            h = torch.cat(outs, dim=1)
            h = self._tdnn(h, blk["tdnn2"])
            # squeeze-excitation (1x1 convs)
            s = h.mean(dim=2, keepdim=True)
            s = F.relu(F.conv1d(s, blk["se1"][0], blk["se1"][1]))
            s = torch.sigmoid(F.conv1d(s, blk["se2"][0], blk["se2"][1]))
            h = h * s + inp
            se_outs.append(h)
        h = torch.cat(se_outs, dim=1)
        h = self._tdnn(h, self.mfa, cfg.enc_dilations[4])
        # attentive statistics pooling
        mean = h.mean(dim=2, keepdim=True)
        std = torch.sqrt(((h - mean) ** 2).mean(dim=2, keepdim=True) + 1e-5)
        t = h.shape[2]
        attn_in = torch.cat([h, mean.expand(-1, -1, t), std.expand(-1, -1, t)], dim=1)
        a = self._tdnn(attn_in, self.asp_tdnn)
        a = torch.tanh(a)
        a = F.conv1d(a, self.asp_conv[0], self.asp_conv[1])
        a = torch.softmax(a, dim=2)
        w_mean = (h * a).sum(dim=2)
        w_std = torch.sqrt((((h - w_mean[:, :, None]) ** 2) * a).sum(dim=2) + 1e-5)
        pooled = torch.cat([w_mean, w_std], dim=1)[:, :, None]
        out = F.conv1d(pooled, self.fc[0], self.fc[1])[:, :, 0]
        return np.asarray(out)
