"""Legacy 25 Hz codec decoder (exported utility; not in the main pipeline).

Port-parity module for the reference's `CodecDecoder`
(src/models/codec/decoder.rs) — a generic BigVGAN-style decoder built on the
generic RVQ utility: RVQ de-embed (concatenated per-quantizer embeddings) ->
input projection -> bidirectional pre-transformer -> 4 upsample stages
(trans-conv + leaky-ReLU + 3 residual conv blocks) -> final conv. The
production path uses ``vocoder.Decoder12Hz``; this exists for codec
experimentation and API parity.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ...ops import nn as tnn
from .quantizer import ResidualVectorQuantizer


@dataclass(frozen=True)
class LegacyDecoderConfig:
    hidden_size: int = 1024
    num_layers: int = 8
    num_heads: int = 16
    upsample_ratios: tuple[int, ...] = (4, 5, 8, 3)  # 480x total
    num_quantizers: int = 16
    codebook_dim: int = 256
    codebook_size: int = 2048
    out_channels: int = 1

    @property
    def total_upsample(self) -> int:
        t = 1
        for r in self.upsample_ratios:
            t *= r
        return t

    def output_length(self, seq_len: int) -> int:
        """Exact sample count for ``seq_len`` frames under candle/PyTorch
        ConvTranspose1d semantics: odd (k - stride) adds one sample per
        stage (k = 2*ratio, padding (k-stride)//2, decoder.rs:57-82)."""
        t = seq_len
        for r in self.upsample_ratios:
            k, pad = 2 * r, (2 * r - r) // 2
            t = (t - 1) * r + k - 2 * pad
        return t


def _same_conv(x, kernel, bias):
    """SAME-padded conv on [B, T, C]; kernel [K, Cin, Cout]."""
    k = kernel.shape[0]
    out = jax.lax.conv_general_dilated(
        x, kernel, (1,), ((k // 2, k - 1 - k // 2),),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out + bias if bias is not None else out


def _trans_conv_same(x, kernel, bias, stride):
    """Strided transposed conv, candle/PyTorch padding = (k - stride)//2.

    Output length (T-1)*stride + k - 2*pad — i.e. T*stride for even
    (k - stride), T*stride + 1 when k - stride is odd (ratios 5 and 3 with
    k = 2*ratio), matching ConvTranspose1d exactly (decoder.rs:57-82).
    """
    k = kernel.shape[0]
    flipped = jnp.swapaxes(jnp.flip(kernel, 0), 1, 2)
    out = jax.lax.conv_general_dilated(
        x, flipped, (1,), ((k - 1, k - 1),), lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )  # full length (T-1)*stride + 2k - 1... minus (k-1) = (T-1)*stride + k
    pad = (k - stride) // 2
    full = (x.shape[1] - 1) * stride + k
    out = out[:, pad : full - pad, :]
    return out + bias if bias is not None else out


def _residual_block(x, p):
    h = tnn.rms_norm(x, p["norm1"], 1e-6)
    h = jax.nn.silu(_same_conv(h, p["conv1_w"], p["conv1_b"]))
    h = tnn.rms_norm(h, p["norm2"], 1e-6)
    h = _same_conv(h, p["conv2_w"], p["conv2_b"])
    return x + h


class CodecDecoder:
    """Generic 25 Hz RVQ decoder."""

    def __init__(self, params: dict, cfg: LegacyDecoderConfig = LegacyDecoderConfig()):
        self.params = params
        self.cfg = cfg
        self.quantizer = ResidualVectorQuantizer(params["codebooks"])

    def decode(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """tokens [B, Q, S] -> audio [B, S * total_upsample]."""
        cfg = self.cfg
        p = self.params
        emb = self.quantizer.decode(tokens)  # [B, S, Q, D]
        b, s, q, d = emb.shape
        x = emb.reshape(b, s, q * d) @ p["input_proj_w"] + p["input_proj_b"]

        def lin(v, w_key, layer):
            out = v @ layer[w_key]
            bias = layer.get(w_key + "_b")
            return out if bias is None else out + bias

        nh = cfg.num_heads
        hd = cfg.hidden_size // nh
        for layer in p["layers"]:
            normed = tnn.rms_norm(x, layer["norm1"], 1e-6)
            qh = lin(normed, "q", layer).reshape(b, s, nh, hd)
            kh = lin(normed, "k", layer).reshape(b, s, nh, hd)
            vh = lin(normed, "v", layer).reshape(b, s, nh, hd)
            attn = tnn.gqa_attention(qh, kh, vh, None, 1.0 / hd**0.5)
            x = x + lin(attn.reshape(b, s, nh * hd), "o", layer)
            normed = tnn.rms_norm(x, layer["norm2"], 1e-6)
            mlp = lin(jax.nn.silu(lin(normed, "fc1", layer)), "fc2", layer)
            x = x + mlp
        x = tnn.rms_norm(x, p["pre_norm"], 1e-6)

        for stage, ratio in zip(p["upsample"], cfg.upsample_ratios):
            x = _trans_conv_same(x, stage["up_w"], stage["up_b"], ratio)
            x = jnp.where(x >= 0, x, 0.1 * x)  # LeakyReLU(0.1)
            for rb in stage["res"]:
                x = _residual_block(x, rb)

        audio = _same_conv(x, p["final_w"], p["final_b"])
        return audio[..., 0]

    @classmethod
    def from_weights(
        cls,
        weights: dict,
        cfg: LegacyDecoderConfig = LegacyDecoderConfig(),
        prefix: str = "",
    ) -> "CodecDecoder":
        """Build from safetensors weights (key map: decoder.rs:253-318).

        Keys relative to ``prefix``: ``quantizer.layers.{i}.codebook.weight``,
        ``input_proj.{weight,bias}``, ``pre_transformer.{i}.self_attn.
        {q,k,v,o}_proj.* / mlp.fc{1,2}.* / norm{1,2}.weight``,
        ``pre_norm.weight``, ``upsample.{i}.conv.*`` (ConvTranspose
        [Cin, Cout, K]), ``residual.{i}.{j}.conv{1,2}.* / norm{1,2}.weight``,
        ``final_conv.{weight,bias}``.
        """
        pre = prefix

        def arr(key):
            return jnp.asarray(weights[pre + key], jnp.float32)

        def lin_t(key):  # [out, in] -> [in, out]
            return arr(key + ".weight").T

        def lin_b(key):
            return arr(key + ".bias")

        def conv_w(key):  # [Cout, Cin, K] -> [K, Cin, Cout]
            return arr(key + ".weight").transpose(2, 1, 0)

        def tconv_w(key):  # ConvTranspose [Cin, Cout, K] -> [K, Cout, Cin]
            return arr(key + ".weight").transpose(2, 1, 0)

        layers = []
        for i in range(cfg.num_layers):
            lp = f"pre_transformer.{i}."
            layers.append(
                {
                    "norm1": arr(lp + "norm1.weight"),
                    "q": lin_t(lp + "self_attn.q_proj"),
                    "q_b": lin_b(lp + "self_attn.q_proj"),
                    "k": lin_t(lp + "self_attn.k_proj"),
                    "k_b": lin_b(lp + "self_attn.k_proj"),
                    "v": lin_t(lp + "self_attn.v_proj"),
                    "v_b": lin_b(lp + "self_attn.v_proj"),
                    "o": lin_t(lp + "self_attn.o_proj"),
                    "o_b": lin_b(lp + "self_attn.o_proj"),
                    "norm2": arr(lp + "norm2.weight"),
                    "fc1": lin_t(lp + "mlp.fc1"),
                    "fc1_b": lin_b(lp + "mlp.fc1"),
                    "fc2": lin_t(lp + "mlp.fc2"),
                    "fc2_b": lin_b(lp + "mlp.fc2"),
                }
            )

        upsample = []
        for i, _r in enumerate(cfg.upsample_ratios):
            res = [
                {
                    "norm1": arr(f"residual.{i}.{j}.norm1.weight"),
                    "conv1_w": conv_w(f"residual.{i}.{j}.conv1"),
                    "conv1_b": arr(f"residual.{i}.{j}.conv1.bias"),
                    "norm2": arr(f"residual.{i}.{j}.norm2.weight"),
                    "conv2_w": conv_w(f"residual.{i}.{j}.conv2"),
                    "conv2_b": arr(f"residual.{i}.{j}.conv2.bias"),
                }
                for j in range(3)
            ]
            upsample.append(
                {
                    "up_w": tconv_w(f"upsample.{i}.conv"),
                    "up_b": arr(f"upsample.{i}.conv.bias"),
                    "res": res,
                }
            )

        params = {
            "codebooks": jnp.stack(
                [
                    arr(f"quantizer.layers.{i}.codebook.weight")
                    for i in range(cfg.num_quantizers)
                ]
            ),
            "input_proj_w": lin_t("input_proj"),
            "input_proj_b": lin_b("input_proj"),
            "layers": layers,
            "pre_norm": arr("pre_norm.weight"),
            "upsample": upsample,
            "final_w": conv_w("final_conv"),
            "final_b": arr("final_conv.bias"),
        }
        return cls(params, cfg)

    @classmethod
    def random(cls, key, cfg: LegacyDecoderConfig = LegacyDecoderConfig()):
        keys = iter(jax.random.split(key, 256))

        def rnd(shape, scale=0.02):
            return jax.random.normal(next(keys), shape, jnp.float32) * scale

        layers = []
        for _ in range(cfg.num_layers):
            layers.append(
                {
                    "norm1": jnp.ones((cfg.hidden_size,)),
                    "q": rnd((cfg.hidden_size, cfg.hidden_size)),
                    "k": rnd((cfg.hidden_size, cfg.hidden_size)),
                    "v": rnd((cfg.hidden_size, cfg.hidden_size)),
                    "o": rnd((cfg.hidden_size, cfg.hidden_size)),
                    "norm2": jnp.ones((cfg.hidden_size,)),
                    "fc1": rnd((cfg.hidden_size, cfg.hidden_size * 4)),
                    "fc2": rnd((cfg.hidden_size * 4, cfg.hidden_size)),
                }
            )
        upsample = []
        ch = cfg.hidden_size
        for r in cfg.upsample_ratios:
            out_ch = ch // 2
            res = [
                {
                    "norm1": jnp.ones((out_ch,)),
                    "conv1_w": rnd((7, out_ch, out_ch)),
                    "conv1_b": jnp.zeros((out_ch,)),
                    "norm2": jnp.ones((out_ch,)),
                    "conv2_w": rnd((7, out_ch, out_ch)),
                    "conv2_b": jnp.zeros((out_ch,)),
                }
                for _ in range(3)
            ]
            upsample.append(
                {"up_w": rnd((2 * r, out_ch, ch)), "up_b": jnp.zeros((out_ch,)), "res": res}
            )
            ch = out_ch
        params = {
            "codebooks": rnd((cfg.num_quantizers, cfg.codebook_size, cfg.codebook_dim), 1.0),
            "input_proj_w": rnd((cfg.codebook_dim * cfg.num_quantizers, cfg.hidden_size)),
            "input_proj_b": jnp.zeros((cfg.hidden_size,)),
            "layers": layers,
            "pre_norm": jnp.ones((cfg.hidden_size,)),
            "upsample": upsample,
            "final_w": rnd((7, ch, cfg.out_channels)),
            "final_b": jnp.zeros((cfg.out_channels,)),
        }
        return cls(params, cfg)
