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


def _same_conv(x, kernel, bias):
    """SAME-padded conv on [B, T, C]; kernel [K, Cin, Cout]."""
    k = kernel.shape[0]
    out = jax.lax.conv_general_dilated(
        x, kernel, (1,), ((k // 2, k - 1 - k // 2),),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out + bias if bias is not None else out


def _trans_conv_same(x, kernel, bias, stride):
    """Strided transposed conv with symmetric (k - stride)/2 trim -> T*stride."""
    k = kernel.shape[0]
    flipped = jnp.swapaxes(jnp.flip(kernel, 0), 1, 2)
    out = jax.lax.conv_general_dilated(
        x, flipped, (1,), ((k - 1, k - 1),), lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    pad = (k - stride) // 2
    out = out[:, pad : pad + x.shape[1] * stride, :]
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

        nh = cfg.num_heads
        hd = cfg.hidden_size // nh
        for layer in p["layers"]:
            normed = tnn.rms_norm(x, layer["norm1"], 1e-6)
            qh = (normed @ layer["q"]).reshape(b, s, nh, hd)
            kh = (normed @ layer["k"]).reshape(b, s, nh, hd)
            vh = (normed @ layer["v"]).reshape(b, s, nh, hd)
            attn = tnn.gqa_attention(qh, kh, vh, None, 1.0 / hd**0.5)
            x = x + attn.reshape(b, s, nh * hd) @ layer["o"]
            normed = tnn.rms_norm(x, layer["norm2"], 1e-6)
            mlp = jax.nn.silu(normed @ layer["fc1"]) @ layer["fc2"]
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
