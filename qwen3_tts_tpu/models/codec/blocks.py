"""Codec building blocks: causal convs, SnakeBeta, ConvNeXt, decoder blocks.

All activations are **channels-last** ``[batch, time, channels]`` — the
layout XLA:TPU tiles onto the MXU/VPU without relayout — and all convs are
``lax.conv_general_dilated`` with (NWC, WIO, NWC) dimension numbers. Weights
are converted from the HF/PyTorch orientation at load time.

Every op here is causal (output at t depends only on inputs <= t), which is
what makes right-padded time bucketing exact for the whole vocoder.

Behavioral parity reference: /root/reference/src/models/codec/
{causal_conv.rs, causal_trans_conv.rs, snake_beta.rs, convnext_block.rs,
decoder_block.rs}.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

CONV_DN = ("NWC", "WIO", "NWC")


def causal_conv1d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None,
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """Left-padded causal conv. x: [B, T, Cin]; kernel: [K, Cin/groups, Cout]."""
    k = kernel.shape[0]
    pad = dilation * (k - 1)
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,),
        padding=((pad, 0),),
        rhs_dilation=(dilation,),
        dimension_numbers=CONV_DN,
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias
    return out


def causal_trans_conv1d(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None, stride: int
) -> jnp.ndarray:
    """Transposed conv with right-trim to exactly T*stride outputs.

    x: [B, T, Cin]; kernel: [K, Cout, Cin] (PyTorch ConvTranspose orientation
    [Cin, Cout, K] pre-permuted at load). Implemented as input dilation +
    regular conv with the kernel spatially flipped — the textbook
    fractionally-strided convolution, which XLA lowers to an efficient
    strided MXU conv.
    """
    k = kernel.shape[0]
    # PyTorch: out[t] = sum_{s,j} x[s] W[:, :, j] where t = s*stride + j.
    # Equivalent: dilate x by stride, pad left/right with (k-1), convolve with
    # the spatially-flipped kernel.
    flipped = jnp.flip(kernel, axis=0)  # [K, Cout, Cin]
    flipped = jnp.swapaxes(flipped, 1, 2)  # [K, Cin, Cout] for WIO
    out = jax.lax.conv_general_dilated(
        x,
        flipped,
        window_strides=(1,),
        padding=((k - 1, k - 1),),
        lhs_dilation=(stride,),
        dimension_numbers=CONV_DN,
    )
    if bias is not None:
        out = out + bias
    # Full output length (T-1)*stride + k; keep the causal T*stride prefix
    # (right_trim = k - stride, reference: causal_trans_conv.rs:55-99).
    t_out = x.shape[1] * stride
    return out[:, :t_out, :]


def snake_beta(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """SnakeBeta activation: x + sin^2(exp(alpha) * x) / (exp(beta) + 1e-9).

    alpha, beta: [C]; x channels-last.
    """
    a = jnp.exp(alpha)
    inv_b = 1.0 / (jnp.exp(beta) + 1e-9)
    s = jnp.sin(x * a)
    return x + s * s * inv_b


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-6):
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * weight + bias


def convnext_block(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """Depthwise causal conv k7 -> LayerNorm -> Linear 4x -> GELU(erf) ->
    Linear -> gamma scale -> residual. x: [B, T, C]."""
    dim = x.shape[-1]
    h = causal_conv1d(x, p["dwconv_w"], p["dwconv_b"], groups=dim)
    h = layer_norm(h, p["norm_w"], p["norm_b"])
    h = h @ p["pwconv1_w"] + p["pwconv1_b"]
    h = jax.nn.gelu(h, approximate=False)
    h = h @ p["pwconv2_w"] + p["pwconv2_b"]
    return x + h * p["gamma"]


def residual_unit(x: jnp.ndarray, p: dict, dilation: int) -> jnp.ndarray:
    """Snake -> dilated causal conv k7 -> Snake -> 1x1 conv -> residual."""
    h = snake_beta(x, p["act1_alpha"], p["act1_beta"])
    h = causal_conv1d(h, p["conv1_w"], p["conv1_b"], dilation=dilation)
    h = snake_beta(h, p["act2_alpha"], p["act2_beta"])
    h = causal_conv1d(h, p["conv2_w"], p["conv2_b"])
    return x + h


def decoder_block(x: jnp.ndarray, p: dict, rate: int) -> jnp.ndarray:
    """BigVGAN-style block: Snake -> TransConv(x rate) -> 3 residual units
    (dilations 1, 3, 9)."""
    h = snake_beta(x, p["snake_alpha"], p["snake_beta"])
    h = causal_trans_conv1d(h, p["up_w"], p["up_b"], rate)
    h = residual_unit(h, p["res1"], 1)
    h = residual_unit(h, p["res2"], 3)
    h = residual_unit(h, p["res3"], 9)
    return h


def upsample_stage(x: jnp.ndarray, p: dict, ratio: int) -> jnp.ndarray:
    """Pre-decoder upsample: TransConv(x ratio) -> ConvNeXt block."""
    h = causal_trans_conv1d(x, p["up_w"], p["up_b"], ratio)
    return convnext_block(h, p["convnext"])
