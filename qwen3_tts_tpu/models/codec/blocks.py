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
    """Left-padded causal conv. x: [B, T, Cin]; kernel: [K, Cin/groups, Cout].

    Dense (groups=1) convs run as K shifted matmuls and depthwise
    (groups == Cin == Cout) as K shifted broadcast-multiplies: XLA:TPU
    lowers batch-1 NWC convolutions to a T(1,128) layout (1-row sublane
    tiles — 8x wasted sublanes) that profiled at a fraction of MXU/VPU
    speed in the vocoder; the taps forms get ordinary dot/elementwise
    layouts. Other group counts (unused here) fall back to
    ``conv_general_dilated``.
    """
    k, cpg, cout = kernel.shape
    b, t, cin = x.shape
    pad = dilation * (k - 1)
    if groups == 1:
        # out[t] = sum_i x[t - (k-1-i)*d] @ w[i]
        xp = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
        out = None
        for i in range(k):
            xi = jax.lax.dynamic_slice_in_dim(xp, i * dilation, t, axis=1)
            o = xi @ kernel[i]
            out = o if out is None else out + o
    elif groups == cin and cpg == 1 and cout == cin:
        # Depthwise: per-channel taps are broadcast multiplies on the VPU.
        xp = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
        out = None
        for i in range(k):
            xi = jax.lax.dynamic_slice_in_dim(xp, i * dilation, t, axis=1)
            o = xi * kernel[i, 0]
            out = o if out is None else out + o
    else:
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
    [Cin, Cout, K] pre-permuted at load).

    Implemented by POLYPHASE decomposition instead of the textbook
    input-dilated convolution: XLA:TPU lowers lhs-dilated convs to a
    batch-1 T(1,128) layout running at ~1.2 TFLOPS — profiled as ~half the
    whole vocoder decode. Writing output index t = u*stride + r gives

        out[u*stride + r] = sum_m x[u - m] @ W[r + m*stride]   (m >= 0)

    so each of the ceil(K/stride) taps is ONE dense matmul
    [T, Cin] @ [Cin, stride*Cout] (phase-major column blocks), and the
    phase axis reshapes into the time axis. Same FLOPs, MXU-friendly
    shapes, bit-equivalent up to f32 summation order (torch-oracle
    tested).
    """
    b, t, cin = x.shape
    k, cout, _ = kernel.shape
    s = stride
    m_max = -(-k // s)
    wpad = jnp.zeros((m_max * s, cout, cin), kernel.dtype).at[:k].set(kernel)
    # [m_max, s, Cout, Cin] -> per-tap [Cin, s*Cout] with r-major columns.
    wm = wpad.reshape(m_max, s, cout, cin).transpose(0, 3, 1, 2).reshape(
        m_max, cin, s * cout
    )
    out = jnp.zeros((b, t, s * cout), x.dtype)
    for m in range(m_max):
        xm = x if m == 0 else jnp.pad(x, ((0, 0), (m, 0), (0, 0)))[:, :t, :]
        out = out + xm @ wm[m]
    out = out.reshape(b, t * s, cout)
    if bias is not None:
        out = out + bias
    # The causal prefix is exactly T*stride rows (right_trim = k - stride,
    # reference: causal_trans_conv.rs:55-99) — already the full output here.
    return out


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
    """Snake -> dilated causal conv k7 -> Snake -> 1x1 conv -> residual.

    On TPU the f32 tail stages (C <= 512) run as ONE fused Pallas kernel
    (fused_blocks.py): the taps form below issues 7 un-fusable dots per
    conv, ~14x the unit's ideal HBM traffic on the 1920-samples/frame tail.
    """
    from . import fused_blocks

    if fused_blocks.residual_unit_should_fuse(x):
        return fused_blocks.residual_unit(x, p, dilation)
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
