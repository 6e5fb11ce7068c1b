"""Fused Pallas residual-unit kernel for the vocoder's upsampling tail.

The taps-as-matmul causal convs (blocks.py) are MXU-friendly but HBM-hungry:
each k=7 conv issues 7 separate dots, and XLA cannot fuse dots, so every
tap re-streams the activation and writes a partial — ~28·T·C bytes per
residual unit where the ideal is 2·T·C (read once, write once). At the
vocoder's tail the activations are long (1920 samples/frame) and the
channel counts small (384/192/96), so the whole unit's weights fit VMEM
and the fix is one kernel per residual unit:

    read a time tile once -> snake -> 7 dilated taps from VMEM -> snake ->
    1x1 conv -> residual -> write once

Time is tiled with a look-back-one-block context (the causal window is
6·dilation <= 54 rows < the 256-row tile): tile t reads tile t-1's tail
rows for its left context, tile 0 uses zeros — exactly the batch path's
zero left-padding. Outputs are row-independent (each row's taps reduce
over the same window regardless of tile boundaries), which keeps the
vocoder's bucket-invariance and streaming-equals-batch properties.

Routing: `residual_unit_should_fuse` — TPU backend (or
QWEN3_TTS_FORCE_VOCODER_KERNELS=1 for interpret-mode tests), f32
activations, channels <= 512 (VMEM: 7·C·C·4 weight bytes), killable with
QWEN3_TTS_NO_VOCODER_KERNELS=1. The decoder's first block (C=768) stays on
the XLA path: its weights exceed comfortable VMEM residency and its time
axis is 60x shorter than the tail's, so it is not where the bytes are.

Reference parity: the unit IS /root/reference/src/models/codec/
decoder_block.rs:20-95 (Snake -> dilated causal conv k7 -> Snake -> 1x1 ->
residual); only the execution strategy is TPU-native.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 256  # rows per grid step; must exceed the max context (6*9 = 54)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def residual_unit_should_fuse(x: jnp.ndarray) -> bool:
    """Route [B, T, C] f32 residual units to the fused kernel on TPU."""
    if os.environ.get("QWEN3_TTS_NO_VOCODER_KERNELS"):
        return False
    if x.dtype != jnp.float32 or x.shape[-1] > 512:
        return False
    if os.environ.get("QWEN3_TTS_FORCE_VOCODER_KERNELS"):
        return True
    return jax.default_backend() == "tpu"


def _snake(x, alpha_row, beta_row):
    # Bit-identical to blocks.snake_beta: x + sin^2(x * e^a) / (e^b + 1e-9).
    a = jnp.exp(alpha_row)
    inv_b = 1.0 / (jnp.exp(beta_row) + 1e-9)
    s = jnp.sin(x * a)
    return x + s * s * inv_b


def _residual_unit_kernel(
    x_prev_ref,  # [1, TILE, C] f32 — tile t-1 (tile 0 at t == 0, masked)
    x_cur_ref,  # [1, TILE, C] f32 — tile t
    a1_ref,  # [1, C] act1_alpha
    b1_ref,  # [1, C] act1_beta
    w1_ref,  # [7, C, C] conv1 taps
    c1_ref,  # [1, C] conv1 bias
    a2_ref,  # [1, C]
    b2_ref,  # [1, C]
    w2_ref,  # [C, C] 1x1 conv
    c2_ref,  # [1, C]
    o_ref,  # [1, TILE, C]
    *,
    dilation: int,
):
    t = pl.program_id(1)
    ctx = 6 * dilation
    cur = x_cur_ref[0]
    # Left context: the previous tile's tail; zeros on the first tile (the
    # batch path's zero left-padding).
    prev_tail = x_prev_ref[0, _TILE - ctx :, :]
    prev_tail = jnp.where(t > 0, prev_tail, jnp.zeros_like(prev_tail))
    ext = jnp.concatenate([prev_tail, cur], axis=0)  # [ctx + TILE, C]

    h = _snake(ext, a1_ref[0], b1_ref[0])
    # Causal dilated conv, taps ascending — the same partial-sum order as
    # blocks.causal_conv1d's taps loop.
    acc = None
    for i in range(7):
        # Static slice (offsets are Python ints): dynamic_slice has no
        # Pallas TPU lowering.
        tap = h[i * dilation : i * dilation + _TILE, :]
        o = jnp.dot(
            tap,
            w1_ref[i],
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        acc = o if acc is None else acc + o
    h = acc + c1_ref[0]
    h = _snake(h, a2_ref[0], b2_ref[0])
    h = (
        jnp.dot(
            h,
            w2_ref[:],
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        + c2_ref[0]
    )
    o_ref[0] = cur + h


@functools.partial(jax.jit, static_argnames=("dilation",))
def _run_tiles(x: jnp.ndarray, p: dict, dilation: int) -> jnp.ndarray:
    """x: [B, nT*TILE, C] f32 (pre-padded). Returns the unit output, same
    shape."""
    b, t_pad, c = x.shape
    n_t = t_pad // _TILE
    kernel = functools.partial(_residual_unit_kernel, dilation=dilation)
    row = pl.BlockSpec((1, c), lambda bb, tt: (0, 0))
    return pl.pallas_call(
        kernel,
        grid=(b, n_t),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c), jnp.float32),
        in_specs=[
            # look-back-one-block context (clamped at 0; masked in-kernel)
            pl.BlockSpec(
                (1, _TILE, c),
                lambda bb, tt: (bb, jnp.maximum(tt - 1, 0), 0),
            ),
            pl.BlockSpec((1, _TILE, c), lambda bb, tt: (bb, tt, 0)),
            row,
            row,
            pl.BlockSpec((7, c, c), lambda bb, tt: (0, 0, 0)),
            row,
            row,
            row,
            pl.BlockSpec((c, c), lambda bb, tt: (0, 0)),
            row,
        ],
        out_specs=pl.BlockSpec((1, _TILE, c), lambda bb, tt: (bb, tt, 0)),
        interpret=_interpret(),
    )(
        x,
        x,
        p["act1_alpha"][None, :],
        p["act1_beta"][None, :],
        p["conv1_w"],
        p["conv1_b"][None, :],
        p["act2_alpha"][None, :],
        p["act2_beta"][None, :],
        p["conv2_w"][0],  # [1, C, C] k=1 -> [C, C]
        p["conv2_b"][None, :],
    )


def residual_unit(x: jnp.ndarray, p: dict, dilation: int) -> jnp.ndarray:
    """Fused drop-in for blocks.residual_unit. x: [B, T, C] f32."""
    b, t, c = x.shape
    t_pad = -(-t // _TILE) * _TILE
    if t_pad != t:
        # Right-pad: the unit is causal, rows < t never see the pad.
        x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
    out = _run_tiles(x, p, dilation)
    return out[:, :t, :] if t_pad != t else out


def residual_unit_stream(
    x: jnp.ndarray, ctx_rows: jnp.ndarray, p: dict, dilation: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming form: ``ctx_rows`` [B, 6*dilation, C] carries the RAW input
    tail of the previous chunks (zeros at cold start == batch zero-padding
    — note the XLA stream path carries post-snake rows instead; the two
    carries are equivalent because snake is pointwise and snake(0) == 0).

    Returns (chunk output [B, T, C], new carry).
    """
    ctx = ctx_rows.shape[1]
    x_ext = jnp.concatenate([ctx_rows, x], axis=1)
    # The first ctx output rows are computed against a zero left-context
    # and dropped; rows ctx.. see exactly the carried rows.
    out = residual_unit(x_ext, p, dilation)[:, ctx:, :]
    return out, x_ext[:, -ctx:, :]
