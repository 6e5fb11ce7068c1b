"""Fused int8 decoder-layer Pallas kernels for the code predictor's hot loop.

Journal R1.11: with weight-only int8, the remaining gap to the bandwidth
bound is per-invocation overhead across ~300 Pallas calls/frame — the code
predictor's 14 decode steps each launch 4 dequant matmuls x 5 layers plus
~a dozen XLA glue ops (norms, RoPE, cache update, attention, residuals).

These kernels fuse one WHOLE decoder layer step (seq len 1) into two
pallas_calls whose int8 weights fit VMEM at code-predictor dimensions
(hidden 1024: qkv+o = 6.3 MB, gate-up+down = 9.4 MB, the 17-row KV cache is
~70 KB):

  * attention step: RMSNorm -> int8 qkv -> QK-norm -> RoPE -> in-place cache
    append -> masked GQA attention -> int8 o_proj -> residual add
  * MLP step: RMSNorm -> int8 gate|up -> SiLU * up -> int8 down -> residual

The math replicates ops/nn.py's unfused path op-for-op (f32 norm/softmax
accumulation, bf16 elementwise, dequant-then-dot as bf16 MXU dots with f32
accumulation and per-channel scales) so greedy codes are identical.

Reference engineering being beaten at its own game: the reference's fused
CUDA rmsnorm + InplaceOp2 cache append (fused_ops.rs, kv_cache.rs) fuse TWO
ops per launch; these fuse an entire layer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import quant


def _rms(x_f32: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    var = jnp.mean(x_f32 * x_f32, axis=-1, keepdims=True)
    return x_f32 * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)


def _dequant_dot(x_bf16: jnp.ndarray, q8_ref, scale_ref) -> jnp.ndarray:
    """bf16 x @ dequant(int8 w) with f32 accumulation * per-channel scale.

    Bit-identical to quant._dequant_matmul_reference / the tiled kernel:
    int8 -> bf16 convert feeds the MXU, f32 accumulate, f32 scale.
    """
    acc = jnp.dot(
        x_bf16, q8_ref[:].astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )
    return acc * scale_ref[:]


def _attention_step_kernel(
    # scalars / small operands
    pos_ref,  # SMEM [1] int32: cache row to write (== query position)
    x_ref,  # [1, H] bf16
    ln_ref,  # [1, H] input_layernorm weight
    qkv_q8_ref,  # [H, Dq + 2*Dkv] int8
    qkv_s_ref,  # [1, Dq + 2*Dkv] f32
    qn_ref,  # [1, D] q_norm
    kn_ref,  # [1, D] k_norm
    cos_ref,  # [1, D/2] f32 RoPE row for this position (sliced outside)
    sin_ref,
    o_q8_ref,  # [Dq, H] int8
    o_s_ref,  # [1, H] f32
    ck_ref,  # [S_max, KV*D] bf16 (aliased with ck_out)
    cv_ref,
    # outputs
    y_ref,  # [1, H] bf16
    ck_out_ref,
    cv_out_ref,
    *,
    heads: int,
    kv_heads: int,
    head_dim: int,
    eps: float,
):
    h, kv, d = heads, kv_heads, head_dim
    q_dim, kv_dim = h * d, kv * d
    pos = pos_ref[0]

    x = x_ref[:]
    normed = _rms(x.astype(jnp.float32), ln_ref[:], eps).astype(jnp.bfloat16)
    qkv = _dequant_dot(normed, qkv_q8_ref, qkv_s_ref).astype(x.dtype)  # [1, .]

    q = qkv[0, :q_dim].reshape(h, d)
    k = qkv[0, q_dim : q_dim + kv_dim].reshape(kv, d)
    v = qkv[0, q_dim + kv_dim :].reshape(kv, d)

    # Per-head QK RMSNorm (f32 math, like nn.rms_norm).
    q = _rms(q.astype(jnp.float32), qn_ref[0], eps).astype(x.dtype)
    k = _rms(k.astype(jnp.float32), kn_ref[0], eps).astype(x.dtype)

    # Split-half RoPE for this position (cos/sin row sliced outside).
    cos = cos_ref[:].astype(x.dtype)  # [1, d/2]
    sin = sin_ref[:].astype(x.dtype)
    half = d // 2

    def rope(t):
        t1, t2 = t[:, :half], t[:, half:]
        return jnp.concatenate([t1 * cos - t2 * sin, t2 * cos + t1 * sin], axis=-1)

    q = rope(q)
    k = rope(k)

    # Cache append as a full-array row select: Mosaic cannot prove dynamic
    # sublane alignment for a single-row store, and at 17 rows the full
    # rewrite is free. Aliased output buffers keep this in-place in HBM.
    s_max = ck_out_ref.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (s_max, 1), 0)
    is_pos = row_ids == pos
    new_k = jnp.where(is_pos, jnp.broadcast_to(k.reshape(1, kv_dim), (s_max, kv_dim)), ck_ref[:])
    new_v = jnp.where(is_pos, jnp.broadcast_to(v.reshape(1, kv_dim), (s_max, kv_dim)), cv_ref[:])
    ck_out_ref[:] = new_k
    cv_out_ref[:] = new_v

    keys = new_k.reshape(s_max, kv, d)
    vals = new_v.reshape(s_max, kv, d)

    # GQA: q [kv, g, d] against keys [s, kv, d]; softmax f32, causal to pos.
    g = h // kv
    qg = q.reshape(kv, g, d)
    scores = jax.lax.dot_general(
        qg,
        keys.transpose(1, 2, 0),  # [kv, d, s]
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [kv, g, s]
    scores = scores * jnp.float32(1.0 / d**0.5)
    live = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s_max), 2) <= pos
    scores = jnp.where(live, scores, jnp.float32(-1e30))
    weights = jax.nn.softmax(scores, axis=-1).astype(vals.dtype)
    out = jax.lax.dot_general(
        weights,
        vals.transpose(1, 0, 2),  # [kv, s, d]
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)  # [kv, g, d]

    attn = out.reshape(1, q_dim).astype(jnp.bfloat16)
    o = _dequant_dot(attn, o_q8_ref, o_s_ref).astype(x.dtype)
    y_ref[:] = x + o


def _mlp_step_kernel(
    x_ref,  # [1, H] bf16
    ln_ref,  # [1, H] post_attention_layernorm
    gu_q8_ref,  # [H, 2*I] int8
    gu_s_ref,  # [1, 2*I] f32
    down_q8_ref,  # [I, H] int8
    down_s_ref,  # [1, H] f32
    y_ref,  # [1, H]
    *,
    intermediate: int,
    eps: float,
):
    x = x_ref[:]
    normed = _rms(x.astype(jnp.float32), ln_ref[:], eps).astype(jnp.bfloat16)
    gu = _dequant_dot(normed, gu_q8_ref, gu_s_ref).astype(x.dtype)  # [1, 2I]
    # SiLU in f32: Mosaic rejects bf16 logistic (f32->bf16 broadcast verify
    # error), and f32 transcendentals round once at the end like XLA's path.
    g = gu[:, :intermediate].astype(jnp.float32)
    silu = (g * (1.0 / (1.0 + jnp.exp(-g)))).astype(x.dtype)
    act = silu * gu[:, intermediate:]
    down = _dequant_dot(act.astype(jnp.bfloat16), down_q8_ref, down_s_ref)
    y_ref[:] = x + down.astype(x.dtype)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def fused_attention_step(
    x, layer, cos_row, sin_row, cache_k, cache_v, pos,
    heads: int, kv_heads: int, head_dim: int, eps: float,
):
    """One fused attention sub-layer step. x: [1, H]; caches [S_max, KV*D];
    cos_row/sin_row: [1, D/2] RoPE tables for this position."""
    h_size = x.shape[-1]
    qkv = layer["qkv_proj"]
    o = layer["o_proj"]
    kernel = functools.partial(
        _attention_step_kernel,
        heads=heads, kv_heads=kv_heads, head_dim=head_dim, eps=eps,
    )
    y, ck, cv = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        input_output_aliases={11: 1, 12: 2},
        interpret=_interpret(),
    )(
        pos.reshape(1).astype(jnp.int32),
        x,
        layer["input_ln"][None, :],
        qkv["q8"],
        qkv["scale"][None, :],
        layer["q_norm"][None, :],
        layer["k_norm"][None, :],
        cos_row,
        sin_row,
        o["q8"],
        o["scale"][None, :],
        cache_k,
        cache_v,
    )
    return y, ck, cv


def fused_mlp_step(x, layer, intermediate: int, eps: float):
    gu = layer["gateup_proj"]
    down = layer["down_proj"]
    kernel = functools.partial(
        _mlp_step_kernel, intermediate=intermediate, eps=eps
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(
        x,
        layer["post_ln"][None, :],
        gu["q8"],
        gu["scale"][None, :],
        down["q8"],
        down["scale"][None, :],
    )


def supports_fused_step(stacked_layers: dict) -> bool:
    """Fused path requires the fused+quantized tree (qkv/gateup int8 dicts)."""
    return (
        "qkv_proj" in stacked_layers
        and quant.is_quantized(stacked_layers["qkv_proj"])
        and quant.is_quantized(stacked_layers["gateup_proj"])
        and quant.is_quantized(stacked_layers["o_proj"])
        and quant.is_quantized(stacked_layers["down_proj"])
    )


def run_fused_decode_step(
    stacked_layers: dict,
    x: jnp.ndarray,  # [1, 1, H]
    cfg,  # nn.LayerStackConfig
    cache_k: jnp.ndarray,  # [L, S_max, KV*D]
    cache_v: jnp.ndarray,
    pos: jnp.ndarray,  # [] int32
    cos_table: jnp.ndarray,  # [S_max, D/2] f32
    sin_table: jnp.ndarray,
):
    """Scan the fused two-kernel layer step over the stacked layers.

    Caches use the kernel-native [L, S_max, KV*D] layout (see
    code_predictor's fused path for the one-time conversion after prefill).
    Returns (hidden [1, 1, H], cache_k, cache_v).
    """
    h = x.reshape(1, cfg.hidden_size)
    # One dynamic row slice per STEP (outside the layer scan): in-kernel
    # dynamic sublane reads fail Mosaic's alignment check.
    cos_row = jax.lax.dynamic_slice_in_dim(cos_table, pos, 1, axis=0)
    sin_row = jax.lax.dynamic_slice_in_dim(sin_table, pos, 1, axis=0)

    def body(carry, layer_inputs):
        hh = carry
        layer, ck, cv = layer_inputs
        hh, ck, cv = fused_attention_step(
            hh, layer, cos_row, sin_row, ck, cv, pos,
            cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.rms_norm_eps,
        )
        hh = fused_mlp_step(hh, layer, cfg.intermediate_size, cfg.rms_norm_eps)
        return hh, (ck, cv)

    h, (new_k, new_v) = jax.lax.scan(body, h, (stacked_layers, cache_k, cache_v))
    return h.reshape(1, 1, cfg.hidden_size), new_k, new_v
