"""Multi-chip sharding: device mesh + partition specs for serving.

The reference is strictly single-device (SURVEY.md §2.3) — this layer is new
TPU-native design, not a port. The parallelism that fits this workload:

* **tp** (tensor parallel): shard attention heads / MLP intermediate /
  codec-head vocab across chips on the ICI ring. Per-frame decode is
  HBM-bandwidth-bound on the 28-layer talker, so tp divides the weight
  streaming per chip; XLA inserts the psum on the o_proj/down_proj/logits
  reductions automatically from the sharding annotations.
* **dp** (data parallel): independent utterances batched across chips;
  the generation loop is batched with vmap and the batch axis sharded on dp.

PP is intentionally absent: with batch 1 and one token per step, pipelining
layers across chips only adds ICI hops to the latency-critical path. SP/EP do
not apply (no long sequences inside jit, no experts); documented here so the
parallelism story is explicit.

All specs follow GSPMD semantics: annotate inputs, let XLA propagate and
insert collectives (psum over tp for row-parallel matmuls).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import CodePredictorConfig, TalkerConfig
from ..ops import quant


def _with_scale(spec: P) -> dict:
    """Spec pair for a quantized linear ``{"q8", "scale"}``.

    q8 keeps the plain weight's spec; the per-output-channel scale carries
    every axis except the contraction (second-to-last) one, so a
    column-parallel weight gets a tp-sharded scale and a row-parallel weight
    a replicated one (the psum happens on the activations, not the scale).
    """
    axes = tuple(spec)
    scale_axes = axes[:-2] + (axes[-1],)
    return {"q8": spec, "scale": P(*scale_axes)}


def _adapt(spec: P, leaf) -> P | dict:
    """Match a logical weight spec to the actual leaf (plain or quantized)."""
    return _with_scale(spec) if quant.is_quantized(leaf) else spec


def make_mesh(devices=None, tp: int | None = None, dp: int | None = None) -> Mesh:
    """Build a (dp, tp) mesh. Defaults: tp = min(n, 8) capped by divisibility,
    dp = n // tp."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if tp is None:
        tp = 1
        for cand in (8, 4, 2, 1):
            if n % cand == 0:
                tp = cand
                break
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp({dp}) * tp({tp}) != device count ({n})")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def layer_stack_specs(layers: dict | None = None) -> dict:
    """PartitionSpecs for a stacked decoder-layer pytree [L, ...].

    Column-parallel: q/k/v (heads on out dim), gate/up (intermediate on out).
    Row-parallel: o_proj, down_proj (tp on in dim -> psum after matmul).
    Norm weights replicated.

    Pass the actual ``layers`` subtree to adapt to fused (``qkv_proj`` /
    ``gateup_proj``, weights.fuse_layer_params) and/or int8-quantized
    (``{"q8", "scale"}`` dict leaves, ops/quant.py) structures. The fused
    concat axes stay shard-aligned: q_dim (16 heads) and kv_dim (8 heads) are
    both multiples of the per-shard width for tp in {2, 4, 8}, so GSPMD's
    slices of qkv land on shard boundaries.
    """
    base = {
        "q_proj": P(None, None, "tp"),
        "k_proj": P(None, None, "tp"),
        "v_proj": P(None, None, "tp"),
        "o_proj": P(None, "tp", None),
        "q_norm": P(None, None),
        "k_norm": P(None, None),
        "input_ln": P(None, None),
        "post_ln": P(None, None),
        "gate_proj": P(None, None, "tp"),
        "up_proj": P(None, None, "tp"),
        "down_proj": P(None, "tp", None),
    }
    if layers is None:
        return base
    if "qkv_proj" in layers:
        base["qkv_proj"] = P(None, None, "tp")
        base["gateup_proj"] = P(None, None, "tp")
        for key in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"):
            del base[key]
    missing = set(base) - set(layers)
    if missing:
        raise ValueError(
            f"layer stack missing expected weights {sorted(missing)}; "
            "pass the actual params['layers'] subtree so specs match its "
            "structure (fused/int8 trees included)"
        )
    return {key: _adapt(spec, layers[key]) for key, spec in base.items()}


def talker_specs(cfg: TalkerConfig, params: dict | None = None) -> dict:
    """Serving partition specs; pass ``params`` to mirror fused/int8 trees."""
    layers = params["layers"] if params is not None else None
    head = params["codec_head"] if params is not None else None
    specs = {
        "text_embedding": P(None, None),
        "text_projection": {
            "fc1_w": P(None, "tp"),
            "fc1_b": P("tp"),
            "fc2_w": P("tp", None),
            "fc2_b": P(None),
        },
        "codec_embedding": P(None, None),
        "layers": layer_stack_specs(layers),
        "norm": P(None),
        "codec_head": _adapt(P(None, "tp"), head),
    }
    if params is not None and "stream_pack" in params:
        specs["stream_pack"] = jax.tree.map(lambda _: P(), params["stream_pack"])
    if params is not None and "tp_pack" in params:
        specs["tp_pack"] = tp_pack_specs()
    return specs


def tp_pack_specs() -> dict:
    """Specs for the head-aligned qkv/gateup re-layout (fused_layer.make_tp_pack):
    column-sharded q8 with the per-output-channel scale sharded alongside.
    The permutation makes chunk i of the concat exactly chip i's
    (q_i|k_i|v_i) / (gate_i|up_i), so plain "tp" column chunking is the
    correct head sharding."""
    col = {"q8": P(None, None, "tp"), "scale": P(None, "tp")}
    return {"qkv": dict(col), "gu": dict(col)}


def code_predictor_specs(cfg: CodePredictorConfig, params: dict | None = None) -> dict:
    """Serving partition specs; pass ``params`` to mirror fused/int8 trees."""
    layers = params["layers"] if params is not None else None
    heads = params["lm_heads"] if params is not None else None
    specs = {
        "codec_embeddings": P(None, None, None),
        "layers": layer_stack_specs(layers),
        "norm": P(None),
        "lm_heads": _adapt(P(None, None, "tp"), heads),
        "mtp_proj": None,
    }
    if cfg.needs_projection:
        specs["mtp_proj"] = {"w": P(None, None), "b": P(None)}
    if params is not None and "stream_pack" in params:
        # The HBM stream-tile re-layout (single-chip streaming kernel) is
        # replicated under tp — the kernel is a per-chip fast path and the
        # canonical sharded tree remains authoritative.
        specs["stream_pack"] = jax.tree.map(lambda _: P(), params["stream_pack"])
    return specs


def kv_cache_spec() -> P:
    """[L, B, S, KV, D]: batch on dp, KV heads on tp."""
    return P(None, "dp", None, "tp", None)


def serving_cache_spec() -> P:
    """Single-utterance serving cache [L, B=1, S, KV, D]: KV heads on tp only
    (batch 1 cannot shard over dp; dp stays idle or serves other sessions)."""
    return P(None, None, None, "tp", None)


def batch_cache_spec() -> P:
    """Batched-serving cache [B, L, 1, S, KV, D] (synthesize_batch layout):
    utterances on dp, KV heads on tp."""
    return P("dp", None, None, None, "tp", None)


def shard_pytree(params, specs, mesh: Mesh):
    """device_put every leaf with its NamedSharding (specs mirrors the tree)."""

    def place(leaf, spec):
        if leaf is None:
            return None
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(place, params, specs, is_leaf=lambda x: x is None)


def replicate_pytree(params, mesh: Mesh):
    """device_put every leaf fully replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda leaf: jax.device_put(leaf, sharding), params)
