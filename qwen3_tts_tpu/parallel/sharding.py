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


def layer_stack_specs() -> dict:
    """PartitionSpecs for a stacked decoder-layer pytree [L, ...].

    Column-parallel: q/k/v (heads on out dim), gate/up (intermediate on out).
    Row-parallel: o_proj, down_proj (tp on in dim -> psum after matmul).
    Norm weights replicated.
    """
    return {
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


def talker_specs(cfg: TalkerConfig) -> dict:
    return {
        "text_embedding": P(None, None),
        "text_projection": {
            "fc1_w": P(None, "tp"),
            "fc1_b": P("tp"),
            "fc2_w": P("tp", None),
            "fc2_b": P(None),
        },
        "codec_embedding": P(None, None),
        "layers": layer_stack_specs(),
        "norm": P(None),
        "codec_head": P(None, "tp"),
    }


def code_predictor_specs(cfg: CodePredictorConfig) -> dict:
    specs = {
        "codec_embeddings": P(None, None, None),
        "layers": layer_stack_specs(),
        "norm": P(None),
        "lm_heads": P(None, None, "tp"),
        "mtp_proj": None,
    }
    if cfg.needs_projection:
        specs["mtp_proj"] = {"w": P(None, None), "b": P(None)}
    return specs


def kv_cache_spec() -> P:
    """[L, B, S, KV, D]: batch on dp, KV heads on tp."""
    return P(None, "dp", None, "tp", None)


def shard_pytree(params, specs, mesh: Mesh):
    """device_put every leaf with its NamedSharding (specs mirrors the tree)."""

    def place(leaf, spec):
        if leaf is None:
            return None
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(place, params, specs, is_leaf=lambda x: x is None)
