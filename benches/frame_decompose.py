"""Per-frame component decomposition for the int8 frame loop.

Times, each as ONE jitted program with an internal data-chained fori_loop
(so per-iteration dispatch is excluded and XLA cannot overlap iterations):

  * talker   — talker.decode_step alone (stream kernel on int8+TPU),
  * cp       — code_predictor.predict_acoustic_codes alone,
  * sampling — penalties + sample + penalty-mask update alone,
  * embed    — semantic embed + acoustic embedding sum + trailing select,
  * full     — the production generate_frames while_loop,
  * prefill  — full-prompt talker.prefill at a typical bucket (per call),
  * vocoder  — batch decode_jit at a typical bucket (per frame), with its
               FLOP/byte counts taken from XLA's compiled cost analysis.

glue = full - (talker + cp + sampling + embed) is the serialization /
bookkeeping cost the kernels don't own. Reference for the exercise:
the reference counts per-frame kernel launches the same way
(scripts/count-kernels.sh + benches/generation_bench.rs).

Run: python benches/frame_decompose.py [--size 1.7B] [--frames 200]
     [--cache-rows 274] [--no-int8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1.7B", choices=["0.6B", "1.7B"])
    ap.add_argument("--frames", type=int, default=200)
    # 288 = pipeline._new_cache(10, 256) rounded to the 16-row sublane tile.
    ap.add_argument("--cache-rows", type=int, default=288)
    ap.add_argument("--no-int8", action="store_true")
    ap.add_argument(
        "--hbm-gbs", type=float, default=819.0,
        help="HBM bandwidth for the roofline (v5e: 819 GB/s)",
    )
    ap.add_argument(
        "--prefill-bucket", type=int, default=48,
        help="prompt rows for the prefill component (pipeline bucket)",
    )
    ap.add_argument(
        "--vocoder-frames", type=int, default=128,
        help="codes frames for the vocoder component (decode bucket)",
    )
    ap.add_argument(
        "--f32-tflops", type=float, default=32.8,
        help="f32 MXU peak for the vocoder compute bound (v5e: 197 bf16 "
        "TFLOP/s / 6 passes for 'highest'-precision f32 = 32.8)",
    )
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu.models.config import config_for_variant
    from qwen3_tts_tpu.pipeline import Qwen3TTS
    from qwen3_tts_tpu.models import code_predictor as cp
    from qwen3_tts_tpu.models import talker
    from qwen3_tts_tpu.generation import core
    from qwen3_tts_tpu.ops import nn, sampling

    cfg = config_for_variant(args.size, "custom_voice")
    model = Qwen3TTS.from_random(cfg)
    if not args.no_int8:
        model = Qwen3TTS(
            model.config, model.talker_params, model.cp_params,
            model.vocoder_params, model.tokenizer,
            vocoder_config=model.vocoder_config, quantize_int8=True,
        )
    tcfg = cfg.talker
    cpcfg = cfg.code_predictor
    tp, cpp = model.talker_params, model.cp_params
    hidden = tcfg.hidden_size
    rows = args.cache_rows
    n = args.frames
    dev = jax.devices()[0]
    print(f"device: {dev}  int8: {not args.no_int8}  cache_rows: {rows}  frames: {n}")

    results = {}

    def note(msg):
        print(msg, flush=True)

    # --- talker decode step, chained on hidden + carried cache ---
    # Params are jit ARGUMENTS everywhere below: closing over them would
    # capture multi-GB weight trees as lowered constants (slow compiles,
    # and constant-folded layouts that don't match production programs).
    note("compiling talker loop...")
    @jax.jit
    def talker_loop(tp, x0, cache):
        def body(i, carry):
            x, cache = carry
            h, logits, cache = talker.decode_step(tp, tcfg, x, jnp.int32(10) + i, cache)
            # chain: next input depends on this step's output + logits
            x = h + logits[0, 0] * 1e-9
            return (x, cache)
        return jax.lax.fori_loop(0, n, body, (x0, cache))

    x0 = jnp.zeros((1, 1, hidden), jnp.bfloat16) + 0.01
    cache0 = nn.init_kv_cache(tcfg.layer_stack(), 1, rows, jnp.bfloat16)
    out = talker_loop(tp, x0, cache0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    jax.block_until_ready(talker_loop(tp, x0, cache0))
    results["talker_ms"] = (time.perf_counter() - t0) * 1e3 / n

    # --- CP frame, chained on hidden perturbation from codes ---
    note("compiling cp loop...")
    cp_slices = cp.scan_slices(cpp, cpcfg) if cpcfg.decode_mode != "jacobi" else None

    @jax.jit
    def cp_loop(cpp, cp_slices, h0, s0):
        def body(i, carry):
            h, s = carry
            codes = cp.predict_acoustic_codes(cpp, cpcfg, h, s, cp_slices)
            asum = cp.acoustic_embedding_sum(cpp, codes)
            return (h + asum.astype(h.dtype) * 1e-9, s)
        return jax.lax.fori_loop(0, n, body, (h0, s0))

    h0 = jnp.zeros((1, 1, hidden), jnp.bfloat16) + 0.01
    s0 = jnp.zeros((1, 1, hidden), jnp.bfloat16) + 0.02
    jax.block_until_ready(cp_loop(cpp, cp_slices, h0, s0))
    t0 = time.perf_counter()
    jax.block_until_ready(cp_loop(cpp, cp_slices, h0, s0))
    results["cp_ms"] = (time.perf_counter() - t0) * 1e3 / n

    # --- sampling epilogue (penalties + sample + mask update), chained ---
    note("compiling sampling loop...")
    scfg = sampling.SamplingConfig()
    supp = sampling.build_suppression_mask(tcfg.codec_vocab_size, scfg.eos_token_id)
    uniforms = jnp.linspace(0.01, 0.99, n)

    @jax.jit
    def sample_loop(logits0, mask0):
        def body(i, carry):
            logits, mask = carry
            lg = sampling.apply_generation_penalties(logits, mask, supp, scfg, i + 1)
            tok = sampling.sample(lg, scfg, uniforms[i])[0]
            mask = mask.at[tok].set(1.0)
            return (logits + tok * 1e-9, mask)
        return jax.lax.fori_loop(0, n, body, (logits0, mask0))

    logits0 = jnp.zeros((1, tcfg.codec_vocab_size), jnp.float32) + 0.1
    mask0 = jnp.zeros((tcfg.codec_vocab_size,), jnp.float32)
    jax.block_until_ready(sample_loop(logits0, mask0))
    t0 = time.perf_counter()
    jax.block_until_ready(sample_loop(logits0, mask0))
    results["sampling_ms"] = (time.perf_counter() - t0) * 1e3 / n

    # --- embeds: semantic embed + trailing select + frame store ---
    note("compiling embed loop...")
    trailing = jnp.zeros((32, hidden), jnp.bfloat16)
    pad_embed = jnp.zeros((hidden,), jnp.bfloat16)
    frames0 = jnp.zeros((256, 16), jnp.int32)

    @jax.jit
    def embed_loop(tp, tok0, frames):
        def body(i, carry):
            tok, frames = carry
            se = talker.embed_codec(tp, tok)[None, None, :]
            text_add = jnp.where(i < 20, trailing[jnp.minimum(i, 31)], pad_embed)
            frame = jnp.full((1, 16), tok, jnp.int32)
            frames = jax.lax.dynamic_update_slice(frames, frame, (i, 0))
            tok = tok + (se.sum() + text_add.sum()).astype(jnp.int32) * 0
            return (tok, frames)
        return jax.lax.fori_loop(0, n, body, (tok0, frames))

    jax.block_until_ready(embed_loop(tp, jnp.int32(5), frames0))
    t0 = time.perf_counter()
    jax.block_until_ready(embed_loop(tp, jnp.int32(5), frames0))
    results["embed_ms"] = (time.perf_counter() - t0) * 1e3 / n

    # --- full production loop ---
    note("compiling full loop...")
    max_new = rows - 18
    state = core.GenState(
        cache=nn.init_kv_cache(tcfg.layer_stack(), 1, rows, jnp.bfloat16),
        last_hidden=h0,
        token=jnp.int32(5),
        penalty_mask=mask0,
        frames=jnp.zeros((max_new, 16), jnp.int32),
        frame_idx=jnp.int32(0),
        pos=jnp.int32(10),
        done=jnp.asarray(False),
    )
    uni = jnp.linspace(0.01, 0.99, max_new + 1)
    limit = jnp.int32(min(n, max_new))

    def run_full(st):
        return core.generate_frames_jit(
            tp, cpp, tcfg, cpcfg, scfg, st, trailing, jnp.int32(20),
            pad_embed, uni, limit,
        )

    st = run_full(state)
    jax.block_until_ready(st)
    n_full = int(min(n, max_new))
    state2 = jax.tree.map(jnp.copy, st)
    state2 = state2._replace(frame_idx=jnp.int32(0), pos=jnp.int32(10),
                             done=jnp.asarray(False))
    t0 = time.perf_counter()
    jax.block_until_ready(run_full(state2))
    results["full_ms"] = (time.perf_counter() - t0) * 1e3 / n_full

    known = sum(results[k] for k in ("talker_ms", "cp_ms", "sampling_ms", "embed_ms"))
    results["glue_ms"] = results["full_ms"] - known

    # --- prefill: full-prompt talker.prefill at a typical bucket, chained ---
    note("compiling prefill loop...")
    pb = args.prefill_bucket
    n_pre = 16
    prompt0 = jnp.zeros((1, pb, hidden), jnp.bfloat16) + 0.01

    @jax.jit
    def prefill_loop(tp, p0, cache):
        def body(i, carry):
            p, cache = carry
            last, logits, cache = talker.prefill(tp, tcfg, p, jnp.int32(pb), cache)
            # chain: next prompt depends on this prefill's output
            return (p + last * 1e-9 + logits[0, 0] * 1e-12, cache)
        return jax.lax.fori_loop(0, n_pre, body, (p0, cache))

    cache_pre = nn.init_kv_cache(tcfg.layer_stack(), 1, rows, jnp.bfloat16)
    jax.block_until_ready(prefill_loop(tp, prompt0, cache_pre))
    t0 = time.perf_counter()
    jax.block_until_ready(prefill_loop(tp, prompt0, cache_pre))
    results["prefill_ms"] = (time.perf_counter() - t0) * 1e3 / n_pre
    results["prefill_bucket"] = pb

    # --- vocoder: batch decode at a typical bucket ---
    note("compiling vocoder decode...")
    from qwen3_tts_tpu.models.codec import vocoder as V

    vf = args.vocoder_frames
    codes = jnp.ones((1, 16, vf), jnp.int32)
    vp, vcfg = model.vocoder_params, model.vocoder_config
    jax.block_until_ready(V.decode_jit(vp, vcfg, codes))
    t0 = time.perf_counter()
    jax.block_until_ready(V.decode_jit(vp, vcfg, codes))
    results["vocoder_ms"] = (time.perf_counter() - t0) * 1e3 / vf
    results["vocoder_frames"] = vf
    # FLOPs / HBM bytes of the compiled decode program from XLA itself.
    # The BOUND must be implementation-independent, so the cost analysis
    # traces the pure-XLA taps path (QWEN3_TTS_NO_VOCODER_KERNELS): the
    # fused Pallas residual units are custom calls whose internal bytes /
    # FLOPs XLA's cost model cannot see, which would under-count the
    # algorithm's traffic and make the (faster) fused measurement look
    # further from physics than it is. Measurement above stays on the
    # production (fused-on-TPU) path.
    try:
        os.environ["QWEN3_TTS_NO_VOCODER_KERNELS"] = "1"
        try:
            ca = (
                jax.jit(V.decode, static_argnames=("cfg",))
                .lower(vp, vcfg, codes)
                .compile()
                .cost_analysis()
            )
        finally:
            os.environ.pop("QWEN3_TTS_NO_VOCODER_KERNELS", None)
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        results["vocoder_flops"] = float(ca.get("flops", 0.0))
        results["vocoder_bytes"] = float(ca.get("bytes accessed", 0.0))
    except Exception as e:  # noqa: BLE001 — cost analysis is best-effort
        note(f"cost_analysis unavailable: {e}")
        results["vocoder_flops"] = results["vocoder_bytes"] = 0.0

    results["roofline"] = roofline(
        model, results, rows, args.hbm_gbs, f32_tflops=args.f32_tflops
    )

    for k, v in results.items():
        if not k.endswith("_ms"):
            continue
        unit = "ms/call" if k == "prefill_ms" else "ms/frame"
        print(f"{k:<14} {v:8.3f} {unit}")
    print_roofline(results["roofline"], args.hbm_gbs)
    if args.json:
        Path(args.json).write_text(json.dumps(results))


def _tree_bytes(tree) -> int:
    import jax

    return sum(l.nbytes for l in jax.tree.leaves(tree) if hasattr(l, "nbytes"))


def roofline(model, results, rows: int, hbm_gbs: float,
             f32_tflops: float = 32.8) -> dict:
    """Analytic HBM bytes per frame per component vs the measured time.

    Batch-1 decode is weight-streaming-bound, so the physics bound for each
    component is (bytes it must move from HBM) / (HBM bandwidth). Bytes are
    counted from the ACTUAL arrays each mode streams:

      talker  the stream-pack tiles+scales (int8 whole-step kernel) or the
              canonical fused layer tree (bf16 XLA scan), plus the codec
              head and the KV-cache read (2 * L * rows * KV*D * 2B bf16).
      cp      frame kernel: VMEM-resident layers stream once per frame,
              non-resident layers re-stream per inner step (16 steps =
              prefill + 15 codes; ops/fused_layer.cp_resident_layers), plus
              all 15 lm_heads (one per step) and the mtp projection.
              Without the kernel, all layers re-stream every step.
      prefill streams the canonical (non-stream-pack) weight tree once plus
              the codec head; the S x S attention FLOPs at prompt buckets
              (<= 256 rows) are << the MXU bound and excluded. Per CALL.
      vocoder compute-heavy (f32 convs at 24 kHz sample rate), so its bound
              is max(bytes/BW, flops/f32-peak) with both counts taken from
              XLA's compiled cost analysis. Per FRAME.

    Embedding-table row gathers and activation traffic are excluded
    (≤ a few hundred KB/frame). ``pct_of_bound`` is bound_ms/measured_ms —
    100% means the measured loop moves weights at full HBM bandwidth
    (or, for the vocoder, runs at the binding resource's peak).
    """
    from qwen3_tts_tpu.ops import fused_layer as FL

    tcfg = model.config.talker
    cpcfg = model.config.code_predictor
    tp, cpp = model.talker_params, model.cp_params

    stack = tcfg.layer_stack()
    kv_dim = stack.num_kv_heads * stack.head_dim
    cache_bytes = 2 * stack.num_layers * rows * kv_dim * 2  # bf16 k+v read
    if tp.get("stream_pack") is not None:
        w = _tree_bytes(tp["stream_pack"]["tiles"]) + _tree_bytes(
            tp["stream_pack"]["scales"]
        )
    else:
        w = _tree_bytes(tp["layers"])
    talker_bytes = w + _tree_bytes(tp["codec_head"]) + cache_bytes

    steps = cpcfg.num_acoustic + 1
    layers = cpcfg.num_hidden_layers
    if cpp.get("stream_pack") is not None:
        plb = (
            _tree_bytes(cpp["stream_pack"]["tiles"])
            + _tree_bytes(cpp["stream_pack"]["scales"])
        ) / layers
        resident = FL.cp_resident_layers(cpp, cpcfg)
        cp_w = resident * plb + (layers - resident) * plb * steps
    else:
        resident = 0
        cp_w = _tree_bytes(cpp["layers"]) * steps
    cp_bytes = cp_w + _tree_bytes(cpp["lm_heads"]) + _tree_bytes(
        cpp.get("mtp_proj")
    )

    def row(name, nbytes):
        bound_ms = nbytes / (hbm_gbs * 1e9) * 1e3
        meas = results.get(f"{name}_ms")
        return {
            "bytes_per_frame": int(nbytes),
            "gb_per_frame": round(nbytes / 1e9, 3),
            "bound_ms": round(bound_ms, 3),
            "measured_ms": round(meas, 3) if meas else None,
            "pct_of_bound": round(100 * bound_ms / meas, 1) if meas else None,
        }

    out = {
        "hbm_gbs": hbm_gbs,
        "cache_rows": rows,
        "cp_resident_layers": resident,
        "talker": row("talker", talker_bytes),
        "cp": row("cp", cp_bytes),
    }
    total = talker_bytes + cp_bytes
    bound = total / (hbm_gbs * 1e9) * 1e3
    meas = results.get("full_ms")
    out["frame"] = {
        "bytes_per_frame": int(total),
        "gb_per_frame": round(total / 1e9, 3),
        "bound_ms": round(bound, 3),
        "measured_ms": round(meas, 3) if meas else None,
        "pct_of_bound": round(100 * bound / meas, 1) if meas else None,
    }

    # Prefill: one pass over the canonical weight tree + codec head (per
    # CALL, not per frame — it happens once per utterance).
    if results.get("prefill_ms"):
        pre_bytes = _tree_bytes(tp["layers"]) + _tree_bytes(tp["codec_head"])
        out["prefill"] = dict(
            row("prefill", pre_bytes), per="call",
            bucket_rows=results.get("prefill_bucket"),
        )

    # Vocoder: bound by whichever of HBM bytes / f32 MXU FLOPs binds, both
    # from XLA's own cost analysis of the compiled decode program.
    if results.get("vocoder_ms"):
        vf = results.get("vocoder_frames") or 1
        vflops = results.get("vocoder_flops", 0.0)
        vbytes = results.get("vocoder_bytes", 0.0)
        bw_ms = vbytes / (hbm_gbs * 1e9) * 1e3 / vf
        fl_ms = vflops / (f32_tflops * 1e12) * 1e3 / vf
        bound_ms = max(bw_ms, fl_ms)
        meas = results["vocoder_ms"]
        out["vocoder"] = {
            "bytes_per_frame": int(vbytes / vf),
            "gb_per_frame": round(vbytes / vf / 1e9, 4),
            "gflops_per_frame": round(vflops / vf / 1e9, 2),
            "f32_tflops": f32_tflops,
            "binding_resource": "flops" if fl_ms >= bw_ms else "bytes",
            "bound_ms": round(bound_ms, 3),
            "measured_ms": round(meas, 3),
            "pct_of_bound": round(100 * bound_ms / meas, 1) if meas else None,
            "per": "frame",
            "bucket_frames": vf,
        }
    return out


def print_roofline(r: dict, hbm_gbs: float) -> None:
    print(
        f"\nroofline @ {hbm_gbs:.0f} GB/s HBM "
        f"(cache {r['cache_rows']} rows, {r['cp_resident_layers']} CP layers resident):"
    )
    print(f"{'component':<16} {'GB':>9} {'bound ms':>9} {'meas ms':>9} {'% bound':>8}")
    for name in ("talker", "cp", "frame", "prefill", "vocoder"):
        e = r.get(name)
        if e is None:
            continue
        label = name if e.get("per", "frame") == "frame" else f"{name}/call"
        print(
            f"{label:<16} {e['gb_per_frame']:>9.3f} {e['bound_ms']:>9.3f} "
            f"{e['measured_ms'] if e['measured_ms'] is not None else float('nan'):>9.3f} "
            f"{e['pct_of_bound'] if e['pct_of_bound'] is not None else float('nan'):>8.1f}"
        )


if __name__ == "__main__":
    main()
