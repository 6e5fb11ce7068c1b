"""Per-frame component decomposition for the BATCHED serving loop.

The solo loop decomposition (frame_decompose.py) showed batch-1 runs at
54–78% of the HBM weight-stream bound. Batched serving at batch 8 runs at
~20 ms/frame (int8) against a ~2.6 ms amortized weight bound — this tool
splits `synthesize_batch`'s wall time to find the non-amortizing costs:

  * prefill   — the batched prefill program (once per utterance)
  * loop      — generate_frames_batch alone (the vmapped while_loop)
  * talker    — vmapped talker.decode_step in a chained fori_loop
  * cp        — vmapped predict_acoustic_codes in a chained fori_loop
  * sampling  — vmapped penalties+sample+mask loop
  * vocoder   — the single batched decode_bucketed pass (amortized /frame)
  * fetch     — device_get of frames + counts
  * e2e       — public synthesize_batch wall (sum check)

Each component is timed independently and partial results are flushed to
--json after every step, so a tunnel failure mid-compile loses only the
remaining components (rerun with --components to fill the gaps).
--trace DIR instead captures an xplane profile of the REAL batched loop
(already compiled by the loop step) and runs scripts/trace_report.py on
it — per-op attribution with no extra program compiles.

Run: python benches/batch_decompose.py [--size 1.7B] [--batch 8]
     [--frames 125] [--no-int8] [--json OUT]
     [--components prefill,loop,talker,cp,sampling,vocoder,e2e]
     [--trace /tmp/qwen3_trace_batch]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1.7B", choices=["0.6B", "1.7B"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=125)
    ap.add_argument("--no-int8", action="store_true")
    ap.add_argument("--w8a8", action="store_true",
                    help="int8 activations (int8 x int8 MXU dots) in the "
                         "batched programs")
    ap.add_argument("--json", default=None)
    ap.add_argument(
        "--components",
        default="prefill,loop,talker,cp,sampling,vocoder,e2e",
        help="comma-separated subset to run (tunnel-failure recovery)",
    )
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="xplane-profile the batched loop into DIR and report")
    args = ap.parse_args()
    want = set(args.components.split(","))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from qwen3_tts_tpu import SynthesisOptions, tokens as T
    from qwen3_tts_tpu.generation import batch as gbatch
    from qwen3_tts_tpu.models import talker
    from qwen3_tts_tpu.models import code_predictor as cp
    from qwen3_tts_tpu.models.codec import vocoder
    from qwen3_tts_tpu.models.config import config_for_variant
    from qwen3_tts_tpu.ops import nn, quant, sampling
    from qwen3_tts_tpu.pipeline import DECODE_BUCKET, Qwen3TTS

    cfg = config_for_variant(args.size, "custom_voice")
    model = Qwen3TTS.from_random(cfg)
    if not args.no_int8:
        model = Qwen3TTS(
            model.config, model.talker_params, model.cp_params,
            model.vocoder_params, model.tokenizer,
            vocoder_config=model.vocoder_config, quantize_int8=True,
            int8_activations=args.w8a8,
        )

    class WordTokenizer:
        def encode(self, text):
            return [37 + (hash(w) % 15000) for w in text.split()]

    model.tokenizer = WordTokenizer()

    b, n = args.batch, args.frames
    tcfg, cpcfg = cfg.talker, cfg.code_predictor
    hidden = tcfg.hidden_size
    opts = SynthesisOptions(max_length=n, min_new_tokens=n, seed=42)
    texts = [f"Utterance number {i} of the decomposition corpus." for i in range(b)]
    audio_s = n * T.SAMPLES_PER_FRAME / T.OUTPUT_SAMPLE_RATE
    results = {
        "batch": b, "frames": n,
        "mode": "bf16" if args.no_int8 else ("int8-w8a8" if args.w8a8 else "int8"),
    }
    print(f"device: {jax.devices()[0]}  batch: {b}  mode: {results['mode']}")

    def flush():
        if args.json:
            Path(args.json).write_text(json.dumps(results, indent=2))

    def timed(label, fn, *, per_frame=True, warm=1, iters=2):
        try:
            for _ in range(warm):
                jax.block_until_ready(fn())
            best = min(
                (lambda t0: (jax.block_until_ready(fn()), time.perf_counter() - t0)[1])(
                    time.perf_counter()
                )
                for _ in range(iters)
            )
        except Exception as e:  # tunnel/compile failure: keep what we have
            results.setdefault("errors", {})[label] = f"{type(e).__name__}: {e}"[:300]
            print(f"{label:<12} FAILED: {e}", flush=True)
            flush()
            return False
        ms = best * 1e3 / (n if per_frame else 1)
        results[label] = round(ms, 3)
        print(f"{label:<12} {ms:8.3f} {'ms/frame' if per_frame else 'ms'}", flush=True)
        flush()
        return True

    # --- e2e + staged pieces via the public path ---
    states0, trailing, trailing_lens, pad_embed, uniforms, scfg = model._prepare_batch(
        texts, "ryan", "english", opts, None
    )
    shapes = jax.tree.map(lambda x: (x.shape, str(x.dtype)), states0.cache.k)
    del shapes

    def run_prefill():
        st, *_ = model._prepare_batch(texts, "ryan", "english", opts, None)
        return st.cache.k

    if "prefill" in want:
        timed("prefill_ms", run_prefill, per_frame=False)

    # Loop alone, re-entered on a fresh copy of the prefilled state each time
    # (generate_frames_batch donates its state arg).
    tp = {k: v for k, v in model.talker_params.items()}
    cpp = {k: v for k, v in model.cp_params.items()}

    def run_loop():
        st = jax.tree.map(jnp.copy, states0)
        return gbatch.generate_frames_batch(
            model.talker_params, model.cp_params, tcfg, cpcfg, scfg,
            st, trailing, trailing_lens, pad_embed, uniforms,
            jnp.full((b,), n, jnp.int32), mesh=None, w8a8=args.w8a8,
        ).frames

    if "loop" in want or args.trace:
        timed("loop_ms", run_loop)

    if args.trace:
        import subprocess

        out = Path(args.trace)
        print(f"tracing batched loop into {out} ...", flush=True)
        with jax.profiler.trace(str(out)):
            jax.block_until_ready(run_loop())
        subprocess.run(
            [sys.executable,
             str(Path(__file__).resolve().parent.parent / "scripts" / "trace_report.py"),
             str(out), "--frames", str(n), "--top", "40"],
            check=False,
        )

    # --- vmapped component loops (chained; exclude dispatch) ---
    rows = int(states0.cache.k.shape[-2] if hasattr(states0.cache, "k") else 288)
    stack = tcfg.layer_stack()
    # Strip batch-1-only packs exactly like generate_frames_batch does.
    tp_nopack = {k: v for k, v in tp.items() if k not in ("stream_pack", "tp_pack")}
    cpp_nopack = {k: v for k, v in cpp.items() if k not in ("stream_pack", "tp_pack")}

    from dataclasses import replace
    tcfg_b = replace(tcfg, decode_tiering=False)

    vstep = jax.vmap(
        lambda x, pos, cache: talker.decode_step(tp_nopack, tcfg_b, x, pos, cache),
        in_axes=(0, None, 0),
    )

    @jax.jit
    def talker_loop(x0, cache):
        def body(i, carry):
            x, cache = carry
            h, logits, cache = vstep(x, jnp.int32(10) + i, cache)
            # Fold one logit back into the carry (defeat DCE) with a
            # [B,1,1,1]-shaped term so broadcasting can't grow the carry.
            feed = logits.reshape(b, -1)[:, :1].reshape(b, 1, 1, 1)
            return (h + feed.astype(h.dtype) * 1e-9, cache)
        return jax.lax.fori_loop(0, n, body, (x0, cache))

    x0 = jnp.zeros((b, 1, 1, hidden), jnp.bfloat16) + 0.01
    if "talker" in want:
        cache0 = jax.vmap(lambda _: nn.init_kv_cache(stack, 1, rows, jnp.bfloat16))(
            jnp.arange(b)
        )
        # w8a8 is consulted at trace time; scope the first (tracing) call.
        with quant.pallas_dequant_scope(False), quant.w8a8_scope(args.w8a8):
            timed("talker_ms", lambda: talker_loop(x0, cache0))

    cp_slices = cp.scan_slices(cpp_nopack, cpcfg) if cpcfg.decode_mode != "jacobi" else None
    vcp = jax.vmap(
        lambda h, s: cp.predict_acoustic_codes(cpp_nopack, cpcfg, h, s, cp_slices),
        in_axes=(0, 0),
    )
    vsum = jax.vmap(lambda codes: cp.acoustic_embedding_sum(cpp_nopack, codes))

    @jax.jit
    def cp_loop(h0, s0):
        def body(i, carry):
            h, s = carry
            codes = vcp(h, s)
            asum = vsum(codes)
            return (h + asum.astype(h.dtype) * 1e-9, s)
        return jax.lax.fori_loop(0, n, body, (h0, s0))

    h0 = jnp.zeros((b, 1, 1, hidden), jnp.bfloat16) + 0.01
    s0 = jnp.zeros((b, 1, 1, hidden), jnp.bfloat16) + 0.02
    if "cp" in want:
        with quant.pallas_dequant_scope(False), quant.w8a8_scope(args.w8a8):
            timed("cp_ms", lambda: cp_loop(h0, s0))

    supp = sampling.build_suppression_mask(tcfg.codec_vocab_size, scfg.eos_token_id)
    uni = jnp.linspace(0.01, 0.99, n)
    vpen = jax.vmap(
        lambda lg, m, i: sampling.apply_generation_penalties(lg, m, supp, scfg, i),
        in_axes=(0, 0, None),
    )
    vsamp = jax.vmap(lambda lg, u: sampling.sample(lg, scfg, u)[0], in_axes=(0, None))

    @jax.jit
    def sample_loop(logits0, mask0):
        def body(i, carry):
            logits, mask = carry
            lg = vpen(logits, mask, i + 1)
            tok = vsamp(lg, uni[i])
            mask = jax.vmap(lambda m, t: m.at[t].set(1.0))(mask, tok)
            return (logits + tok[:, None, None].astype(jnp.float32) * 1e-9, mask)
        return jax.lax.fori_loop(0, n, body, (logits0, mask0))

    logits0 = jnp.zeros((b, 1, tcfg.codec_vocab_size), jnp.float32) + 0.1
    mask0 = jnp.zeros((b, tcfg.codec_vocab_size), jnp.float32)
    if "sampling" in want:
        timed("sampling_ms", lambda: sample_loop(logits0, mask0))

    # --- batched vocoder pass + frame fetch ---
    if "vocoder" in want:
        final = gbatch.generate_frames_batch(
            model.talker_params, model.cp_params, tcfg, cpcfg, scfg,
            jax.tree.map(jnp.copy, states0), trailing, trailing_lens, pad_embed,
            uniforms, jnp.full((b,), n, jnp.int32), mesh=None, w8a8=args.w8a8,
        )
        jax.block_until_ready(final.frames)

        def run_fetch():
            f, c = jax.device_get((final.frames, final.frame_idx))
            return jnp.zeros(())

        timed("fetch_ms", run_fetch, per_frame=False)

        frames_np, counts = jax.device_get((final.frames, final.frame_idx))
        t_max = max(int(np.asarray(counts).max()), 1)
        codes = np.swapaxes(np.asarray(frames_np[:, :t_max, :], np.int32), 1, 2)

        def run_voc():
            return vocoder.decode_bucketed(
                model.vocoder_params, model.vocoder_config, codes, bucket=DECODE_BUCKET
            )

        timed("vocoder_ms", run_voc, per_frame=False)

    if "e2e" in want:
        def run_e2e():
            return model.synthesize_batch(texts, "ryan", "english", opts)

        timed("e2e_ms", run_e2e, per_frame=False)

    if results.get("e2e_ms") is not None:
        results["e2e_frame_ms"] = round(results["e2e_ms"] / n, 3)
        results["aggregate_rtf"] = round(results["e2e_ms"] / 1e3 / (b * audio_s), 4)
        staged = ("loop_ms", "prefill_ms", "vocoder_ms", "fetch_ms")
        if all(results.get(k) is not None for k in staged):
            known = (results["loop_ms"] * n + results["prefill_ms"]
                     + results["vocoder_ms"] + results["fetch_ms"])
            results["other_ms"] = round(results["e2e_ms"] - known, 3)
    comps = ("talker_ms", "cp_ms", "sampling_ms")
    if results.get("loop_ms") is not None and all(
        results.get(k) is not None for k in comps
    ):
        comp = sum(results[k] for k in comps)
        results["loop_glue_ms"] = round(results["loop_ms"] - comp, 3)
    print(json.dumps(results, indent=2))
    flush()


if __name__ == "__main__":
    main()
