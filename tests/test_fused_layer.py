"""Fused whole-layer CP kernels: exactness vs the unfused int8 path.

VERDICT r1 item 5: the code predictor's decode steps run through two fused
Pallas kernels per layer (ops/fused_layer.py). Codes must be identical to
the unfused dequant-then-dot path (tested here in interpret mode on the
CPU mesh; the TPU benchmark validates the perf claim separately).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qwen3_tts_tpu.models import code_predictor as cp
from qwen3_tts_tpu.models import weights as W
from qwen3_tts_tpu.models.config import CodePredictorConfig
from qwen3_tts_tpu.ops import fused_layer, quant

pytestmark = pytest.mark.slow  # heavy integration tier; `make test-fast` skips


CFG = CodePredictorConfig(
    hidden_size=64, intermediate_size=96, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, head_dim=16, vocab_size=128,
)


def _quantized_params(key, cfg=CFG, dtype=jnp.float32):
    params = W.init_code_predictor_params(key, cfg, dtype)
    return quant.quantize_code_predictor_params(W.fuse_model_params(params))


def test_supports_fused_step_detection():
    base = W.init_code_predictor_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    assert not fused_layer.supports_fused_step(base["layers"])
    fused_only = W.fuse_model_params(base)
    assert not fused_layer.supports_fused_step(fused_only["layers"])
    q = quant.quantize_code_predictor_params(fused_only)
    assert fused_layer.supports_fused_step(q["layers"])


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_codes_match_unfused(dtype, monkeypatch):
    params = _quantized_params(jax.random.PRNGKey(1), CFG, dtype)
    rs = np.random.RandomState(0)
    hidden = jnp.asarray(rs.randn(1, 1, CFG.hidden_size).astype(np.float32), dtype)
    semantic = jnp.asarray(rs.randn(1, 1, CFG.hidden_size).astype(np.float32), dtype)

    got = np.asarray(cp.predict_acoustic_codes(params, CFG, hidden, semantic))

    # Reference: the same quantized weights through the generic (unfused
    # per-matmul) stack — force the dispatch off.
    monkeypatch.setattr(fused_layer, "supports_fused_step", lambda layers: False)
    want = np.asarray(cp.predict_acoustic_codes(params, CFG, hidden, semantic))
    np.testing.assert_array_equal(got, want)


def test_fused_step_activations_close(monkeypatch):
    """Beyond argmax equality: hidden activations agree to f32 tolerance."""
    params = _quantized_params(jax.random.PRNGKey(2))
    stack_cfg = CFG.layer_stack()
    from qwen3_tts_tpu.ops import nn

    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(1, 1, CFG.hidden_size).astype(np.float32))
    cache = nn.init_kv_cache(stack_cfg, 1, cp.CP_MAX_SEQ, jnp.float32)
    # Prefill rows 0..1 with the standard path so both variants share state.
    pre = jnp.asarray(rs.randn(1, 2, CFG.hidden_size).astype(np.float32))
    h0, cache = nn.run_layer_stack(
        params["layers"], pre, stack_cfg, cache, jnp.arange(2, dtype=jnp.int32), jnp.int32(0)
    )

    # Unfused single decode step at pos 2.
    h_ref, cache_ref = nn.run_layer_stack(
        params["layers"], x, stack_cfg, cache, jnp.int32(2)[None], jnp.int32(2)
    )

    kvd = stack_cfg.num_kv_heads * stack_cfg.head_dim
    ck = cache.k.reshape(stack_cfg.num_layers, cp.CP_MAX_SEQ, kvd)
    cv = cache.v.reshape(stack_cfg.num_layers, cp.CP_MAX_SEQ, kvd)
    inv_freq = nn.rope_inv_freq(stack_cfg.head_dim, stack_cfg.rope_theta)
    cos_t, sin_t = nn.rope_cos_sin(jnp.arange(cp.CP_MAX_SEQ, dtype=jnp.float32), inv_freq)
    h_fused, ck2, cv2 = fused_layer.run_fused_decode_step(
        params["layers"], x, stack_cfg, ck, cv, jnp.int32(2), cos_t, sin_t
    )

    np.testing.assert_allclose(
        np.asarray(h_fused), np.asarray(h_ref), rtol=0, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(ck2.reshape(cache_ref.k.shape)), np.asarray(cache_ref.k),
        rtol=0, atol=2e-5,
    )


def test_fused_in_generation_loop():
    """The full frame loop works with the fused CP (codes via while_loop)."""
    from qwen3_tts_tpu.generation import core, prefill
    from qwen3_tts_tpu.models.config import TalkerConfig
    from qwen3_tts_tpu.ops import nn, rng, sampling

    tcfg = TalkerConfig(
        text_embed_dim=32, hidden_size=64, text_proj_intermediate=32,
        intermediate_size=96, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    tparams = quant.quantize_talker_params(
        W.fuse_model_params(W.init_talker_params(k1, tcfg, jnp.float32))
    )
    cparams = _quantized_params(k2)
    scfg = sampling.SamplingConfig()
    max_new = 4
    cache = nn.init_kv_cache(tcfg.layer_stack(), 1, 10 + max_new + 2, jnp.float32)
    uniforms = jnp.asarray(rng.pcg_uniform_sequence(42, max_new + 1))
    state, trailing, tl, pad = prefill.prefill_custom_voice(
        tparams, tcfg, scfg, jnp.array([5, 9, 3, 0], jnp.int32), jnp.int32(3),
        jnp.int32(3061), jnp.int32(2050), cache, uniforms, max_new,
    )
    final = core.generate_frames_jit(
        tparams, cparams, tcfg, CFG, scfg, state, trailing, tl, pad, uniforms,
        jnp.int32(max_new),
    )
    frames = np.asarray(final.frames[: int(final.frame_idx)])
    assert frames.shape[1] == 16
    assert (frames[:, 1:] < CFG.vocab_size).all() and (frames >= 0).all()


STREAM_CFG = CodePredictorConfig(
    hidden_size=64, intermediate_size=128, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, head_dim=16, vocab_size=128,
)


def test_make_stream_pack_shapes():
    params = _quantized_params(jax.random.PRNGKey(4), STREAM_CFG)
    pack = fused_layer.make_stream_pack(params["layers"], STREAM_CFG.layer_stack())
    assert pack is not None
    nq, ko, ng, kd = pack["plan"]
    h = STREAM_CFG.hidden_size
    assert (nq, ko, ng, kd) == (2, 1, 4, 2)  # qkv 128, o K 64, gu 256, down K 128
    assert pack["tiles"].shape == (2, nq + ko + ng + kd, h, h)
    assert pack["tiles"].dtype == jnp.int8
    # Non-divisible dims -> no pack, graceful fallback.
    odd = _quantized_params(jax.random.PRNGKey(5), CFG)  # inter 96 not % 64
    assert fused_layer.make_stream_pack(odd["layers"], CFG.layer_stack()) is None


def test_streamed_codes_match_unfused(monkeypatch):
    """The whole-step streaming kernel produces identical codes."""
    params = _quantized_params(jax.random.PRNGKey(6), STREAM_CFG)
    pack = fused_layer.make_stream_pack(params["layers"], STREAM_CFG.layer_stack())
    assert pack is not None
    params_stream = dict(params)
    params_stream["stream_pack"] = pack

    rs = np.random.RandomState(2)
    hidden = jnp.asarray(rs.randn(1, 1, STREAM_CFG.hidden_size).astype(np.float32))
    semantic = jnp.asarray(rs.randn(1, 1, STREAM_CFG.hidden_size).astype(np.float32))
    got = np.asarray(
        cp.predict_acoustic_codes(params_stream, STREAM_CFG, hidden, semantic)
    )

    monkeypatch.setattr(fused_layer, "supports_fused_step", lambda layers: False)
    want = np.asarray(cp.predict_acoustic_codes(params, STREAM_CFG, hidden, semantic))
    np.testing.assert_array_equal(got, want)


def test_streamed_step_activations_close():
    """Streamed step vs two-kernel fused step, same cache/inputs."""
    from qwen3_tts_tpu.ops import nn

    params = _quantized_params(jax.random.PRNGKey(7), STREAM_CFG)
    stack_cfg = STREAM_CFG.layer_stack()
    pack = fused_layer.make_stream_pack(params["layers"], stack_cfg)
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(1, 1, STREAM_CFG.hidden_size).astype(np.float32),
                    jnp.bfloat16)
    kvd = stack_cfg.num_kv_heads * stack_cfg.head_dim
    ck = jnp.asarray(rs.randn(2, cp.CP_MAX_SEQ, kvd).astype(np.float32), jnp.bfloat16)
    cv = jnp.asarray(rs.randn(2, cp.CP_MAX_SEQ, kvd).astype(np.float32), jnp.bfloat16)
    inv_freq = nn.rope_inv_freq(stack_cfg.head_dim, stack_cfg.rope_theta)
    cos_t, sin_t = nn.rope_cos_sin(jnp.arange(cp.CP_MAX_SEQ, dtype=jnp.float32), inv_freq)
    pos = jnp.int32(3)

    h_ref, ck_ref, cv_ref = fused_layer.run_fused_decode_step(
        params["layers"], x, stack_cfg, ck, cv, pos, cos_t, sin_t
    )
    h_s, ck_s, cv_s = fused_layer.run_fused_decode_step(
        params["layers"], x, stack_cfg, ck, cv, pos, cos_t, sin_t, pack
    )
    np.testing.assert_allclose(
        np.asarray(h_s, np.float32), np.asarray(h_ref, np.float32), rtol=0, atol=2e-2
    )
    # K-split o/down matmuls change f32 summation order -> layer outputs can
    # differ by ~1 bf16 ulp, which shifts the NEXT layer's written cache row.
    # Untouched rows are bit-identical; written rows agree to bf16 ulp.
    np.testing.assert_allclose(
        np.asarray(ck_s, np.float32), np.asarray(ck_ref, np.float32), rtol=0.02, atol=0.02
    )
    np.testing.assert_allclose(
        np.asarray(cv_s, np.float32), np.asarray(cv_ref, np.float32), rtol=0.02, atol=0.02
    )


@pytest.mark.parametrize("embed_dim", [None, 128])
def test_cp_frame_kernel_codes_match_unfused(embed_dim, monkeypatch):
    """Whole-frame CP kernel (weights resident in VMEM) is code-exact.

    embed_dim=128 exercises the mtp-projection path (1.7B layout: codec
    embeddings at talker width, projected 2x down into the CP stack).
    """
    from dataclasses import replace as dc_replace

    cfg = dc_replace(STREAM_CFG, codec_embed_dim=embed_dim)
    params = _quantized_params(jax.random.PRNGKey(9), cfg)
    pack = fused_layer.make_stream_pack(params["layers"], cfg.layer_stack())
    assert pack is not None
    params_frame = dict(params)
    params_frame["stream_pack"] = pack
    assert fused_layer.supports_cp_frame_kernel(params_frame, cfg)

    rs = np.random.RandomState(5)
    e = cfg.embed_dim
    hidden = jnp.asarray(rs.randn(1, 1, e).astype(np.float32))
    semantic = jnp.asarray(rs.randn(1, 1, e).astype(np.float32))
    got = np.asarray(cp.predict_acoustic_codes(params_frame, cfg, hidden, semantic))

    monkeypatch.setattr(fused_layer, "supports_fused_step", lambda layers: False)
    want = np.asarray(cp.predict_acoustic_codes(params, cfg, hidden, semantic))
    np.testing.assert_array_equal(got, want)


def test_cp_resident_layers_tracks_budget(monkeypatch):
    """cp_resident_layers (used by streamed_cp_frame and benches/cp_ab.py)
    scales with CP_WRES_BUDGET and clamps to [1, num_layers]."""
    params = _quantized_params(jax.random.PRNGKey(3), STREAM_CFG)
    pack = fused_layer.make_stream_pack(params["layers"], STREAM_CFG.layer_stack())
    params_frame = dict(params)
    params_frame["stream_pack"] = pack
    layers = STREAM_CFG.layer_stack().num_layers

    monkeypatch.setattr(fused_layer, "CP_WRES_BUDGET", 2**62)
    assert fused_layer.cp_resident_layers(params_frame, STREAM_CFG) == layers
    monkeypatch.setattr(fused_layer, "CP_WRES_BUDGET", 0)
    assert fused_layer.cp_resident_layers(params_frame, STREAM_CFG) == 1
    # Exactly one layer's bytes -> one resident layer.
    stack = STREAM_CFG.layer_stack()
    d = stack.head_dim
    tiles = (
        (stack.num_heads * d + 2 * stack.num_kv_heads * d) // stack.hidden_size
        + stack.num_heads * d // stack.hidden_size
        + 3 * stack.intermediate_size // stack.hidden_size
    )
    one_layer = tiles * stack.hidden_size**2 * pack["tiles"].dtype.itemsize
    monkeypatch.setattr(fused_layer, "CP_WRES_BUDGET", one_layer)
    assert fused_layer.cp_resident_layers(params_frame, STREAM_CFG) == 1
    monkeypatch.setattr(fused_layer, "CP_WRES_BUDGET", 2 * one_layer)
    assert fused_layer.cp_resident_layers(params_frame, STREAM_CFG) == min(layers, 2)


@pytest.mark.parametrize("embed_dim", [None, 128])
@pytest.mark.parametrize("resident", [None, 1])
def test_cp_frame_kernel_plain_bf16_mode(embed_dim, resident, monkeypatch):
    """Plain (unquantized) CP frame kernel — the bf16 pipeline's CP path.

    resident=1 forces the partial-residency ring (layers >= resident
    re-stream their tiles every step); codes must equal the plain XLA scan
    either way. f32 weights keep the comparison exact on CPU.
    """
    from dataclasses import replace as dc_replace

    cfg = dc_replace(STREAM_CFG, codec_embed_dim=embed_dim)
    params = W.fuse_model_params(
        W.init_code_predictor_params(jax.random.PRNGKey(12), cfg, jnp.float32)
    )
    pack = fused_layer.make_stream_pack(params["layers"], cfg.layer_stack())
    assert pack is not None and pack["tiles"].dtype == jnp.float32
    params_frame = dict(params)
    params_frame["stream_pack"] = pack
    assert fused_layer.supports_cp_frame_kernel(params_frame, cfg)

    rs = np.random.RandomState(7)
    e = cfg.embed_dim
    hidden = jnp.asarray(rs.randn(1, 1, e).astype(np.float32))
    semantic = jnp.asarray(rs.randn(1, 1, e).astype(np.float32))
    got = np.asarray(
        fused_layer.streamed_cp_frame(
            params_frame, cfg, hidden, semantic, resident_override=resident
        )
    )

    # Plain unfused tree -> the standard XLA path.
    base = W.init_code_predictor_params(jax.random.PRNGKey(12), cfg, jnp.float32)
    want = np.asarray(cp.predict_acoustic_codes(base, cfg, hidden, semantic))
    np.testing.assert_array_equal(got, want)


def test_cp_frame_kernel_in_generation_loop():
    """The whole-frame CP kernel works inside the jitted while_loop."""
    from qwen3_tts_tpu.generation import core, prefill
    from qwen3_tts_tpu.models.config import TalkerConfig
    from qwen3_tts_tpu.ops import nn, rng, sampling

    tcfg = TalkerConfig(
        text_embed_dim=32, hidden_size=64, text_proj_intermediate=32,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(10))
    tparams = quant.quantize_talker_params(
        W.fuse_model_params(W.init_talker_params(k1, tcfg, jnp.float32))
    )
    cparams = _quantized_params(k2, STREAM_CFG)
    cparams["stream_pack"] = fused_layer.make_stream_pack(
        cparams["layers"], STREAM_CFG.layer_stack()
    )
    assert fused_layer.supports_cp_frame_kernel(cparams, STREAM_CFG)
    scfg = sampling.SamplingConfig()
    max_new = 4
    cache = nn.init_kv_cache(tcfg.layer_stack(), 1, 10 + max_new + 2, jnp.float32)
    uniforms = jnp.asarray(rng.pcg_uniform_sequence(42, max_new + 1))
    state, trailing, tl, pad = prefill.prefill_custom_voice(
        tparams, tcfg, scfg, jnp.array([5, 9, 3, 0], jnp.int32), jnp.int32(3),
        jnp.int32(3061), jnp.int32(2050), cache, uniforms, max_new,
    )
    final = core.generate_frames_jit(
        tparams, cparams, tcfg, STREAM_CFG, scfg, state, trailing, tl, pad,
        uniforms, jnp.int32(max_new),
    )
    frames = np.asarray(final.frames[: int(final.frame_idx)])
    assert frames.shape[1] == 16
    assert (frames[:, 1:] < STREAM_CFG.vocab_size).all() and (frames >= 0).all()


@pytest.mark.parametrize("max_seq", [24, 32, 288])
def test_streamed_talker_step_matches_xla(max_seq):
    """Whole-step streamed talker kernel vs the XLA layer scan.

    max_seq=24 exercises the whole-plane cache write-back (odd S); 32 the
    16-row aligned-slab write-back used by all real cache tiers; 288 the
    multi-block online-softmax attention (2 blocks of 256 with a clamped,
    masked-overlap final block — the path every tier above 256 rows uses).
    """
    from qwen3_tts_tpu.models import talker as TM
    from qwen3_tts_tpu.models.config import TalkerConfig
    from qwen3_tts_tpu.ops import nn

    tcfg = TalkerConfig(
        text_embed_dim=32, hidden_size=64, text_proj_intermediate=32,
        intermediate_size=128, num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16,
    )
    tparams = quant.quantize_talker_params(
        W.fuse_model_params(W.init_talker_params(jax.random.PRNGKey(8), tcfg, jnp.float32))
    )
    pack = fused_layer.make_stream_pack(tparams["layers"], tcfg.layer_stack())
    assert pack is not None
    rs = np.random.RandomState(4)
    stack_cfg = tcfg.layer_stack()
    kvd = stack_cfg.num_kv_heads * stack_cfg.head_dim
    cache = nn.KVCache(
        jnp.asarray(rs.randn(3, 1, max_seq, 2, 16).astype(np.float32), jnp.bfloat16),
        jnp.asarray(rs.randn(3, 1, max_seq, 2, 16).astype(np.float32), jnp.bfloat16),
    )
    x = jnp.asarray(rs.randn(1, 1, 64).astype(np.float32), jnp.bfloat16)
    # Nonzero slab offset for the aligned-slab path (pos 17 -> slab [16, 32));
    # pos 270 lands in the clamped second attention block at max_seq=288.
    pos = jnp.int32({24: 5, 32: 17, 288: 270}[max_seq])

    h_ref, logits_ref, cache_ref = TM.decode_step(tparams, tcfg, x, pos, cache)

    tstream = dict(tparams)
    tstream["stream_pack"] = pack
    h_s, logits_s, cache_s = TM.decode_step(tstream, tcfg, x, pos, cache)

    np.testing.assert_allclose(
        np.asarray(h_s, np.float32), np.asarray(h_ref, np.float32), rtol=0.03, atol=0.03
    )
    # Same argmax token from the logits.
    assert int(jnp.argmax(logits_s)) == int(jnp.argmax(logits_ref))
    np.testing.assert_allclose(
        np.asarray(cache_s.k, np.float32), np.asarray(cache_ref.k, np.float32),
        rtol=0.03, atol=0.03,
    )


def _tiny_pipeline_args():
    import tests.test_pipeline as tp
    from dataclasses import replace as dc_replace

    from qwen3_tts_tpu.models.config import ModelConfig, ModelType
    from qwen3_tts_tpu.models.codec import vocoder

    # Split-free dims (intermediate == hidden so ko = kd = 1): with K-split
    # tiles the partial-sum rounding (~1 bf16 ulp) can flip SAMPLED tokens on
    # a random tiny model's near-flat logits, which says nothing about real
    # checkpoints (peaked logits).
    talker_cfg = dc_replace(tp.TINY_TALKER, intermediate_size=64)
    cp_cfg = dc_replace(tp.TINY_CP, intermediate_size=64)
    cfg = ModelConfig(
        model_type=ModelType.CUSTOM_VOICE, model_size="0b6",
        talker=talker_cfg, code_predictor=cp_cfg,
    )
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    return (
        cfg,
        W.init_talker_params(k1, talker_cfg, jnp.float32),
        W.init_code_predictor_params(k2, cp_cfg, jnp.float32),
        vocoder.init_vocoder_params(k3, tp.TINY_VOC),
        tp.FakeTokenizer(),
    ), tp.TINY_VOC


def test_cp_pack_pipeline_matches_no_pack():
    """CP whole-frame kernel in the real loop: codes == pack-free int8 run.

    Talker pack removed on both sides so both runs feed the CP identical
    hidden states — the assertion isolates the CP kernel's in-loop
    exactness. (The talker stream kernel is verified separately: its
    rounding differs from the XLA scan by ~1 ulp, which on random tiny
    weights can flip a later frame's near-tie argmax — a both-packs
    bit-equality assertion is therefore inherently flaky and says nothing
    about either kernel's correctness.)
    """
    from qwen3_tts_tpu.pipeline import Qwen3TTS, SynthesisOptions

    args, tiny_voc = _tiny_pipeline_args()
    opts = SynthesisOptions(max_length=6, seed=42)

    m_cp = Qwen3TTS(*args, vocoder_config=tiny_voc, quantize_int8=True)
    assert "stream_pack" in m_cp.cp_params
    m_cp.talker_params.pop("stream_pack")
    frames_cp = m_cp.synthesize_streaming("stream talker", "ryan", "english", opts).run_to_completion()

    m_plain = Qwen3TTS(*args, vocoder_config=tiny_voc, quantize_int8=True)
    m_plain.talker_params.pop("stream_pack")
    m_plain.cp_params.pop("stream_pack")
    frames_plain = m_plain.synthesize_streaming("stream talker", "ryan", "english", opts).run_to_completion()
    np.testing.assert_array_equal(frames_cp, frames_plain)


def test_bf16_stream_pack_talker_step_matches_xla():
    """Plain (unquantized) stream pack: kernel step vs the XLA layer scan.

    f32 weights + f32 compute through the kernel must match the XLA path
    closely (no int8 dequant rounding): 1e-5 tolerance and the same argmax.
    """
    from qwen3_tts_tpu.models import talker as TM
    from qwen3_tts_tpu.models.config import TalkerConfig
    from qwen3_tts_tpu.ops import nn

    tcfg = TalkerConfig(
        text_embed_dim=32, hidden_size=64, text_proj_intermediate=32,
        intermediate_size=128, num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16,
    )
    tparams = W.fuse_model_params(
        W.init_talker_params(jax.random.PRNGKey(11), tcfg, jnp.float32)
    )
    pack = fused_layer.make_stream_pack(tparams["layers"], tcfg.layer_stack())
    assert pack is not None
    assert pack["tiles"].dtype == jnp.float32

    rs = np.random.RandomState(6)
    max_seq = 32
    cache = nn.KVCache(
        jnp.asarray(rs.randn(3, 1, max_seq, 2, 16).astype(np.float32)),
        jnp.asarray(rs.randn(3, 1, max_seq, 2, 16).astype(np.float32)),
    )
    x = jnp.asarray(rs.randn(1, 1, 64).astype(np.float32))
    pos = jnp.int32(17)

    h_ref, logits_ref, cache_ref = TM.decode_step(tparams, tcfg, x, pos, cache)
    tstream = dict(tparams)
    tstream["stream_pack"] = pack
    h_s, logits_s, cache_s = TM.decode_step(tstream, tcfg, x, pos, cache)

    np.testing.assert_allclose(
        np.asarray(h_s), np.asarray(h_ref), rtol=1e-5, atol=1e-5
    )
    assert int(jnp.argmax(logits_s)) == int(jnp.argmax(logits_ref))
    np.testing.assert_allclose(
        np.asarray(cache_s.k), np.asarray(cache_ref.k), rtol=1e-5, atol=1e-5
    )


def test_bf16_stream_pack_built_by_pipeline(monkeypatch):
    """QWEN3_TTS_BF16_STREAM_PACK opts non-int8 models into a plain pack.

    Measured neutral on v5e (journal R2.7) so it is opt-in; the pipeline
    must still build a working pack and keep the canonical tree unfused.
    """
    from qwen3_tts_tpu.pipeline import Qwen3TTS, SynthesisOptions

    monkeypatch.setenv("QWEN3_TTS_BF16_STREAM_PACK", "1")
    args, tiny_voc = _tiny_pipeline_args()
    m = Qwen3TTS(*args, vocoder_config=tiny_voc)
    assert "stream_pack" in m.talker_params
    assert m.talker_params["stream_pack"]["tiles"].dtype == jnp.float32
    # Canonical tree stays unfused.
    assert "q_proj" in m.talker_params["layers"]
    opts = SynthesisOptions(max_length=4, seed=42)
    frames = m.synthesize_streaming("bf16 pack", "ryan", "english", opts).run_to_completion()
    assert frames.shape == (4, 16)
    # Default: no pack in bf16 mode.
    monkeypatch.delenv("QWEN3_TTS_BF16_STREAM_PACK")
    m2 = Qwen3TTS(*args, vocoder_config=tiny_voc)
    assert "stream_pack" not in m2.talker_params


def test_streamed_talker_full_pipeline_codes():
    """Pipeline with BOTH stream packs runs end-to-end and emits valid frames.

    Bit-equality with the pack-free run is asserted for the CP kernel above
    (identical inputs); the talker kernel's per-step token agreement is
    asserted in test_streamed_talker_step_matches_xla. The combined run
    cannot promise bit-equal codes on random tiny weights: the talker
    kernel's ~1-ulp rounding difference perturbs near-tie argmaxes a few
    frames in (observed at frame 5 on this seed with the OLD per-step CP
    path as well).
    """
    from qwen3_tts_tpu.pipeline import Qwen3TTS, SynthesisOptions

    args, tiny_voc = _tiny_pipeline_args()
    cp_cfg = args[0].code_predictor
    m_stream = Qwen3TTS(*args, vocoder_config=tiny_voc, quantize_int8=True)
    assert "stream_pack" in m_stream.talker_params
    assert "stream_pack" in m_stream.cp_params
    opts = SynthesisOptions(max_length=6, seed=42)
    sess = m_stream.synthesize_streaming("stream talker", "ryan", "english", opts)
    frames = sess.run_to_completion()
    assert frames.shape == (6, 16)
    assert (frames[:, 1:] < cp_cfg.vocab_size).all() and (frames >= 0).all()

    # Guardrail against a genuine both-packs interaction regression: the
    # same quantized trees WITHOUT the packs must agree on the early frames
    # (near-tie argmax flips from ~1-ulp kernel rounding only accumulate
    # later in the sequence) and on a high fraction of all codes.
    m_plain = Qwen3TTS(*args, vocoder_config=tiny_voc, quantize_int8=True)
    m_plain.talker_params.pop("stream_pack")
    m_plain.cp_params.pop("stream_pack")
    sess_p = m_plain.synthesize_streaming("stream talker", "ryan", "english", opts)
    frames_p = sess_p.run_to_completion()
    n = min(len(frames), len(frames_p))
    assert n >= 2
    np.testing.assert_array_equal(frames[:2], frames_p[:2])
    agreement = (frames[:n] == frames_p[:n]).mean()
    assert agreement >= 0.9, f"stream-pack code agreement {agreement:.2%} < 90%"


def test_batched_scope_routes_cp_off_pallas():
    """Under pallas_dequant_scope(False) — how every batched entry point
    traces (generation/batch.py) — the CP must take the generic stack, not
    the fused per-layer Pallas kernels: jax.vmap batches a raw pallas_call
    by grid-repeating the kernel per example, re-reading the batch-invariant
    weights B times per sub-step (9.4 of 13.9 ms/frame at 1.7B int8 batch 8,
    journal R4.9). Pin (a) a pallas-free batched trace and (b) per-example
    equality with the solo fused path."""
    params = _quantized_params(jax.random.PRNGKey(7), CFG)
    rs = np.random.RandomState(7)
    b = 3
    hidden = jnp.asarray(rs.randn(b, 1, 1, CFG.hidden_size).astype(np.float32))
    semantic = jnp.asarray(rs.randn(b, 1, 1, CFG.hidden_size).astype(np.float32))

    vcp = jax.vmap(
        lambda h, s: cp.predict_acoustic_codes(params, CFG, h, s), in_axes=(0, 0)
    )
    with quant.pallas_dequant_scope(False):
        jaxpr = str(jax.make_jaxpr(vcp)(hidden, semantic))
        assert "pallas_call" not in jaxpr, "batched CP traced a Pallas kernel"
        got = np.asarray(vcp(hidden, semantic))

    assert fused_layer.supports_fused_step(params["layers"])  # solo still fused
    for i in range(b):
        want = np.asarray(
            cp.predict_acoustic_codes(params, CFG, hidden[i], semantic[i])
        )
        np.testing.assert_array_equal(got[i], want)
