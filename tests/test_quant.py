"""Weight-only int8 quantization tests (CPU fallback path + accuracy)."""

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_tts_tpu.ops import quant


def test_quantize_roundtrip_accuracy():
    rs = np.random.RandomState(0)
    w = rs.randn(256, 512).astype(np.float32) * 0.05
    q = quant.quantize_linear(jnp.asarray(w))
    deq = np.asarray(q["q8"], np.float32) * np.asarray(q["scale"])[None, :]
    # per-channel absmax int8: relative error bounded by ~1/254 of the range
    rel = np.abs(deq - w).max() / np.abs(w).max()
    assert rel < 0.01


def test_mm_dispatch_matches_dense():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(3, 256).astype(np.float32))
    w = jnp.asarray(rs.randn(256, 512).astype(np.float32) * 0.05)
    q = quant.quantize_linear(w)
    out_q = np.asarray(quant.mm(x, q), np.float32)
    out_d = np.asarray(x @ w)
    # cosine similarity per row should be ~1
    for i in range(3):
        cos = out_q[i] @ out_d[i] / (np.linalg.norm(out_q[i]) * np.linalg.norm(out_d[i]))
        assert cos > 0.9995, cos


def test_quantized_generation_runs_and_is_deterministic():
    import tests.test_pipeline as tp
    from qwen3_tts_tpu.models import weights as W
    from qwen3_tts_tpu.models.codec import vocoder
    from qwen3_tts_tpu.models.config import ModelConfig, ModelType
    from qwen3_tts_tpu.pipeline import Qwen3TTS

    cfg = ModelConfig(
        model_type=ModelType.CUSTOM_VOICE,
        model_size="0b6",
        talker=tp.TINY_TALKER,
        code_predictor=tp.TINY_CP,
    )
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    model = Qwen3TTS(
        cfg,
        W.init_talker_params(k1, tp.TINY_TALKER, jnp.float32),
        W.init_code_predictor_params(k2, tp.TINY_CP, jnp.float32),
        vocoder.init_vocoder_params(k3, tp.TINY_VOC),
        tp.FakeTokenizer(),
        vocoder_config=tp.TINY_VOC,
        quantize_int8=True,
    )
    a1, t1 = model.synthesize_with_timing("Quantized", "ryan", "english", tp.OPTS)
    a2, _ = model.synthesize_with_timing("Quantized", "ryan", "english", tp.OPTS)
    assert t1.generation_frames > 0
    np.testing.assert_array_equal(a1.samples, a2.samples)


def test_vmap_folds_batch_into_rows():
    """vmapped int8_matmul must hit the row-folding custom_vmap rule.

    The rule (ops/quant.py:_int8_mm_core_vmap) collapses the batch axis into
    matmul rows so a batched program reads each weight matrix once instead
    of jax.vmap's repeat-the-kernel default (journal R4.8). Pin (a) numeric
    equality with per-example calls, and (b) that the batched trace contains
    exactly ONE dot over the weights, not B.
    """
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(5, 2, 256).astype(np.float32))
    w = jnp.asarray(rs.randn(256, 512).astype(np.float32) * 0.05)
    q = quant.quantize_linear(w)

    batched = jax.vmap(lambda xi: quant.mm(xi, q))(x)
    for i in range(5):
        # Bit-identical on TPU; CPU dots accumulate in a shape-dependent
        # order, leaving ~1e-7 f32 noise between m=2 and folded m=10.
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(quant.mm(x[i], q)),
            rtol=1e-5, atol=1e-6,
        )

    jaxpr = jax.make_jaxpr(jax.vmap(lambda xi: quant.mm(xi, q)))(x)
    dots = str(jaxpr).count("dot_general")
    assert dots == 1, f"expected one folded dot over the weights, got {dots}"


def test_vmap_batched_weights_fall_back():
    """Per-example quantized weights (q8 batched) use the plain-vmap path."""
    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randn(3, 2, 128).astype(np.float32))
    w = jnp.asarray(rs.randn(3, 128, 256).astype(np.float32) * 0.05)
    qs = jax.vmap(quant.quantize_linear)(w)

    batched = jax.vmap(lambda xi, q8, s: quant.int8_matmul(xi, q8, s))(
        x, qs["q8"], qs["scale"]
    )
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(batched[i]),
            np.asarray(quant.int8_matmul(x[i], qs["q8"][i], qs["scale"][i])),
            rtol=1e-5,
            atol=1e-5,
        )


def test_pallas_kernel_matches_fallback_interpret():
    """Run the Pallas kernel in interpret mode on CPU and compare."""
    from jax.experimental.pallas import tpu as pltpu

    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(1, 256).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rs.randn(256, 512).astype(np.float32) * 0.05)
    q = quant.quantize_linear(w)

    fn = quant._make_pallas_matmul(1, 256, 512, jnp.bfloat16)
    assert fn is not None
    try:
        with pltpu.force_tpu_interpret_mode():
            out_k = fn(x, q["q8"], q["scale"].astype(jnp.float32)[None, :])
    except Exception as e:  # noqa: BLE001 — interpret support varies by version
        import pytest

        pytest.skip(f"pallas interpret mode unavailable on CPU: {e}")
    out_f = quant._dequant_matmul_reference(x, q["q8"], q["scale"])
    np.testing.assert_allclose(
        np.asarray(out_k, np.float32), np.asarray(out_f, np.float32), rtol=2e-2, atol=1e-3
    )
