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


# ---------------------------------------------------------------------------
# w8a8 (dynamic activation quantization, opt-in — journal R4.10)
# ---------------------------------------------------------------------------


def test_w8a8_matmul_close_to_dense():
    """int8 x int8 MXU dot with per-row activation scales tracks the dense
    matmul (lossy but near-lossless: two symmetric int8 roundings)."""
    rs = np.random.RandomState(6)
    x = jnp.asarray(rs.randn(4, 256).astype(np.float32))
    w = jnp.asarray(rs.randn(256, 512).astype(np.float32) * 0.05)
    q = quant.quantize_linear(w)
    with quant.w8a8_scope(True):
        out_q = np.asarray(quant.mm(x, q), np.float32)
    out_d = np.asarray(x @ w)
    for i in range(4):
        cos = out_q[i] @ out_d[i] / (
            np.linalg.norm(out_q[i]) * np.linalg.norm(out_d[i])
        )
        assert cos > 0.999, cos


def test_w8a8_scope_is_off_by_default_and_restores():
    rs = np.random.RandomState(7)
    x = jnp.asarray(rs.randn(2, 128).astype(np.float32))
    w = jnp.asarray(rs.randn(128, 256).astype(np.float32) * 0.05)
    q = quant.quantize_linear(w)
    base = np.asarray(quant.mm(x, q))
    with quant.w8a8_scope(True):
        assert quant._w8a8_allowed()
        inner = np.asarray(quant.mm(x, q))
    assert not quant._w8a8_allowed()
    after = np.asarray(quant.mm(x, q))
    # scope restored: outside traces take the weight-only path again
    np.testing.assert_array_equal(base, after)
    # and the w8a8 product is a *different* (activation-rounded) number
    assert np.abs(inner - base).max() > 0

def test_w8a8_scope_disable_is_sticky_under_nesting():
    """An inner scope(True) must NOT re-enable w8a8 inside an outer
    scope(False) trace — mirrors pallas_dequant_scope semantics (ADVICE r4)."""
    with quant.w8a8_scope(False):
        with quant.w8a8_scope(True):
            assert not quant._w8a8_allowed()
        assert not quant._w8a8_allowed()
    # plain nesting still enables
    with quant.w8a8_scope(True):
        with quant.w8a8_scope(True):
            assert quant._w8a8_allowed()
    assert not quant._w8a8_allowed()


def test_w8a8_int_dot_is_exact_for_integer_activations():
    """Activations already on the int8 grid survive w8a8 exactly: the int32
    accumulation is exact, so the only error source is activation rounding."""
    rs = np.random.RandomState(8)
    xi = rs.randint(-127, 128, (3, 128)).astype(np.float32)
    w = jnp.asarray(rs.randn(128, 256).astype(np.float32) * 0.05)
    q = quant.quantize_linear(w)
    deq = np.asarray(q["q8"], np.float32) * np.asarray(q["scale"])[None, :]
    # per-row absmax 127 -> x_scale = 1 -> xq == xi exactly
    for row in xi:
        row[np.argmax(np.abs(row))] = 127.0
    x = jnp.asarray(xi)
    with quant.w8a8_scope(True):
        out = np.asarray(quant.mm(x, q), np.float32)
    ref = xi @ deq
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-4)


def test_w8a8_vmap_folds_batch_into_rows():
    """The custom_vmap row-folding rule applies under w8a8 too: one int8
    dot over the weights per projection, not B."""
    rs = np.random.RandomState(9)
    x = jnp.asarray(rs.randn(5, 2, 256).astype(np.float32))
    w = jnp.asarray(rs.randn(256, 512).astype(np.float32) * 0.05)
    q = quant.quantize_linear(w)

    with quant.w8a8_scope(True):
        batched = jax.vmap(lambda xi: quant.mm(xi, q))(x)
        jaxpr = jax.make_jaxpr(jax.vmap(lambda xi: quant.mm(xi, q)))(x)
    with quant.w8a8_scope(True):
        for i in range(5):
            np.testing.assert_allclose(
                np.asarray(batched[i]), np.asarray(quant.mm(x[i], q)),
                rtol=1e-5, atol=1e-6,
            )
    dots = str(jaxpr).count("dot_general")
    assert dots == 1, f"expected one folded int8 dot, got {dots}"
    assert "preferred_element_type=int32" in str(jaxpr)


def test_w8a8_batched_generation_runs_and_is_deterministic():
    """synthesize_batch under int8_activations=True: runs, deterministic,
    and the flag is rejected without quantize_int8."""
    import pytest

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
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(11), 3)
    args = (
        W.init_talker_params(k1, tp.TINY_TALKER, jnp.float32),
        W.init_code_predictor_params(k2, tp.TINY_CP, jnp.float32),
        vocoder.init_vocoder_params(k3, tp.TINY_VOC),
        tp.FakeTokenizer(),
    )
    with pytest.raises(ValueError):
        Qwen3TTS(cfg, *args, vocoder_config=tp.TINY_VOC, int8_activations=True)
    model = Qwen3TTS(
        cfg, *args, vocoder_config=tp.TINY_VOC,
        quantize_int8=True, int8_activations=True,
    )
    assert model.w8a8
    texts = ["one two", "three four five"]
    a1 = model.synthesize_batch(texts, "ryan", "english", tp.OPTS)
    a2 = model.synthesize_batch(texts, "ryan", "english", tp.OPTS)
    assert all(len(a.samples) > 0 for a in a1)
    for b1, b2 in zip(a1, a2):
        np.testing.assert_array_equal(b1.samples, b2.samples)
