"""CLI end-to-end flows with a tiny model (monkeypatched loader)."""

import json

import numpy as np
import pytest

import tests.test_pipeline as tp
from qwen3_tts_tpu import cli


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
