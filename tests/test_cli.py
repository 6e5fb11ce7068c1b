"""CLI argument cross-validation tests (generate_audio.rs:162-211 matrix)."""

import pytest

from qwen3_tts_tpu.cli import build_parser, validate_args


def parse(argv):
    return build_parser().parse_args(["--model-dir", "/tmp/x", *argv])


def test_instruct_and_ref_audio_exclusive():
    with pytest.raises(SystemExit):
        validate_args(parse(["--instruct", "deep voice", "--ref-audio", "a.wav"]))


def test_ref_text_requires_ref_audio():
    with pytest.raises(SystemExit):
        validate_args(parse(["--ref-text", "hello"]))


def test_x_vector_only_requires_ref_audio():
    with pytest.raises(SystemExit):
        validate_args(parse(["--x-vector-only"]))


def test_x_vector_only_excludes_ref_text():
    with pytest.raises(SystemExit):
        validate_args(parse(["--x-vector-only", "--ref-audio", "a.wav", "--ref-text", "t"]))


def test_valid_combinations_pass():
    validate_args(parse([]))
    validate_args(parse(["--instruct", "a voice"]))
    validate_args(parse(["--ref-audio", "a.wav"]))
    validate_args(parse(["--ref-audio", "a.wav", "--ref-text", "t"]))
    validate_args(parse(["--ref-audio", "a.wav", "--x-vector-only"]))
    validate_args(parse(["--streaming", "--chunk-frames", "5"]))


def test_duration_overrides_frames():
    args = parse(["--duration", "4.0", "--frames", "999"])
    assert int(args.duration * 12.5) == 50
