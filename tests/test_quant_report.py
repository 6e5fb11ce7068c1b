"""int8 quality-guardrail report machinery (scripts/quant_report.py).

Random tiny weights give near-uniform logits, so flip rates are HIGH by
construction here — the test checks the report's mechanics and metrics
plumbing, not the promote decision (that is for real checkpoints via
``make parity``)."""

import json
import subprocess
import sys
from pathlib import Path
import pytest

pytestmark = pytest.mark.slow  # heavy integration tier; `make test-fast` skips


REPO = Path(__file__).resolve().parent.parent


def test_quant_report_tiny(tmp_path):
    out = tmp_path / "report.json"
    res = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "quant_report.py"),
         "--variant", "tiny", "--steps", "4", "--out", str(out)],
        capture_output=True, text=True, timeout=560,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    report = json.loads(out.read_text())
    assert report["source"] == "synthetic:tiny"
    # int8 absmax quantization lands near the theoretical ~44 dB SNR on
    # gaussian weights; far lower would mean a scaling bug.
    for sec in ("talker_weight_snr", "cp_weight_snr"):
        assert report[sec], sec
        for key, stats in report[sec].items():
            assert stats["min_db"] > 35.0, (sec, key, stats)
    for sec in ("logit_drift", "logit_drift_w8a8"):
        drift = report[sec]
        assert 0.0 <= drift["talker_argmax_flip_rate"] <= 1.0, sec
        assert 0.0 <= drift["cp_code_flip_rate"] <= 1.0, sec
        assert drift["mean_logit_kl"] >= 0.0, sec
    assert isinstance(report["promote_int8"], bool)
