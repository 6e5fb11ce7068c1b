"""Fusion-regression budget: the hot paths stay single-program, host-free
(scripts/count_programs.py; reference equivalent: scripts/count-kernels.sh)."""

import pytest

pytestmark = pytest.mark.slow  # heavy integration tier; `make test-fast` skips


def test_program_budgets():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import count_programs as cp

    report = cp.compile_and_count()
    errors = cp.check(report)
    assert not errors, errors
    # The whole frame loop is ONE executable with ONE top-level while.
    assert report["frame_loop"]["while_ops"] >= 1
    assert report["frame_loop"]["infeed_outfeed"] == 0
    assert report["chunk_exact"]["host_callbacks"] == 0
