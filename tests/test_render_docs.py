"""Docs must agree with the benchmark artifacts (VERDICT r3 weak #1).

Every published number in README.md / docs/BENCHMARKS.md / docs/STATUS.md
lives inside a ``rendered:*`` block that scripts/render_bench_docs.py
writes from the checked-in JSON artifacts. This test re-renders in check
mode: if a doc was hand-edited or an artifact refreshed without running
``make render-docs``, it fails — drift is structurally impossible.
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_docs_match_artifacts():
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "render_bench_docs.py"), "--check"],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, (
        f"docs out of date vs artifacts:\n{proc.stdout}\n{proc.stderr}\n"
        "run: make render-docs"
    )


def test_all_rendered_blocks_known():
    """Marker names in the docs must map to renderers (typo guard)."""
    import re

    sys.path.insert(0, str(REPO / "scripts"))
    import render_bench_docs as R

    for doc in R.DOCS:
        text = (REPO / doc).read_text()
        for m in re.finditer(r"<!-- rendered:([a-z0-9-]+) begin", text):
            assert m.group(1) in R.BLOCKS, f"{doc}: unknown block {m.group(1)}"
        begins = re.findall(r"<!-- rendered:([a-z0-9-]+) begin", text)
        ends = re.findall(r"<!-- rendered:([a-z0-9-]+) end", text)
        assert begins == ends, f"{doc}: unbalanced rendered markers"
