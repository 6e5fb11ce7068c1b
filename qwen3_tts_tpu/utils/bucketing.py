"""Static-shape bucketing helpers.

XLA compiles one program per distinct shape; bucketing dynamic lengths to a
small set of sizes bounds compilations while padding stays exact thanks to
causal masking / causal convs.
"""

from __future__ import annotations


def next_bucket(n: int, multiple: int = 32, buckets: tuple[int, ...] | None = None) -> int:
    """Smallest bucket >= n: from an explicit bucket list, or the next
    multiple of ``multiple``."""
    if buckets is not None:
        for b in buckets:
            if n <= b:
                return b
        return buckets[-1]
    return max(((n + multiple - 1) // multiple) * multiple, multiple)
