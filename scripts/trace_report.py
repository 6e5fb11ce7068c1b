#!/usr/bin/env python
"""Aggregate per-op device time from a jax.profiler trace (xplane).

TPU analogue of reading an nsys/Chrome trace in the reference workflow
(reference: scripts/count-kernels.sh reads launch counts from a CUDA
trace): parse the .xplane.pb written by ``profiling.trace`` / CLI
``--profile``, pick the TPU device plane, and aggregate event durations by
op name. Within a jitted while_loop every iteration's ops appear as
separate device events, so steady-state per-frame cost = total / frames.

Usage:
  python scripts/trace_report.py TRACE_DIR [--top 40] [--frames N]
      [--line-filter "XLA Ops"]

With --frames N, also prints per-frame ms for each op group.
"""

from __future__ import annotations

import argparse
import collections
import gzip
import sys
from pathlib import Path


def load_xspaces(trace_dir: Path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(trace_dir.glob("**/*.xplane.pb"))
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    spaces = []
    for p in paths:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(p.read_bytes())
        spaces.append((p, xs))
    return spaces


def aggregate(xs, line_filter: str | None):
    """Return {plane_name: {(line_name, event_name): [total_ps, count]}}."""
    out = {}
    for plane in xs.planes:
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        agg = collections.defaultdict(lambda: [0, 0])
        for line in plane.lines:
            if line_filter and line_filter not in line.name:
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                a = agg[(line.name, name)]
                a[0] += ev.duration_ps
                a[1] += 1
        if agg:
            out[plane.name] = agg
    return out


GROUPS = (
    ("pallas/mosaic", ("tpu_custom_call", "custom-call", "mosaic")),
    ("fusion", ("fusion",)),
    ("dynamic-update", ("dynamic-update-slice",)),
    ("copy/transpose", ("copy", "transpose")),
    ("convolution/dot", ("convolution", "dot")),
)


def classify(name: str) -> str:
    low = name.lower()
    for label, keys in GROUPS:
        if any(k in low for k in keys):
            return label
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir", type=Path)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--line-filter", default=None)
    ap.add_argument("--plane-filter", default="TPU")
    args = ap.parse_args()

    for path, xs in load_xspaces(args.trace_dir):
        per_plane = aggregate(xs, args.line_filter)
        for plane, agg in per_plane.items():
            if args.plane_filter and args.plane_filter not in plane:
                continue
            print(f"\n=== {plane}  ({path.name}) ===")
            rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
            total_ms = sum(v[0] for v in agg.values()) / 1e9
            print(f"{'total device time':<64} {total_ms:10.3f} ms")
            by_group = collections.defaultdict(float)
            for (line, name), (ps, cnt) in rows:
                by_group[classify(name)] += ps / 1e9
            for g, ms in sorted(by_group.items(), key=lambda kv: -kv[1]):
                line = f"  [{g}]"
                extra = f"  ({ms / args.frames:.4f} ms/frame)" if args.frames else ""
                print(f"{line:<64} {ms:10.3f} ms{extra}")
            print(f"\ntop {args.top} ops:")
            for (line, name), (ps, cnt) in rows[: args.top]:
                ms = ps / 1e9
                extra = f"  {ms / args.frames:8.4f} ms/frame" if args.frames else ""
                print(f"  {ms:10.3f} ms  x{cnt:<6} {name[:90]}{extra}")


if __name__ == "__main__":
    main()
