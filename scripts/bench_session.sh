#!/usr/bin/env bash
# One clean benchmark session: every published artifact, measured
# sequentially by one driver on one TPU chip (one process at a time — the
# axon tunnel wedges under contention). README/BENCHMARKS/STATUS tables are
# rendered from these JSONs by scripts/render_bench_docs.py; re-running this
# script then `make render-docs` is the whole "refresh all published
# numbers" workflow. Keep the host otherwise idle: the tunnel-dispatch
# phases are CPU-contention-sensitive.
#
# Usage: scripts/bench_session.sh [logdir]   (default /tmp/bench_session)
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/bench_session}
mkdir -p "$LOG"

run() { # run <name> <cmd...>
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$LOG/session.log"
  if "$@" >"$LOG/$name.log" 2>&1; then
    echo "    OK ($(date +%H:%M:%S))" | tee -a "$LOG/session.log"
  else
    echo "    FAIL rc=$? — see $LOG/$name.log" | tee -a "$LOG/session.log"
  fi
}

P=python

# Headline e2e corpus benches (pipelined RTF + TTFA, round-robin corpus)
run e2e_1p7b       $P benches/e2e_bench.py --size 1.7B --json BENCH_e2e_1p7b.json
run e2e_1p7b_int8  $P benches/e2e_bench.py --size 1.7B --int8 --json BENCH_e2e_1p7b_int8.json
run e2e_0p6b       $P benches/e2e_bench.py --size 0.6B --json BENCH_e2e_0p6b.json
run e2e_0p6b_int8  $P benches/e2e_bench.py --size 0.6B --int8 --json BENCH_e2e_0p6b_int8.json

# Batched serving throughput
run batch_bf16     $P benches/batch_bench.py --size 1.7B --json BENCH_batch_1p7b.json
run batch_int8     $P benches/batch_bench.py --size 1.7B --int8 --json BENCH_batch_1p7b_int8.json
run batch_w8a8     $P benches/batch_bench.py --size 1.7B --int8 --w8a8 --json BENCH_batch_1p7b_int8_w8a8.json
run stream_batch   $P benches/stream_batch_bench.py --size 1.7B --json BENCH_stream_batch_1p7b.json
run stream_b_int8  $P benches/stream_batch_bench.py --size 1.7B --int8 --json BENCH_stream_batch_1p7b_int8.json
run clone_batch    $P benches/clone_batch_bench.py --size 1.7B --int8 --json BENCH_clone_batch_1p7b_int8.json

# Same-session A/B harnesses
run icl_ab         $P benches/icl_ab.py --size 1.7B --json BENCH_icl_ab_1p7b.json
run w8a8_ab        $P benches/w8a8_ab.py --size 1.7B --json BENCH_w8a8_ab_1p7b.json
run vocoder_ab     $P benches/vocoder_ab.py --size 1.7B --json BENCH_vocoder_ab_1p7b.json

# Decompositions / roofline
run ttfa_decomp    $P benches/ttfa_decompose.py --size 1.7B --int8 --json BENCH_ttfa_decompose_1p7b_int8.json
run frame_int8     $P benches/frame_decompose.py --size 1.7B --json BENCH_frame_decompose_1p7b_int8.json
run frame_bf16     $P benches/frame_decompose.py --size 1.7B --no-int8 --json BENCH_frame_decompose_1p7b_bf16.json

echo "=== session done ($(date +%H:%M:%S)); render with: make render-docs" | tee -a "$LOG/session.log"
