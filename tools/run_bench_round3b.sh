#!/bin/bash
# Round-3 second sweep: the rows touched since the last publish — beam after
# the shared-cross-KV change, scenario5 after the separator retrain, the
# turbo/stream rows missing from the refreshed artifact (re-run under the
# consistent wall/audio metric), and the pre-quantized-checkpoint setup A/B.
# SERIALIZED on a quiet machine (concurrent CPU load skews the tunneled-TPU
# numbers 2-3x). Writes one-line JSONs under $1 for tools/publish_bench.py.
set -u
DIR="${1:-/tmp/bench_r3}"
mkdir -p "$DIR"
cd "$(dirname "$0")/.."

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S))" >&2
  timeout 2400 env "$@" python bench.py 2>"$DIR/$name.err" | tail -1 > "$DIR/$name.json"
  if [ ! -s "$DIR/$name.json" ]; then
    echo "--- $name FAILED; retrying once" >&2
    timeout 2400 env "$@" python bench.py 2>>"$DIR/$name.err" | tail -1 > "$DIR/$name.json"
  fi
  cat "$DIR/$name.json" >&2
}

run headline_beam5     BENCH_BEAM=5
run scenario5          BENCH_SCENARIO=5
run headline_turbo     BENCH_MODEL=large-v3-turbo
run streams2           BENCH_STREAMS=2
run streams4           BENCH_STREAMS=4
run streams4_mixedlang BENCH_STREAMS=4 BENCH_STREAM_LANGS=en,zh
run streams8           BENCH_STREAMS=8
run headline_int8all_prequant BENCH_QUANT=int8-all BENCH_CHECKPOINT=/tmp/prequant_lv3
echo "sweep complete: $DIR" >&2
