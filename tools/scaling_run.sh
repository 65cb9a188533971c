#!/usr/bin/env bash
# Cross-SF scaling protocol (the SURVEY §6 measurement, persisted):
# run the FULL interleaved min-of-3 bench at sf0.01 and sf0.1 on the
# same machine back to back, then merge into a per-query ratio
# artifact. Usage:
#     tools/scaling_run.sh SCALING_r10.json
# sbt runs are sequential by construction — never run two sbt
# commands concurrently (server socket collision).
set -euo pipefail
out=${1:?usage: scaling_run.sh <out.json>}
tmp=$(mktemp -d)
trap 'rm -rf "$tmp"' EXIT
for sf in 0.01 0.1; do
  echo "[scaling] bench at sf$sf ..." >&2
  SPARK_GRAFT_SF_DIR=/root/testdata/sf$sf sbt -batch "runMain graft.Bench" \
    2>/dev/null | grep '^{' > "$tmp/sf$sf.json"
done
python3 "$(dirname "$0")/scaling_merge.py" "$tmp/sf0.01.json" "$tmp/sf0.1.json" > "$out"
# keep the raw per-SF bench lines next to the merged artifact: the
# sf0.1 line doubles as the round's BENCH_local (bench_compare input)
# without a second 30-minute bench run
cp "$tmp/sf0.1.json" "${out%.json}_raw_sf0.1.json"
cp "$tmp/sf0.01.json" "${out%.json}_raw_sf0.01.json"
echo "[scaling] wrote $out (+ raw per-SF lines)" >&2
