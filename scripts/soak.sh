#!/usr/bin/env bash
# Fuzz + churn soak — the repo's analog of the reference's CI fuzz job
# (reference: .github/workflows/fuzzer.yml:23-25 — 5 minutes per push).
#
# Three concurrent fuzzers on the CPU backend (the TPU stays free):
#   1. the reference op mix (add/del/build/assert_validity), euclidean
#   2. persistence churn: file-backed db, reload-from-disk every 3 commits
#   3. multi-index churn: 3 sub-indexes, drop/recreate mid-stream, BQ metric
#
# Usage: scripts/soak.sh [seconds-per-fuzzer]   (default 300 = the CI budget)
set -euo pipefail
cd "$(dirname "$0")/.."

SECONDS_BUDGET="${1:-300}"
export JAX_PLATFORMS=cpu
export PALLAS_AXON_POOL_IPS=
export XLA_FLAGS="--xla_force_host_platform_device_count=1"
LOG_DIR="${SOAK_LOG_DIR:-/tmp/arroy_soak}"
mkdir -p "$LOG_DIR"
# the persistence fuzzer's oracle starts empty — so must its database
rm -rf "$LOG_DIR/db_persist"
SEED="${SOAK_SEED:-$RANDOM}"
echo "soak: ${SECONDS_BUDGET}s per fuzzer, seed base ${SEED}, logs in ${LOG_DIR}"

python -m arroy_tpu.cli.fuzz --seconds "$SECONDS_BUDGET" --seed "$SEED" \
    >"$LOG_DIR/basic.log" 2>&1 &
P1=$!
python -m arroy_tpu.cli.fuzz --seconds "$SECONDS_BUDGET" --seed "$((SEED + 1))" \
    --path "$LOG_DIR/db_persist" --reload-every 3 --id-space 64 \
    >"$LOG_DIR/persist.log" 2>&1 &
P2=$!
python -m arroy_tpu.cli.fuzz --seconds "$SECONDS_BUDGET" --seed "$((SEED + 2))" \
    --indexes 3 --drop-prob 0.15 --distance "binary quantized euclidean" \
    --dims 16 --distinct-vectors 8 \
    >"$LOG_DIR/multiindex.log" 2>&1 &
P3=$!

RC=0
wait $P1 || { echo "FAIL: basic fuzzer"; RC=1; }
wait $P2 || { echo "FAIL: persistence fuzzer"; RC=1; }
wait $P3 || { echo "FAIL: multi-index fuzzer"; RC=1; }

for f in basic persist multiindex; do
    echo "--- $f ---"
    tail -n 2 "$LOG_DIR/$f.log"
done
if [ "$RC" -ne 0 ]; then
    echo "soak FAILED — full logs in $LOG_DIR"
    exit "$RC"
fi
echo "soak PASSED (${SECONDS_BUDGET}s x 3 fuzzers, no invariant violations)"
