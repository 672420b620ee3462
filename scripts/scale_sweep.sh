#!/usr/bin/env bash
# Whole-inventory scale-evidence ritual — regenerates the k× scale
# artifacts in one command instead of a hand-run sequence:
#   1. ScaleGen : synthesize a k× replica of the base SF dir
#   2. Verify + check.py --json : the full DuckDB oracle gate at k×
#      -> CORRECTNESS_<label>.json (driver-format, committed evidence)
#   3. Bench at the base SF and at the k× SF
#   4. scale_ratio.py : per-query ratios + super-linear suspects
#      -> SCALE_<label>.json
# Artifacts land in the repo root; commit them with the round.
#
# Usage: scripts/scale_sweep.sh [src_sf_dir] [k] [label]
#   defaults: /root/testdata/sf0.1  10  SF1
# Env: WORK (scratch dir, default /tmp/scale_sweep_<label>)
set -euo pipefail
cd "$(dirname "$0")/.."

SRC=${1:-/root/testdata/sf0.1}
K=${2:-10}
LABEL=${3:-SF1}
WORK=${WORK:-/tmp/scale_sweep_${LABEL}}
mkdir -p "$WORK"

# Pre-flight: DuckDB 1.0's bundled jemalloc retains tens of thousands
# of memory mappings mid-query on the heavy k-times oracles; at the
# Linux default vm.max_map_count=65530 tiny mmaps start failing and
# queries die with a bogus "Out of Memory" (measured round 10:
# q_dedup_apply alone spikes past 65k mappings at sf1, completes with
# ~3k once the ceiling is raised). Best-effort — needs root.
MAPS=$(cat /proc/sys/vm/max_map_count 2>/dev/null || echo 0)
if [ "$MAPS" -lt 262144 ]; then
  sysctl -w vm.max_map_count=1048576 2>/dev/null \
    || echo "WARN: vm.max_map_count=$MAPS is low and could not be raised;" \
            "heavy oracles may fail with spurious OOM"
fi

echo "== [1/4] ScaleGen k=$K from $SRC -> $WORK/data =="
sbt -batch "runMain graft.ScaleGen $SRC $WORK/data $K"

echo "== [2/4] Verify + DuckDB oracle gate at k=$K =="
sbt -batch "runMain graft.Verify $WORK/data $WORK/verify"
python3 scripts/check.py "$WORK/verify" "$WORK/data" \
  --json "CORRECTNESS_${LABEL}.json"

echo "== [3/4] Bench: base leg ($SRC) then k leg =="
SPARK_GRAFT_SF_DIR=$SRC sbt -batch "runMain graft.Bench" | tail -1
cp BENCH_LAST.json "$WORK/bench_base.json"
SPARK_GRAFT_SF_DIR=$WORK/data sbt -batch "runMain graft.Bench" | tail -1
cp BENCH_LAST.json "$WORK/bench_k.json"
# leave the repo's BENCH_LAST.json reflecting the STANDARD sf — the k
# leg lives in SCALE_<label>.json
cp "$WORK/bench_base.json" BENCH_LAST.json

echo "== [4/4] scale ratios =="
python3 scripts/scale_ratio.py "$WORK/bench_base.json" \
  "$WORK/bench_k.json" "$K" "SCALE_${LABEL}.json"

echo "Artifacts written: CORRECTNESS_${LABEL}.json SCALE_${LABEL}.json"
echo "Commit them with the round snapshot."
