#!/usr/bin/env bash
# Round-12 embeddings-spine leg at the replication ceiling: k=1248
# (2.496M vectors), per VERDICT r11 #1. Cold-leg methodology (memory:
# scale-sweep-ops): wipe stage roots + drop page caches before each
# leg so stages_sec measures a build, not a pointer lookup.
set -euo pipefail
cd "$(dirname "$0")/.."

cold() {
  rm -rf /tmp/graft-stages-*
  sync
  echo 3 > /proc/sys/vm/drop_caches 2>/dev/null \
    || echo "WARN: drop_caches unavailable (not real root) — legs run page-warm but symmetric"
}

echo "== [1/4] ScaleGen embeddings k=1248 =="
sbt -batch "runMain graft.ScaleGen /root/testdata/sf0.1 /tmp/scale_sim1248 1248 embeddings"

echo "== [2/4] base sim leg (sf0.1, cold) =="
cold
sbt -batch "runMain graft.SpineSweep /root/testdata/sf0.1 /tmp/spine_base_sim.json sim"

echo "== [3/4] k=1248 sim leg (2.496M vectors, cold) =="
cold
sbt -batch "runMain graft.SpineSweep /tmp/scale_sim1248 /tmp/spine_k1248_sim.json sim"

echo "== [4/4] ratios -> SCALE_EMB1248.json =="
python3 scripts/spine_ratio.py /tmp/spine_base_sim.json \
  /tmp/spine_k1248_sim.json 1248 SCALE_EMB1248.json
echo "DONE_EMB1248"
