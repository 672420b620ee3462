#!/usr/bin/env bash
# Round-14 scale legs (VERDICT r13 #1/#2/#5):
#  A. SALT_SKEW.json — per-task balance of the SALTED two-level fine
#     pass on a deterministic clustered corpus (SaltProfile): the
#     unsalted r13 shape concentrates a hot coarse cell in one task;
#     the salted default must split it ~HierFineSalts ways with
#     bit-identical results.
#  B. K=262144 doubling — SemProfile on a 4.992M-vector corpus
#     (EmbDouble of the r12/r13 2.496M replica), one doubling past the
#     r13 two-level point: expect occupancy ~19 and wall ~2x the
#     33.8 s K=131072 point.
#  C. PqProfile at the 2.496M corpus — attribute q_pq_search's 11.6 s
#     residual (encode vs LUT-join vs rollup).
# Cold-leg + quiet-window methodology per SCALE.md.
set -euo pipefail
cd "$(dirname "$0")/.."

cold() {
  rm -rf /tmp/graft-stages-*
  sync
  echo 3 > /proc/sys/vm/drop_caches 2>/dev/null \
    || echo "WARN: drop_caches unavailable (not real root) — legs run page-warm but symmetric"
}

quiet() {
  while :; do
    if awk '{exit !($1 < 1.5)}' /proc/loadavg \
        && ! pgrep -f 'sbt\.script|sbt-args|sbt-launch' > /dev/null; then
      sleep 120
      if awk '{exit !($1 < 1.5)}' /proc/loadavg; then break; fi
    fi
    echo "[quiet] load $(cut -d' ' -f1 /proc/loadavg) — waiting 240s"
    sleep 240
  done
  echo "[quiet] load $(cut -d' ' -f1 /proc/loadavg) — go"
}

if [ ! -f /tmp/scale_sim1248/embeddings.parquet ]; then
  echo "== [0a/5] ScaleGen embeddings k=1248 (replica corpus absent) =="
  sbt -batch "runMain graft.ScaleGen /root/testdata/sf0.1 /tmp/scale_sim1248 1248 embeddings"
fi
if [ ! -e /tmp/scale_sim4992/embeddings.parquet ]; then
  echo "== [0b/5] EmbDouble 2.496M -> 4.992M =="
  sbt -batch "runMain graft.EmbDouble /tmp/scale_sim1248 /tmp/scale_sim4992"
fi

echo "== [1/3] SaltProfile: hot-cell balance, salts=1 vs default =="
quiet; cold
sbt -batch "runMain graft.SaltProfile 800000 8192 50 SALT_SKEW.json" \
  2>&1 | tee /tmp/saltprof.log | grep '\[salt\]'

echo "== [2/3] SemProfile at 4.992M: adaptive K=262144 (two-level) =="
quiet; cold
sbt -batch "runMain graft.SemProfile /tmp/scale_sim4992" \
  2>&1 | tee /tmp/semprof_4992.log | grep '\[prof\]'

echo "== [3/3] PqProfile at 2.496M =="
quiet; cold
sbt -batch "runMain graft.PqProfile /tmp/scale_sim1248" \
  2>&1 | tee /tmp/pqprof_1248.log | grep '\[prof\]'

echo "DONE_EMB_R14"
