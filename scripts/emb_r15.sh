#!/usr/bin/env bash
# Round-15 scale legs (VERDICT r14 #1/#2/#6):
#  A. SALT_SKEW.json re-run post coarse-lever/adaptive-salts — the
#     skew win must be untouched (the 800k leg sits above
#     HierSaltMinRows, and coarseFor(8192)=256 = the r14 constant) —
#     plus the AQE-advisory leg (#6b): salted shape with
#     advisoryPartitionSizeInBytes lowered to 1 MB; if the residual
#     max/p50 ~ 2.5x is AQE coalescing (benign) it drops toward 1.
#  B. SALT_TIGHT.json — the non-tie regime (#6a): a tight-but-not-
#     identical hot cluster (cos ~ 0.97) must self-split via
#     density-proportional coarse sampling, no single-task pathology
#     in EITHER leg.
#  C. EmbDouble 4.992M -> 9.984M (copy index 1250, offset 2^41).
#  D. SemProfile at 4.992M (K=262144) under the sqrt(K) lever
#     (coarse 256 -> 512): the same-data re-point for the ratio pair.
#  E. SemProfile at 9.984M (K=524288, coarse=724): the r14 model
#     predicted 3.33x for 2x (N,K) at fixed coarse (measured 3.76x);
#     with coarse ~ sqrt(K) the dots term is N*2*sqrt(K), predicting
#     ~2.83x for the assign stage and closer to ~2x for the linear
#     pair/agg stages.
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
  echo "== [0a] ScaleGen embeddings k=1248 (replica corpus absent) =="
  sbt -batch "runMain graft.ScaleGen /root/testdata/sf0.1 /tmp/scale_sim1248 1248 embeddings"
fi
if [ ! -e /tmp/scale_sim4992/embeddings.parquet ]; then
  echo "== [0b] EmbDouble 2.496M -> 4.992M =="
  sbt -batch "runMain graft.EmbDouble /tmp/scale_sim1248 /tmp/scale_sim4992"
fi
if [ ! -e /tmp/scale_sim9984/embeddings.parquet ]; then
  echo "== [0c] EmbDouble 4.992M -> 9.984M (idx 1250, offset 2^41) =="
  sbt -batch "runMain graft.EmbDouble /tmp/scale_sim4992 /tmp/scale_sim9984 1250 41"
fi

echo "== [1/4] SaltProfile tie-regime re-run + advisory leg =="
quiet; cold
sbt -batch "runMain graft.SaltProfile 800000 8192 50 SALT_SKEW.json tie 1024" \
  2>&1 | tee /tmp/saltprof_r15.log | grep '\[salt\]'

echo "== [2/4] SaltProfile tight-cluster (non-tie) regime =="
quiet; cold
sbt -batch "runMain graft.SaltProfile 800000 8192 50 SALT_TIGHT.json tight 0" \
  2>&1 | tee /tmp/salttight_r15.log | grep '\[salt\]'

echo "== [3/4] SemProfile at 4.992M: K=262144 under coarse=512 =="
quiet; cold
sbt -batch "runMain graft.SemProfile /tmp/scale_sim4992" \
  2>&1 | tee /tmp/semprof_4992_r15.log | grep '\[prof\]'

echo "== [4/4] SemProfile at 9.984M: K=524288, coarse=724 =="
quiet; cold
sbt -batch "runMain graft.SemProfile /tmp/scale_sim9984" \
  2>&1 | tee /tmp/semprof_9984_r15.log | grep '\[prof\]'

echo "DONE_EMB_R15"
