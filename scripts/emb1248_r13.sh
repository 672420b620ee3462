#!/usr/bin/env bash
# Round-13 embeddings-spine refresh: the two-level (coarse→fine)
# assignment past the old K=65536 flat-kernel cap (VERDICT r12 #1)
# plus the SemProfile stage decomposition of q_semdedup's big leg
# (VERDICT r12 #2), A/B'd against the old capped K at the same corpus.
# Re-uses the round-12 replica corpora (ScaleGen output is
# deterministic). Cold-leg + quiet-window methodology per SCALE.md:
# legs launch only when the 1-min load is < 1.5 (co-tenant load waves
# inflate walls 1.5-2x with bit-identical rows).
set -euo pipefail
cd "$(dirname "$0")/.."

cold() {
  rm -rf /tmp/graft-stages-*
  sync
  echo 3 > /proc/sys/vm/drop_caches 2>/dev/null \
    || echo "WARN: drop_caches unavailable (not real root) — legs run page-warm but symmetric"
}

quiet() {
  # two low samples 120s apart + no foreign JVM: a momentary dip
  # between a co-tenant wave (or a concurrent sbt suite's phases) must
  # not launch a timed leg into the next crest — the round-13 lesson
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
  echo "== [0/5] ScaleGen embeddings k=1248 (replica corpus absent) =="
  sbt -batch "runMain graft.ScaleGen /root/testdata/sf0.1 /tmp/scale_sim1248 1248 embeddings"
fi

echo "== [1/5] SemProfile A/B at 2.496M: flat K=65536 (the old cap) =="
quiet; cold
sbt -batch "runMain graft.SemProfile /tmp/scale_sim1248 65536" 2>&1 | tee /tmp/semprof_flat.log | grep '\[prof\]'

echo "== [2/5] SemProfile at 2.496M: adaptive K=131072 (two-level) =="
quiet; cold
sbt -batch "runMain graft.SemProfile /tmp/scale_sim1248" 2>&1 | tee /tmp/semprof_hier.log | grep '\[prof\]'

echo "== [3/5] base sim leg (sf0.1, cold) =="
quiet; cold
sbt -batch "runMain graft.SpineSweep /root/testdata/sf0.1 /tmp/spine_base_sim.json sim"

echo "== [4/5] k=1248 sim leg (2.496M vectors, two-level, cold) =="
quiet; cold
sbt -batch "runMain graft.SpineSweep /tmp/scale_sim1248 /tmp/spine_k1248_sim.json sim"

echo "== [5/5] ratios -> SCALE_EMB1248.json =="
python3 scripts/spine_ratio.py /tmp/spine_base_sim.json \
  /tmp/spine_k1248_sim.json 1248 SCALE_EMB1248.json
echo "DONE_EMB1248_R13"
