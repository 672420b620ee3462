#!/bin/sh
# Round-start ritual: stage every driver-written round artifact so a
# round can never end with them untracked (the r6/r7/r8 recurring
# verdict chore). Run from anywhere; commits only if something changed.
set -e
cd "$(dirname "$0")/.."
git add -- BENCH_r*.json CORRECTNESS_r*.json BENCH_LAST.json \
  LEAKCHECK.json COPYCHECK.json VERDICT.md ADVICE.md PROGRESS.jsonl \
  2>/dev/null || true
if git diff --cached --quiet; then
  echo "artifacts already committed"
else
  git commit -m "Record round gate artifacts

No-Verification-Needed: driver-generated JSON/markdown ledger only"
fi
