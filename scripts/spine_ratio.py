#!/usr/bin/env python3
"""Merge graft.SpineSweep legs into the committed dedup/text-spine
scale artifact: per-query wall-time and OUTPUT-ROW ratios between a
base leg and a k-times leg.

Usage: python3 scripts/spine_ratio.py <base.json> <k.json> <k> <out.json>

Row counts are the load-bearing check: ScaleGen replicates with
constant dup density, so every spine output must grow ~linearly in k.
A super-linear row ratio (> k * ROW_SLACK) is the all-pairs blowup the
banded/bucketed designs exist to prevent and fails the script (exit 1).
Time ratios are reported, and flagged as suspects past k * TIME_SLACK
when the k-leg time is material (>1s) — single-sample wall times on a
shared box are noise, so time suspects are advisory, row suspects are
errors.

A k-leg entry may carry its own "row_slack" (written by SpineSweep,
which knows each entry's envelope): a number replaces ROW_SLACK (e.g.
2.0 for the power-of-two occupancy sawtooth on candidate-pair counts);
null skips the row gate for entries whose output is threshold-filtered
truth rather than candidate structure (ground-truth pair counts above
a bulk-tail cosine threshold are quadratic in ANY plan — SCALE.md) —
skipped entries are reported with row_gate "truth-driven" so the
exemption is visible in the artifact, never silent.
"""
import json
import sys

ROW_SLACK = 1.3
TIME_SLACK = 1.6


def main(base_path, k_path, k, out_path):
    base = json.load(open(base_path))
    big = json.load(open(k_path))
    k = float(k)
    rows = {}
    row_suspects = []
    time_suspects = []
    for name, b in sorted(base["queries"].items()):
        g = big["queries"].get(name)
        if g is None:
            continue
        time_ratio = round(g["sec"] / b["sec"], 2) if b["sec"] > 0 else None
        row_ratio = round(g["rows"] / b["rows"], 2) if b["rows"] > 0 else None
        slack = g.get("row_slack", ROW_SLACK)
        rows[name] = {
            "base_sec": b["sec"], "k_sec": g["sec"], "time_ratio": time_ratio,
            "base_rows": b["rows"], "k_rows": g["rows"],
            "row_ratio": row_ratio,
        }
        if g["rows"] < 0 or b["rows"] < 0:
            row_suspects.append(name + " (leg failed)")
        elif slack is None:
            rows[name]["row_gate"] = "truth-driven"
        elif row_ratio is not None and row_ratio > k * slack:
            row_suspects.append(name)
        if slack is not None and slack != ROW_SLACK:
            rows[name]["row_slack"] = slack
        if (time_ratio is not None and time_ratio > k * TIME_SLACK
                and g["sec"] > 1.0):
            time_suspects.append(name)
    out = {
        "k": k,
        "base_docs": base.get("docs"),
        "k_docs": big.get("docs"),
        "base_stages_sec": base.get("stages_sec"),
        "k_stages_sec": big.get("stages_sec"),
        "base_total_sec": base.get("total_sec"),
        "k_total_sec": big.get("total_sec"),
        "total_time_ratio": round(big["total_sec"] / base["total_sec"], 2)
            if base.get("total_sec") else None,
        # pre-run 1-min load of each leg (-1: platform doesn't report;
        # absent: leg predates the field) — time ratios from a
        # contended box are attributable from the artifact alone
        "base_load_avg": base.get("load_avg"),
        "k_load_avg": big.get("load_avg"),
        "rows_super_linear": sorted(row_suspects),
        "time_suspects": sorted(time_suspects),
        "queries": rows,
    }
    # surface any sweep-declared skips so the ratio artifact can never
    # silently claim coverage the legs didn't have
    skipped = sorted(set(base.get("skipped", [])) | set(big.get("skipped", [])))
    if skipped:
        out["skipped"] = skipped
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}: total time ratio {out['total_time_ratio']} "
          f"at k={k:g}; row suspects {row_suspects or 'NONE'}; "
          f"time suspects {time_suspects or 'none'}")
    return 1 if row_suspects else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]))
