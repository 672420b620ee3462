#!/usr/bin/env python3
"""Build the SCALE_SF1 whole-inventory scale evidence: per-query time
ratios between two BENCH_LAST-format JSON files (base SF vs k-times SF).

Usage: python3 scripts/scale_ratio.py <bench_base.json> <bench_k.json> <k> <out.json>

Flags every query whose ratio exceeds k * SLACK (super-linear suspect).
Sub-second base times are noise-dominated (machine variance ~2x), so
suspects are only flagged when the k-SF time is also material (>1s).
"""
import json
import sys

SLACK = 1.6  # linear + constant overhead allowance


def main(base_path, k_path, k, out_path):
    base = json.load(open(base_path))
    big = json.load(open(k_path))
    k = float(k)
    qb, qk = base["queries"], big["queries"]
    rows = {}
    suspects = []
    for name in sorted(qb):
        if name not in qk:
            continue
        b, g = qb[name], qk[name]
        ratio = round(g / b, 2) if b > 0 else None
        rows[name] = {"base_sec": b, "k_sec": g, "ratio": ratio}
        if ratio is not None and ratio > k * SLACK and g > 1.0:
            suspects.append(name)
    out = {
        "k": k,
        "base_total_sec": base["value"],
        "k_total_sec": big["value"],
        "total_ratio": round(big["value"] / base["value"], 2),
        "base_stages_sec": base.get("stages_sec"),
        "k_stages_sec": big.get("stages_sec"),
        "n_queries": len(rows),
        "suspects_over_linear": sorted(
            suspects, key=lambda n: -rows[n]["ratio"]),
        "queries": rows,
    }
    json.dump(out, open(out_path, "w"), indent=1)
    print(f"total {base['value']}s -> {big['value']}s "
          f"(x{out['total_ratio']} at k={k:g}); "
          f"{len(suspects)} super-linear suspects: {out['suspects_over_linear'][:10]}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4])
