#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run DuckDB oracle SQL
against the same parquet tables and compare with the Spark Verify dump.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir>
"""
import sys, json, glob, decimal
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(v):
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    return str(v)

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            want = con.sql(sql)
            wdf = want.df()[sorted(want.columns)]
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {str(ex)[:200]}")
            n_bad += 1
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet({files!r})")
            gdf = got.df()[sorted(got.columns)]
        except Exception as ex:
            print(f"FAIL {name}: spark read error: {str(ex)[:200]}")
            n_bad += 1
            continue
        if sorted(want.columns) != sorted(got.columns):
            print(f"FAIL {name}: cols oracle={sorted(want.columns)} spark={sorted(got.columns)}")
            n_bad += 1
            continue
        if len(wdf) != len(gdf):
            print(f"FAIL {name}: rows oracle={len(wdf)} spark={len(gdf)}")
            n_bad += 1
            continue
        wvals = [tuple(canon(v) for v in row) for row in wdf.itertuples(index=False)]
        gvals = [tuple(canon(v) for v in row) for row in gdf.itertuples(index=False)]
        if wvals == gvals:
            print(f"ok   {name} ({len(wdf)} rows)")
            n_ok += 1
        elif sorted(wvals) == sorted(gvals):
            # order drift is a real failure: the driver hashes in row order
            print(f"FAIL {name}: values match only after row sort (non-total ORDER BY?)")
            n_bad += 1
        else:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(wvals, gvals)) if a != b][:3]
            extra = f" first diffs: {diffs}" if diffs else " (multiset differs)"
            print(f"FAIL {name}: value mismatch{extra}")
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
