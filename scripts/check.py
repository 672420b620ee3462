#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run DuckDB oracle SQL
against the same parquet tables and compare with the Spark Verify dump.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir> [q1,q2,...]
           [--json <out.json>]

--json writes a CORRECTNESS_r{N}-format artifact (per-query rows_match/
schema_match/hash_match/spark_rows/oracle_rows/err) so an off-driver
gate run (e.g. the sf1 scale leg) leaves the same auditable evidence
the driver's own gate does.
"""
import sys, json, glob, decimal
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(v):
    # Exact canonicalization — deliberately type-sensitive, matching the
    # driver's hash gate. float via repr (bit-exact, distinguishes -0.0);
    # Decimal via str (scale-preserving: 1.50 != 1.5 != 1.500000), so a
    # DECIMAL-typed output column that differs only in canonical form
    # from the oracle FAILS here like it fails the driver (round-1 bug:
    # pandas .df() collapsed both sides to float64 and masked this).
    if isinstance(v, float):
        return "f:" + repr(v)
    if isinstance(v, decimal.Decimal):
        return "d:" + str(v)
    return str(v)

def fetch(rel):
    """Rows with columns reordered by sorted column name, exact values
    (fetchall preserves DECIMAL as decimal.Decimal; .df() would not)."""
    order = sorted(range(len(rel.columns)), key=lambda i: rel.columns[i])
    return [tuple(canon(row[i]) for i in order) for row in rel.fetchall()]

def int128_cols(rel):
    """Output columns whose DuckDB type has no 64-bit representation
    (HUGEINT from an uncast sum(), DECIMAL(38,*)): the driver's
    comparator materializes these as float64 ("3.0" vs Spark's "3"),
    hash-red with rows/schema green — while fetchall() here preserves
    Python ints and masks it. This exact class hid the q_pack_seqs /
    q_event_trans reds for three driver rounds; any oracle emitting one
    of these types must CAST it down explicitly."""
    return [c for c, t in zip(rel.columns, rel.types)
            if str(t) in ("HUGEINT", "UHUGEINT")
            or str(t).startswith("DECIMAL(38")]

def connect(sfdir):
    con = duckdb.connect()
    # An in-memory DuckDB has NO temp directory, so a heavy oracle
    # (the recursive-CTE components at 10x SF) aborts with OOM instead
    # of spilling; give it a spill dir and a bounded budget. Few
    # threads: per-eval memory scales with threads, and the recursive
    # components oracles re-evaluate the whole shingle pipeline per
    # iteration (DuckDB 1.0 can't safely materialize a CTE referenced
    # from a recursive term — it returns a wrong fixpoint, measured),
    # so several evaluations' buffers coexist.
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET memory_limit='96GB'")
    con.execute("SET threads=4")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    return con

def record(rows=False, schema=False, hsh=False, srows=None, orows=None,
           err=None):
    """CORRECTNESS_r{N}.json entry shape (the driver's gate format)."""
    return {"rows_match": rows, "schema_match": schema, "hash_match": hsh,
            "spark_rows": srows, "oracle_rows": orows, "err": err}

def check_one(con, outdir, name, sql):
    """Returns a CORRECTNESS-format record (prints verdict). A query
    passes iff rows_match and schema_match and hash_match."""
    try:
        want = con.sql(sql)
        huge = int128_cols(want)
        if huge:
            msg = (f"int128-typed oracle columns {huge} "
                   "(driver hashes these as float64 — CAST AS BIGINT)")
            print(f"FAIL {name}: {msg}")
            return record(err=msg)
        wvals = fetch(want)
    except Exception as ex:
        print(f"FAIL {name}: oracle error: {str(ex)[:200]}")
        return record(err=f"oracle error: {str(ex)[:200]}")
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        return record(orows=len(wvals), err="no spark output")
    try:
        got = con.sql(f"SELECT * FROM read_parquet({files!r})")
        gvals = fetch(got)
    except Exception as ex:
        print(f"FAIL {name}: spark read error: {str(ex)[:200]}")
        return record(orows=len(wvals),
                      err=f"spark read error: {str(ex)[:200]}")
    rows_match = len(wvals) == len(gvals)
    schema_match = sorted(want.columns) == sorted(got.columns)
    hash_match = wvals == gvals
    rec = record(rows_match, schema_match, hash_match,
                 len(gvals), len(wvals))
    if not schema_match:
        print(f"FAIL {name}: cols oracle={sorted(want.columns)} spark={sorted(got.columns)}")
    elif not rows_match:
        print(f"FAIL {name}: rows oracle={len(wvals)} spark={len(gvals)}")
    elif hash_match:
        print(f"ok   {name} ({len(wvals)} rows)")
    elif sorted(wvals) == sorted(gvals):
        # order drift is a real failure: the driver hashes in row order
        print(f"FAIL {name}: values match only after row sort (non-total ORDER BY?)")
    else:
        diffs = [(i, a, b) for i, (a, b) in enumerate(zip(wvals, gvals)) if a != b][:3]
        extra = f" first diffs: {diffs}" if diffs else " (multiset differs)"
        print(f"FAIL {name}: value mismatch{extra}")
    return rec

def passed(rec):
    return rec["rows_match"] and rec["schema_match"] and rec["hash_match"]

def main(outdir, sfdir, only=None, json_out=None):
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_ok = n_bad = 0
    records = {}
    for name in sorted(oracle):
        # Fresh connection per query: one heavy oracle must not leave
        # the buffer pool in a state that OOMs its innocent successors
        # (measured at 10x SF: q_window_rank failed purely from running
        # after the components CTE on a shared connection). The connect
        # itself is also guarded: a harness-level failure (measured at
        # 10x SF: DuckDB 1.0's jemalloc retains tens of thousands of
        # mappings mid-query and tiny mmaps start failing once the
        # process hits vm.max_map_count — raise it, see scale_sweep.sh)
        # must fail THAT query's record, not kill the remaining run.
        try:
            con = connect(sfdir)
        except Exception as ex:
            print(f"FAIL {name}: harness connect error: {str(ex)[:200]}")
            records[name] = record(err=f"harness connect error: {str(ex)[:200]}")
            n_bad += 1
            continue
        try:
            records[name] = check_one(con, outdir, name, oracle[name])
            if passed(records[name]):
                n_ok += 1
            else:
                n_bad += 1
        finally:
            con.close()
    print(f"== {n_ok} ok, {n_bad} bad ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(records, f, indent=1)
        print(f"== wrote {json_out} ==")
    return 1 if n_bad else 0

USAGE = "usage: check.py <outdir> <sfdir> [q1,q2,...] [--json out.json]"

if __name__ == "__main__":
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.exit(f"--json needs a path argument\n{USAGE}")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    if len(argv) < 2:
        sys.exit(USAGE)
    only = set(argv[2].split(",")) if len(argv) > 2 else None
    sys.exit(main(argv[0], argv[1], only, json_out))
