#!/usr/bin/env python3
"""DuckDB-side proof of the PortableMath exact-isqrt ladder.

Evaluates the SAME SQL fragment the oracles embed (float seed +/-2
correction ladder over HUGEINT) against python's math.isqrt on
adversarial inputs: int64 edges, >2^63 values (where DuckDB's
HUGEINT->DOUBLE cast is double-rounded), perfect squares +/-1, and
random values across the full 2^106 exactness envelope. A zero
mismatch count proves the DuckDB leg; PortableMathSpec proves the
Spark leg against a BigInt reference — together the two engines'
declared fixed-point outputs are exactly equal by construction.

Run: python3 scripts/isqrt_probe.py  (result recorded in SCALE.md)
"""
import math
import random
import duckdb

EST = "CAST(floor(sqrt(CAST((t) AS DOUBLE))) AS HUGEINT)"
ADJ = ("(r0"
       " + (CASE WHEN (r0 + 1) * (r0 + 1) <= (t) THEN 1 ELSE 0 END)"
       " + (CASE WHEN (r0 + 2) * (r0 + 2) <= (t) THEN 1 ELSE 0 END)"
       " - (CASE WHEN r0 * r0 > (t) THEN 1 ELSE 0 END)"
       " - (CASE WHEN r0 > 0 AND (r0 - 1) * (r0 - 1) > (t)"
       "      THEN 1 ELSE 0 END))")

BOUND = 2 ** 106

def cases():
    ts = [0, 1, 2, 3, 4, 2**63 - 1, 2**63, 2**63 + 1, 2**64,
          2**80 + 17, 10**22, 10**25, BOUND - 1]
    for k in [3037000499, 2**32, 2**40 + 12345, 1234567890123456,
              10**15 + 7, 2**52 + 11]:
        ts += [k*k - 1, k*k, k*k + 1]
    rnd = random.Random(20260815)
    ts += [rnd.getrandbits(1 + rnd.randrange(105)) for _ in range(4000)]
    return [t for t in ts if 0 <= t < BOUND]

def main():
    con = duckdb.connect()
    ts = cases()
    con.execute("CREATE TABLE tt(t HUGEINT)")
    con.executemany("INSERT INTO tt VALUES (?)", [(t,) for t in ts])
    rows = con.execute(
        f"SELECT t, {ADJ} AS r FROM (SELECT t, {EST} AS r0 FROM tt)"
    ).fetchall()
    bad = [(t, r, math.isqrt(t)) for t, r in rows if r != math.isqrt(t)]
    over64 = sum(1 for t, _ in rows if t >= 2**63)
    print(f"cases={len(rows)} over_int64={over64} mismatches={len(bad)}")
    for t, r, want in bad[:10]:
        print(f"  MISMATCH t={t} got={r} want={want}")
    raise SystemExit(1 if bad else 0)

if __name__ == "__main__":
    main()
