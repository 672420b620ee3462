#!/usr/bin/env python3
"""Adversarial differential fuzz: clone a testdata SF dir, inject the
data classes the driver's regenerated corpora might carry (duplicate
doc_ids, replayed events, tied sort keys, nulls, nasty whitespace and
unicode), then run the full Verify + check.py differential against
DuckDB on the mutated data. Any red is a cross-engine portability bug
in a declared query — the class of failure that shows up driver-side as
"hash red, locally unreproducible".

Usage:
  python3 scripts/fuzz.py gen  <src_sf_dir> <fuzz_data_dir> [seed] [classes]
  python3 scripts/fuzz.py all  <src_sf_dir> <fuzz_dir> [seed] [classes]

classes: comma-separated subset of
  docdup   duplicate doc_ids (replays, reshuffles, cross-source)
  nasty    fresh doc_ids with nasty text (null/empty/whitespace/unicode)
  nullid   null doc_id rows
  evdup    replayed / key-tied events
  evnull   events with null fields
  evns     nanosecond-grain timestamps: the events table re-typed to
           TIMESTAMP_NS with pre-epoch sub-µs rows (the ns→µs
           conversion-semantics class: both engines TRUNCATE toward
           zero — Spark via nanosAsLong + DIV 1000, DuckDB's parquet
           reader at the scan; see the measured matrix in
           Sources.events — a floor-division variant FAILS this class)
           and same-µs ns-level near-ties whose ns order disagrees
           with event_id order (the tie-break portability class)
  evhot    bound-binding skew + cap-boundary ties: one user with >
           SeqPatternMaxEvents, one all-events-one-timestamp user
           straddling rn=256/257, one exactly-at-cap user, gap-fill
           activity at exactly d0+729 and d0+730, plus the original
           events (the seq-pattern journey cap must truncate
           identically in both engines, including a conversion event
           landing BEYOND the cap) and one user whose first/last
           events sit > GapFillMaxSpanDays apart (the gap-fill grid
           clamp must bind identically)
  vecdup   embeddings: replayed / id-colliding / degenerate vectors
  reldup   orders/lineitem: replayed rows, key collisions with divergent
           payloads, null keys/dates — the classes a regenerated
           warehouse could carry into the relational/trade queries
  dimdup   dimension tables: duplicate primary keys with divergent
           payloads and null FKs in customer/supplier/part/nation —
           the join-fanout and window-tie classes
  money    hostile money payloads (NaN, ±Inf, beyond-DECIMAL(10,2)
           magnitudes) in events.value, orders.o_totalprice,
           lineitem.l_extendedprice/l_discount, dim acctbal /
           retailprice — the class where DuckDB's strict CAST raises
           while Spark's cast yields NULL (oracles must try_cast)
  zero     EVERY table replaced by a zero-row clone (schema preserved)
           — the degenerate-input sweep: empty aggregates, empty
           windows, zero denominators, empty stage materializations.
  zdocs    only documents + embeddings zeroed (rest copied intact)
  zev      only events zeroed
  zrel     only orders + lineitem zeroed
  zdim     only nation/region/customer/supplier/part zeroed
           The partial-empty variants hit a different surface than
           `zero`: joins with exactly one empty side, empty broadcast
           builds against populated probes, empty dims under populated
           facts. All five are exclusive (cannot combine with other
           classes — there is no data left to mutate) and not in the
           default set — run explicitly as `... <seed> zero` etc.
(default: all non-zero classes). `all` shells out to sbt for
graft.Verify, then runs check.py. Deterministic for a given
(src, seed, classes).
"""
import os, random, shutil, subprocess, sys
import duckdb

ALL_CLASSES = {"docdup", "nasty", "nullid", "evdup", "evnull", "evns",
               "evhot", "vecdup", "reldup", "dimdup", "money"}

# money payloads a hostile upstream could emit into a DOUBLE column:
# non-finite and out of DECIMAL(10,2) range. Deliberately NOT fuzzed:
# ulp-zone rounding boundaries at the precision limit (99999999.995) —
# Spark rounds the binary double, DuckDB its decimal string repr, a
# documented engine divergence outside the canonical money envelope
# (Registry0.portableCasts caveat).
HOSTILE_MONEY = [float("nan"), float("inf"), float("-inf"),
                 1e12, -1e12, 5e9]

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

NASTY_TEXT = [
    None,                      # null text -> n_tok NULL everywhere
    "",                        # empty -> [''] token
    " ",                       # single space -> ['','']
    "   ",                     # run of spaces
    " leading and trailing ",  # boundary empties
    "double  space   run",     # interior empties
    "tab\tseparated\ttokens",  # tabs are NOT token breaks (split on ' ')
    "newline\nin text",        # newline inside a token
    "café naïve résumé",   # accents
    "中文 文本 处理",  # CJK
    "emoji \U0001f600 mixed \U0001f680 text",  # astral plane
    "nbsp joined words",  # NBSP is not a space token break
    "the " * 64 + "end",       # long repetitive
    "UPPER lower MiXeD case",
]


ZERO_CLASSES = {
    "zero": set(TABLES),
    "zdocs": {"documents", "embeddings"},
    "zev": {"events"},
    "zrel": {"orders", "lineitem"},
    "zdim": {"nation", "region", "customer", "supplier", "part"},
}


def gen_zero(src, dst, empty):
    """Zero-row clones of `empty` tables, the rest copied intact;
    schemas preserved (DuckDB keeps the source parquet schema on an
    empty COPY). Fully deterministic — the CLI seed argument has no
    effect on zero classes. The events table stays µs-typed — the zero sweeps test
    empty-input behavior, not the ns reader path (evns covers that with
    rows that exercise it)."""
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        if t in empty:
            con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet' WHERE 1=0) "
                        f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        else:
            shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    print(f"fuzz gen: {dst}  (zero-row clones of {sorted(empty)})")


def gen(src, dst, seed=5, classes=ALL_CLASSES):
    zc = classes & ZERO_CLASSES.keys()
    if zc:
        # hard error, not assert: python -O strips asserts and would
        # silently generate a wrong corpus instead of failing
        if len(classes) != 1:
            raise SystemExit(
                "zero classes are exclusive — there is no data left to mutate")
        gen_zero(src, dst, ZERO_CLASSES[next(iter(zc))])
        return
    rng = random.Random(seed)
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    mutated = {"documents", "events", "embeddings"}
    if "reldup" in classes or "money" in classes:
        mutated |= {"orders", "lineitem"}
    if "dimdup" in classes or "money" in classes:
        mutated |= {"customer", "supplier", "part", "nation"}
    for t in TABLES:
        if t not in mutated:
            shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

    # ---- dims: duplicate PKs with divergent payloads, null FKs --------
    if "dimdup" in classes or "money" in classes:
        def mutate_dim(table, pk, payload, fk=None, money_col=None):
            cols = [c[0] for c in con.sql(
                f"DESCRIBE SELECT * FROM '{src}/{table}.parquet'").fetchall()]
            rows = con.sql(f"SELECT * FROM '{src}/{table}.parquet'").fetchall()
            i_pk, i_pay = cols.index(pk), cols.index(payload)
            b = rng.sample(rows, min(8, len(rows)))
            ex = []
            if "dimdup" in classes:
                for r in b[:3]:         # exact replayed dim rows
                    ex.append(tuple(r))
                for r in b[3:6]:        # same PK, divergent payload
                    q = list(r)
                    q[i_pay] = (str(r[i_pay]) + "_DUP") \
                        if isinstance(r[i_pay], str) else None
                    ex.append(tuple(q))
                if fk is not None and len(b) > 6:   # fresh PK, null FK
                    q = list(b[6])
                    q[i_pk] = max(x[i_pk] for x in rows) + 1000
                    q[cols.index(fk)] = None
                    ex.append(tuple(q))
                if len(b) > 7:                      # null PK
                    q = list(b[7]); q[i_pk] = None
                    ex.append(tuple(q))
            if "money" in classes and money_col is not None:
                i_m = cols.index(money_col)
                for j, v in enumerate(HOSTILE_MONEY):
                    # dup PK with hostile money (survivor-key class) for
                    # half, fresh PK (join/row class) for the other half
                    q = list(b[j % len(b)])
                    if j >= len(HOSTILE_MONEY) // 2:
                        q[i_pk] = max(x[i_pk] for x in rows) + 2000 + j
                    q[i_m] = v
                    ex.append(tuple(q))
            con.execute(f"CREATE OR REPLACE TABLE fdim AS "
                        f"SELECT * FROM '{src}/{table}.parquet'")
            if ex:
                con.executemany(
                    f"INSERT INTO fdim VALUES ({','.join('?' * len(cols))})",
                    ex)
            con.execute(
                f"COPY fdim TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
            return len(ex)
        nd = (mutate_dim("customer", "c_custkey", "c_name", "c_nationkey",
                         money_col="c_acctbal") +
              mutate_dim("supplier", "s_suppkey", "s_name", "s_nationkey",
                         money_col="s_acctbal") +
              mutate_dim("part", "p_partkey", "p_type",
                         money_col="p_retailprice") +
              mutate_dim("nation", "n_nationkey", "n_name", "n_regionkey"))
        print(f"fuzz gen: +{nd} dim rows")

    # ---- orders/lineitem: replays, key collisions, null keys/dates ----
    if "reldup" in classes or "money" in classes:
        ocols = [c[0] for c in con.sql(
            f"DESCRIBE SELECT * FROM '{src}/orders.parquet'").fetchall()]
        orows = con.sql(f"SELECT * FROM '{src}/orders.parquet'").fetchall()
        i_ok, i_ck, i_tot, i_od = (ocols.index(c) for c in
            ("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"))
        ob = rng.sample(orows, min(16, len(orows)))
        oex = []
        if "reldup" in classes:
            for r in ob[:5]:        # exact replayed orders (dup orderkey)
                oex.append(tuple(r))
            for r in ob[5:9]:       # same orderkey, divergent payload
                q = list(r)
                q[i_tot] = (r[i_tot] or 0.0) + 111.0
                oex.append(tuple(q))
            for r in ob[9:12]:      # fresh key, null orderdate
                q = list(r)
                q[i_ok] = r[i_ok] + 10_000_000
                q[i_od] = None
                oex.append(tuple(q))
            if len(ob) > 12:                        # null orderkey
                q = list(ob[12]); q[i_ok] = None
                oex.append(tuple(q))
            if len(ob) > 13:                        # null custkey
                q = list(ob[13]); q[i_ok] = ob[13][i_ok] + 20_000_000
                q[i_ck] = None
                oex.append(tuple(q))
        if "money" in classes:      # fresh keys, hostile totalprice
            for j, v in enumerate(HOSTILE_MONEY):
                q = list(ob[j % len(ob)])
                q[i_ok] = q[i_ok] + 30_000_000 + j
                q[i_tot] = v
                oex.append(tuple(q))
        con.execute(f"CREATE OR REPLACE TABLE ford AS "
                    f"SELECT * FROM '{src}/orders.parquet'")
        con.executemany(
            f"INSERT INTO ford VALUES ({','.join('?' * len(ocols))})", oex)
        con.execute(f"COPY ford TO '{dst}/orders.parquet' (FORMAT PARQUET)")

        lcols = [c[0] for c in con.sql(
            f"DESCRIBE SELECT * FROM '{src}/lineitem.parquet'").fetchall()]
        lrows = con.sql(f"SELECT * FROM '{src}/lineitem.parquet'").fetchall()
        k_ok, k_pk, k_sk, k_ln, k_q, k_sd = (lcols.index(c) for c in
            ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
             "l_quantity", "l_shipdate"))
        lb = rng.sample(lrows, min(20, len(lrows)))
        lex = []
        if "reldup" in classes:
            for r in lb[:5]:        # exact replayed lines
                lex.append(tuple(r))
            for r in lb[5:9]:       # same (orderkey, linenumber), new qty
                q = list(r)
                q[k_q] = (r[k_q] or 0.0) + 1.0
                lex.append(tuple(q))
            for fld, rs in (("l_partkey", lb[9:12]),
                            ("l_suppkey", lb[12:15]),
                            ("l_shipdate", lb[15:18])):
                for r in rs:        # null part/supp/shipdate
                    q = list(r)
                    q[lcols.index(fld)] = None
                    lex.append(tuple(q))
            if len(lb) > 18:                        # null orderkey
                q = list(lb[18]); q[k_ok] = None
                lex.append(tuple(q))
        if "money" in classes:  # hostile extendedprice/discount/quantity
            k_ep = lcols.index("l_extendedprice")
            k_disc = lcols.index("l_discount")
            for j, v in enumerate(HOSTILE_MONEY):
                q = list(lb[j % len(lb)])
                q[k_ln] = (q[k_ln] or 0) + 90 + j   # fresh line number
                q[(k_ep, k_disc, k_q)[j % 3]] = v
                lex.append(tuple(q))
        con.execute(f"CREATE OR REPLACE TABLE fli AS "
                    f"SELECT * FROM '{src}/lineitem.parquet'")
        con.executemany(
            f"INSERT INTO fli VALUES ({','.join('?' * len(lcols))})", lex)
        con.execute(f"COPY fli TO '{dst}/lineitem.parquet' (FORMAT PARQUET)")
        print(f"fuzz gen: +{len(oex)} orders, +{len(lex)} lineitems")

    # ---- documents: duplicate doc_ids + nasty text + nulls ------------
    docs = con.sql(f"SELECT * FROM '{src}/documents.parquet'").fetchall()
    cols = [c[0] for c in con.sql(
        f"DESCRIBE SELECT * FROM '{src}/documents.parquet'").fetchall()]
    i_doc, i_text, i_lang, i_src, i_nch = (cols.index(c) for c in
        ("doc_id", "text", "lang", "source", "n_chars"))
    extra = []

    def doc(doc_id, text, lang, source):
        r = [None] * len(cols)
        r[i_doc], r[i_text], r[i_lang], r[i_src] = doc_id, text, lang, source
        r[i_nch] = None if text is None else len(text)
        return tuple(r)

    base = [r for r in rng.sample(docs, min(30, len(docs)))]
    if "docdup" in classes:
        for r in base[:8]:      # exact replays (same everything)
            extra.append(tuple(r))
        for r in base[8:14]:    # same doc_id, same token count, new text
            toks = (r[i_text] or "x x x").split(" ")
            extra.append(doc(r[i_doc], " ".join(rng.sample(toks, len(toks))),
                             r[i_lang], r[i_src]))
        for r in base[14:20]:   # same doc_id, different token count
            extra.append(doc(r[i_doc], "short dup text", r[i_lang], r[i_src]))
        for r in base[20:26]:   # cross-source duplicate of same doc_id
            extra.append(doc(r[i_doc], r[i_text], r[i_lang], "srcX"))
    nid = max(r[i_doc] for r in docs) + 1
    if "nasty" in classes:
        for t in NASTY_TEXT:    # fresh ids with nasty text
            extra.append(doc(nid, t, rng.choice(["en", "de", None]),
                             rng.choice(["src0", "srcX", None])))
            nid += 1
        # n_chars pathologies: NULL with real text (doc() only nulls it
        # for null text), and a value wildly inconsistent with len(text)
        # — n_chars is source DATA, not a derived field, so queries
        # keyed on it (outlier/winsorize/ntile/drift) must stay
        # cross-engine deterministic whatever it holds
        for nch in (None, 999_999, -5):
            r = [None] * len(cols)
            r[i_doc], r[i_text] = nid, f"n_chars pathology {nch} text"
            r[i_lang], r[i_src], r[i_nch] = "en", "src0", nch
            extra.append(tuple(r))
            nid += 1
    if "nullid" in classes:
        # null doc_id rows (two, to create a doc_id tie on NULL as well)
        extra.append(doc(None, "null id one", "en", "src0"))
        extra.append(doc(None, "null id two", "en", "src1"))
    con.execute(
        f"CREATE OR REPLACE TABLE fdocs AS SELECT * FROM '{src}/documents.parquet'")
    if extra:
        con.executemany(
            f"INSERT INTO fdocs VALUES ({','.join('?' * len(cols))})", extra)
    con.execute(f"COPY fdocs TO '{dst}/documents.parquet' (FORMAT PARQUET)")

    # ---- events: replays, tied keys, nulls ----------------------------
    ecols = [c[0] for c in con.sql(
        f"DESCRIBE SELECT * FROM '{src}/events.parquet'").fetchall()]
    evs = con.sql(f"SELECT * FROM '{src}/events.parquet'").fetchall()
    j_eid, j_ts, j_uid, j_et, j_val, j_props = (ecols.index(c) for c in
        ("event_id", "ts", "user_id", "event_type", "value", "props"))
    types = sorted({r[j_et] for r in evs if r[j_et] is not None})
    eex = []
    ebase = rng.sample(evs, min(40, len(evs)))
    if "evdup" in classes:
        for r in ebase[:10]:    # exact replayed events
            eex.append(tuple(r))
        for r in ebase[10:20]:  # same (user, ts, event_id), different type
            q = list(r)
            q[j_et] = rng.choice([t for t in types if t != r[j_et]])
            eex.append(tuple(q))
        for r in ebase[20:28]:  # same (user, ts), different event_id
            q = list(r)
            q[j_eid] = r[j_eid] + 1_000_000
            q[j_et] = rng.choice(types)
            eex.append(tuple(q))
        # session-boundary twin (deterministic; found by seed 78): a
        # fresh user with one event, then an IDENTICAL duplicated event
        # 31 minutes later — past the 30-min session gap. The twins are
        # full window-order ties whose lag-computed new-session flags
        # DIFFER (one 1, one 0); an order-sensitive session-id running
        # sum (ROWS frame over a second window pass) can hand a flag-0
        # twin the PREVIOUS session id — DuckDB 1.0 reorders ties
        # between window clauses. The engines' RANGE-frame sid must
        # keep both twins in the new session.
        import datetime as _dt
        _buid = max((r[j_uid] for r in evs if r[j_uid] is not None),
                    default=0) + 999
        _beid = max((r[j_eid] for r in evs if r[j_eid] is not None),
                    default=0) + 6_000_000
        _tb = _dt.datetime(2024, 5, 1)
        _tmpl = list(ebase[0])
        _tmpl[j_uid] = _buid
        _tmpl[j_props] = None
        first = list(_tmpl)
        first[j_eid], first[j_ts], first[j_et] = _beid, _tb, "error"
        twin = list(_tmpl)
        twin[j_eid] = _beid + 1
        twin[j_ts] = _tb + _dt.timedelta(minutes=31)
        twin[j_et] = "purchase"
        eex.append(tuple(first))
        eex.append(tuple(twin))
        eex.append(tuple(twin))
    if "evnull" in classes:
        for r in ebase[28:40]:  # null fields
            q = list(r)
            q[j_eid] = r[j_eid] + 2_000_000
            field = rng.choice(["ts", "event_type", "value", "props", "user_id"])
            q[ecols.index(field)] = None
            eex.append(tuple(q))
    if "money" in classes:      # hostile event values
        for j, v in enumerate(HOSTILE_MONEY):
            q = list(ebase[j % len(ebase)])
            q[j_eid] = q[j_eid] + 4_000_000 + j
            q[j_val] = v
            eex.append(tuple(q))
    if "evhot" in classes and ebase:
        import datetime
        max_uid = max((r[j_uid] for r in evs
                       if r[j_uid] is not None), default=0)
        # FRESH uids for both synthetic users: reusing an existing uid
        # would let that user's real events shift the cap boundary and
        # could put a pre-existing purchase INSIDE the first 256 slots,
        # silently defusing the converted-flag discriminator below.
        # Fresh event_ids too, offset from the corpus max — absolute ids
        # would collide with real rows at large SFs and perturb the
        # tie-break/dedup classes this class composes with.
        hot = max_uid + 555
        wide = max_uid + 777
        eid0 = max((r[j_eid] for r in evs if r[j_eid] is not None),
                   default=0) + 8_000_000
        t0 = datetime.datetime(2024, 3, 1)
        # one user crossing the 256-event journey cap, with the only
        # purchase AFTER it: a cap divergence between the engines flips
        # n_events, the journey string AND the converted flag
        for i in range(300):
            q = list(ebase[i % len(ebase)])
            q[j_eid] = eid0 + i
            q[j_ts] = t0 + datetime.timedelta(minutes=i)
            q[j_uid] = hot
            q[j_et] = "purchase" if i == 299 else "view"
            eex.append(tuple(q))
        # one fresh user spanning ~1500 days: the 730-day gap-fill grid
        # clamp must cut the grid at the same day in both engines
        for i, days in enumerate((0, 1500)):
            q = list(ebase[i % len(ebase)])
            q[j_eid] = eid0 + 1_000 + i
            q[j_ts] = t0 + datetime.timedelta(days=days)
            q[j_uid] = wide
            q[j_et] = "view"
            eex.append(tuple(q))
        # cap-boundary ties (r8 verdict #5): a user whose 260 events ALL
        # share one timestamp — rn is decided purely by the event_id
        # tie-break, and the rn<=256 cut plus the rn=257 capped-flag
        # probe row must pick the SAME events in both engines. The only
        # purchase sits at rn=257: one event past the cap, so converted
        # stays false while capped flips true.
        tie = max_uid + 888
        for i in range(260):
            q = list(ebase[i % len(ebase)])
            q[j_eid] = eid0 + 2_000 + i
            q[j_ts] = t0
            q[j_uid] = tie
            q[j_et] = "purchase" if i == 256 else "view"
            eex.append(tuple(q))
        # exactly-at-cap user: 256 events with the purchase AT rn=256 —
        # converted must be true and capped false (no probe row exists)
        edge = max_uid + 889
        for i in range(256):
            q = list(ebase[i % len(ebase)])
            q[j_eid] = eid0 + 3_000 + i
            q[j_ts] = t0 + datetime.timedelta(seconds=i)
            q[j_uid] = edge
            q[j_et] = "purchase" if i == 255 else "view"
            eex.append(tuple(q))
        # gap-fill clamp off-by-one edges: activity at exactly d0+729
        # (last grid day — clamped false) vs exactly d0+730 (first day
        # OUTSIDE — grid still 730 days, clamped true, the observed day
        # dropped); both engines must cut at the same day
        for k, last_day in enumerate((729, 730)):
            u = max_uid + 1_111 + k
            for i, days in enumerate((0, last_day)):
                q = list(ebase[(i + k) % len(ebase)])
                q[j_eid] = eid0 + 4_000 + 10 * k + i
                q[j_ts] = t0 + datetime.timedelta(days=days)
                q[j_uid] = u
                q[j_et] = "view"
                eex.append(tuple(q))
    con.execute(
        f"CREATE OR REPLACE TABLE fev AS SELECT * FROM '{src}/events.parquet'")
    if eex:
        con.executemany(
            f"INSERT INTO fev VALUES ({','.join('?' * len(ecols))})", eex)
    if "evns" in classes:
        # Re-type the whole table to nanosecond-precision parquet (what
        # the driver's regenerated events carry — Spark reads it via
        # nanosAsLong + truncating DIV, DuckDB's parquet reader
        # truncates to µs at the scan; truncation on BOTH paths, per
        # the measured matrix in Sources.events), then add ns-grain
        # rows no µs column can express. pyarrow, not DuckDB COPY: DuckDB 1.0 silently
        # downcasts TIMESTAMP_NS to µs on parquet write AND truncates
        # sub-µs string literals at parse, so the ns payload has to be
        # built from integer nanos outside SQL.
        import pyarrow as pa
        import pyarrow.parquet as pq
        tbl = con.sql("SELECT * FROM fev").arrow()
        ti = tbl.schema.get_field_index("ts")
        tbl = tbl.set_column(ti, pa.field("ts", pa.timestamp("ns")),
                             tbl.column(ti).cast(pa.timestamp("ns")))
        u = ebase[0][j_uid]
        et0, et1 = types[0], types[-1]
        jun1 = 1_717_200_000 * 10 ** 9  # 2024-06-01 00:00:00 UTC
        ns_rows = [
            # pre-epoch sub-µs: trunc(ns/1000) = 0 µs but floor = -1 µs
            (3_000_001, -500, et0),          # 1969-12-31 23:59:59.9999995
            (3_000_002, -876_543_211, et1),  # ...59.123456789
            # post-epoch ns-grain control (floor == trunc)
            (3_000_003, 1_900, et0),
            # same-µs ns near-tie whose ns order (004 later) disagrees
            # with event_id order — after µs flooring the pair ties and
            # must break on event_id identically in both engines
            (3_000_004, jun1 + 700, et0),
            (3_000_005, jun1 + 200, et1),
        ]
        cols = []
        for i, f in enumerate(tbl.schema):
            if i == j_eid:
                v = [r[0] for r in ns_rows]
            elif i == j_ts:
                v = pa.array([r[1] for r in ns_rows],
                             pa.int64()).cast(pa.timestamp("ns"))
                cols.append(v)
                continue
            elif i == j_uid:
                v = [u] * len(ns_rows)
            elif i == j_et:
                v = [r[2] for r in ns_rows]
            elif i == j_val:
                v = [1.0] * len(ns_rows)
            else:
                v = [None] * len(ns_rows)
            cols.append(pa.array(v, f.type))
        extra_tbl = pa.table(cols, schema=tbl.schema)
        pq.write_table(pa.concat_tables([tbl, extra_tbl]),
                       f"{dst}/events.parquet", version="2.6")
        eex.extend(ns_rows)
    else:
        con.execute(f"COPY fev TO '{dst}/events.parquet' (FORMAT PARQUET)")

    # ---- embeddings: replays, id collisions, degenerate vectors -------
    vex = []
    if "vecdup" in classes:
        vrows = con.sql(
            f"SELECT * FROM '{src}/embeddings.parquet' ORDER BY vec_id"
        ).fetchall()
        vb = vrows[:12]
        for r in vb[:4]:        # exact replays
            vex.append(tuple(r))
        for r in vb[4:7]:       # same id + label, different embedding
            emb = list(r[1])
            emb[0] = emb[0] + 0.25
            vex.append((r[0], emb, r[2]))
        for r in vb[7:10]:      # same id, different label
            vex.append((r[0], r[1], (r[2] or 0) + 7))
        nvid = max(r[0] for r in vrows) + 1
        dim = len(vrows[0][1])
        vex.append((None, vrows[0][1], 1))          # null vec_id
        vex.append((nvid, None, 1))                 # null embedding
        vex.append((nvid + 1, [0.0] * dim, 1))      # zero vector
        vex.append((nvid + 2, [float("nan")] * dim, 1))  # NaN poison
        vex.append((nvid + 3, vrows[1][1], None))   # null label
        ne = list(vrows[2][1])
        ne[3] = None
        vex.append((nvid + 4, ne, 1))               # null ELEMENT in vector
        ie = list(vrows[3][1])
        ie[0] = float("inf")
        vex.append((nvid + 5, ie, 1))               # +Inf element -> Inf norm
        oe2 = list(vrows[4][1])
        oe2[1] = float("-inf")
        vex.append((nvid + 6, oe2, 1))              # -Inf element -> Inf norm
    con.execute(f"CREATE OR REPLACE TABLE fvec AS "
                f"SELECT * FROM '{src}/embeddings.parquet'")
    if vex:
        con.executemany("INSERT INTO fvec VALUES (?, ?, ?)", vex)
    con.execute(f"COPY fvec TO '{dst}/embeddings.parquet' (FORMAT PARQUET)")
    print(f"fuzz gen: +{len(vex)} vectors")
    print(f"fuzz gen: {dst}  (+{len(extra)} docs, +{len(eex)} events, seed={seed})")


def main():
    cmd, src, out = sys.argv[1], sys.argv[2], sys.argv[3]
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    classes = set(sys.argv[5].split(",")) if len(sys.argv) > 5 else ALL_CLASSES
    unknown = classes - ALL_CLASSES - ZERO_CLASSES.keys()
    if unknown:
        raise SystemExit(f"unknown fuzz classes: {sorted(unknown)}")
    if cmd == "gen":
        gen(src, out, seed, classes)
        return 0
    if cmd != "all":
        raise SystemExit(f"unknown command: {cmd!r} (want gen|all)")
    data, vout = f"{out}/data", f"{out}/verify"
    gen(src, data, seed, classes)
    subprocess.run(["sbt", "-batch", f"runMain graft.Verify {data} {vout}"],
                   check=True, stdout=subprocess.DEVNULL,
                   stderr=subprocess.DEVNULL)
    r = subprocess.run([sys.executable, "scripts/check.py", vout, data])
    return r.returncode


if __name__ == "__main__":
    sys.exit(main())
