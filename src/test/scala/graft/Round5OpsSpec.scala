package graft

import java.sql.Timestamp
import graft.engine.{Events, Relational, TextOps}

/** Hand-computed verification for the round-5 widening operators: RFM
  * segmentation, basket pairs, session paths, the deterministic HLL,
  * source-vocabulary Jaccard, and length z-score outliers. The DuckDB
  * differential proves cross-engine agreement; these prove the VALUES. */
class Round5OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ordersDir(rows: Seq[(Long, Long, String, Double, String)])
      : String = {
    val dir = java.nio.file.Files.createTempDirectory("r5ord").toString
    rows.map { case (ok, ck, st, price, date) =>
      (ok, ck, st, price, Timestamp.valueOf(s"$date 00:00:00"), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    dir
  }

  private def lineitemDir(rows: Seq[(Long, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("r5li").toString
    rows.zipWithIndex.map { case ((ok, pk), i) =>
      (ok, pk, 1L, i + 1, 1.0, 10.0, 0.0, 0.0, "N", "O",
        Timestamp.valueOf("1995-01-01 00:00:00"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    dir
  }

  private def eventsDir(rows: Seq[(Long, Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("r5ev").toString
    rows.zipWithIndex.map { case ((u, sec, t), i) =>
      (i.toLong, new Timestamp(1704067200000L + sec * 1000L), u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("r5doc").toString
    rows.map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("rfmSegments: quadrants against the fixed thresholds") {
    // Global max order date is 1995-12-01 (cust 1's 12th order and
    // cust 3's only one). cust 1: monthly orders Jan–Dec → r_days=0,
    // f=12 → champion, revenue 12·10.50 = 126. cust 3: one order on
    // the max date → recent_casual. cust 2: one order 1995-01-01 →
    // r_days = 334 (doy 335 − 1) > 120 and f=1 → dormant.
    val c1 = (1 to 12).map(m => (m.toLong, 1L, "O", 10.50, f"1995-$m%02d-01"))
    val rows = c1 ++ Seq(
      (100L, 2L, "O", 20.00, "1995-01-01"),
      (101L, 3L, "O", 5.25, "1995-12-01"))
    val dir = ordersDir(rows)
    val got = Relational.rfmSegments(spark, dir)
      .as[(String, Long, Long, Double, Long, Long)].collect().toSet
    assert(got == Set(
      ("champion", 1L, 12L, 126.0, 0L, 0L),
      ("dormant", 1L, 1L, 20.0, 334L, 334L),
      ("recent_casual", 1L, 1L, 5.25, 0L, 0L)))
  }

  test("basketPairs: pair support counts distinct parts per order once") {
    // order 100 carries parts {1,2,3} (part 2 on TWO lines — must count
    // once); order 200 carries {2,3} → pair (2,3) support 2, rest 1.
    val dir = lineitemDir(Seq(
      (100L, 1L), (100L, 2L), (100L, 2L), (100L, 3L),
      (200L, 2L), (200L, 3L)))
    val got = Relational.basketPairs(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((2L, 3L, 2L), (1L, 2L, 1L), (1L, 3L, 1L)))
  }

  test("sessionPaths: 3-type prefix per gap session, counted across users") {
    // user 1 session A: a,b,c then a 4th event e inside the session —
    // the path stays the 3-prefix "a>b>c"; 2 hours later a lone d.
    // user 2: a single 'a' session.
    val dir = eventsDir(Seq(
      (1L, 0L, "a"), (1L, 10L, "b"), (1L, 60L, "c"), (1L, 90L, "e"),
      (1L, 7200L, "d"),
      (2L, 0L, "a")))
    val got = Events.sessionPaths(spark, dir)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 1L), ("a>b>c", 1L), ("d", 1L)))
  }

  test("hllDistinct: exact counts, register algebra, estimate formula") {
    // s1: 3 distinct tokens (duplicate 'x' collapses); s2: 1 token.
    val dir = docsDir(Seq(
      (1L, "x y x", "s1"), (2L, "z", "s1"), (3L, "w", "s2")))
    val got = TextOps.hllDistinct(spark, dir)
      .as[(String, Long, Long, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    val (_, n1, sum1, est1, ex1) = got("s1")
    val (_, n2, sum2, est2, ex2) = got("s2")
    assert(ex1 == 3L && ex2 == 1L)
    // ≤ one register per distinct token; at least one register hit
    assert(n1 >= 1 && n1 <= 3 && n2 == 1)
    // reg_sum = hit terms + 2^23 per empty register: bounded both ways
    assert(sum1 >= (64 - n1) * 8388608L + n1 &&
      sum1 < 64L * 8388608L)
    assert(sum2 >= (64 - 1) * 8388608L + 1 && sum2 < 64L * 8388608L)
    // the published estimate is exactly the fixed-point formula
    assert(est1 == 0.709 * 4096.0 * 8388608.0 / sum1.toDouble)
    assert(est2 == 0.709 * 4096.0 * 8388608.0 / sum2.toDouble)
    // more distinct tokens → more register mass → larger estimate
    assert(est1 > est2)
  }

  test("hllDistinct: estimate lands near the exact count at depth") {
    // 500 distinct tokens through 64 registers: m=64 HLL has ~13%
    // stderr; assert the fixed hash family lands within ±40%.
    val text = (0 until 500).map(i => s"tok$i").mkString(" ")
    val dir = docsDir(Seq((1L, text, "s")))
    val r = TextOps.hllDistinct(spark, dir)
      .as[(String, Long, Long, Double, Long)].collect().head
    assert(r._5 == 500L)
    assert(r._4 > 300.0 && r._4 < 700.0,
      s"HLL estimate ${r._4} too far from 500")
  }

  test("srcJaccard: ppm overlap incl. the zero-overlap grid row") {
    // vocab s1={a,b}, s2={b,c}, s3={x}: (s1,s2) → 1/3 = 333333 ppm;
    // both s3 pairs → 0 ppm but PRESENT (grid, not join, drives rows).
    val dir = docsDir(Seq(
      (1L, "a b", "s1"), (2L, "b c", "s2"), (3L, "x", "s3")))
    val got = TextOps.srcJaccard(spark, dir)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("s1", "s2", 2L, 2L, 1L, 333333L),
      ("s1", "s3", 2L, 1L, 0L, 0L),
      ("s2", "s3", 2L, 1L, 0L, 0L)))
  }

  test("lenZscore: integer inequality picks exactly the 1.5σ outlier") {
    // source s: eight 10-token docs + one 30-token doc. n=9, s1=110,
    // s2=1700 → varn = 9·1700 − 110² = 3200. For x=30: dd=160,
    // 4·dd²=102400 ≥ 9·varn=28800 → outlier, z = 160/√3200 ≈ 2.828.
    // For x=10: dd=−20, 4·400=1600 < 28800 → kept out.
    // z_micro: dd²·10⁶ DIV varn = 2.56·10¹⁰ DIV 3200 = 8·10⁶ (z² = 8
    // exactly), isqrt(8·10¹²) = ⌊2828427.12⌋ = 2828427.
    val ten = (1 to 10).map(_ => "t").mkString(" ")
    val thirty = (1 to 30).map(_ => "t").mkString(" ")
    val rows = (1L to 8L).map(i => (i, ten, "s")) :+ (9L, thirty, "s")
    val dir = docsDir(rows)
    val got = TextOps.lenZscore(spark, dir)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq((9L, "s", 30L, 2828427L)))
  }

  test("reorderGaps: weekly buckets of per-customer order gaps") {
    // cust 1: Jan 1 → Jan 8 (gap 7 d = bucket 1) → Jan 10 (gap 2 d =
    // bucket 0); cust 2: Jan 1 → Mar 1 (gap 59 d = bucket 8).
    val dir = ordersDir(Seq(
      (1L, 1L, "O", 1.0, "1995-01-01"), (2L, 1L, "O", 1.0, "1995-01-08"),
      (3L, 1L, "O", 1.0, "1995-01-10"),
      (4L, 2L, "O", 1.0, "1995-01-01"), (5L, 2L, "O", 1.0, "1995-03-01")))
    val got = Relational.reorderGaps(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 1L, 1L), (1L, 1L, 1L), (8L, 1L, 1L)))
  }

  test("shipPriority: open revenue only for pre-cutoff orders") {
    val odir = java.nio.file.Files.createTempDirectory("r5sp").toString
    Seq(
      // order 1: placed before the cutoff → eligible
      (1L, 1L, "O", 100.0, Timestamp.valueOf("1997-06-01 00:00:00"), "1-URGENT"),
      // order 2: placed after the cutoff → excluded outright
      (2L, 1L, "O", 100.0, Timestamp.valueOf("1998-03-01 00:00:00"), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$odir/orders.parquet")
    Seq(
      // ships after the cutoff: counts, rev = 100·(1−0.1) = 90
      (1L, 1L, 1L, 1, 1.0, 100.0, 0.1, 0.0, "N", "O",
        Timestamp.valueOf("1998-02-01 00:00:00")),
      // shipped before the cutoff: already delivered, excluded
      (1L, 2L, 1L, 2, 1.0, 50.0, 0.0, 0.0, "N", "O",
        Timestamp.valueOf("1997-07-01 00:00:00")),
      // order 2's line ships late but its order is post-cutoff
      (2L, 3L, 1L, 1, 1.0, 70.0, 0.0, 0.0, "N", "O",
        Timestamp.valueOf("1998-06-01 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$odir/lineitem.parquet")
    val got = Relational.shipPriority(spark, odir)
      .as[(Long, Timestamp, String, Double)].collect().toSeq
    assert(got == Seq(
      (1L, Timestamp.valueOf("1997-06-01 00:00:00"), "1-URGENT", 90.0)))
  }

  test("sessionAbandon: per-user view→purchase conversion by session") {
    // user 1: [view, click] abandoned; 2 h later [view, purchase]
    // converted; 4 h later [click] not a view session → n=3, view=2,
    // abandoned=1, ppm=500000. user 2: [purchase] → view=0, ppm NULL.
    val dir = eventsDir(Seq(
      (1L, 0L, "view"), (1L, 10L, "click"),
      (1L, 7200L, "view"), (1L, 7210L, "purchase"),
      (1L, 14400L, "click"),
      (2L, 0L, "purchase")))
    val got = Events.sessionAbandon(spark, dir)
      .as[(Long, Long, Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 2L, 1L, Some(500000L)),
      (2L, 1L, 0L, 0L, None)))
  }

  test("weightedSample: deterministic, sorted, and weight-biased") {
    // 100 one-token docs vs 100 hundred-token docs: selection clocks
    // −ln(u)/w favor large w 100:1, so the 50-sample must be dominated
    // by heavy docs; the draw must replay bit-identically.
    val heavy = (1 to 100).map(_ => "t").mkString(" ")
    val rows = (0L until 100L).map(i => (i, "t", "light")) ++
      (100L until 200L).map(i => (i, heavy, "heavy"))
    val dir = docsDir(rows)
    val a = TextOps.weightedSample(spark, dir)
      .as[(Long, String, Long, Long)].collect().toSeq
    val b = TextOps.weightedSample(spark, dir)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(a == b)
    assert(a.length == TextOps.WeightedSampleK)
    // output arrives in (key_fp, doc_id) rank order
    assert(a == a.sortBy(r => (r._4, r._1)))
    val nHeavy = a.count(_._2 == "heavy")
    assert(nHeavy > 40, s"expected heavy-dominated sample, got $nHeavy/50")
  }

  test("dauStickiness: trailing-7-day actives and floor-ppm ratio") {
    // Fixture epoch is midnight UTC. u1 active day 0 only; u2 active
    // days 0 and 3. DAU: d0=2, d3=1. WAU(d0)={u1,u2}=2;
    // WAU(d3)={u1 (d0 within 7), u2}=2 → d0 ppm 1000000, d3 500000.
    val dir = eventsDir(Seq(
      (1L, 0L, "view"), (2L, 0L, "view"), (2L, 259200L, "click")))
    val base = 1704067200000000L / Events.DayUs
    val got = Events.dauStickiness(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (base, 2L, 2L, 1000000L),
      (base + 3, 1L, 2L, 500000L)))
  }

  test("errorBurst: three errors inside the 6 h window start a burst") {
    // u1 errors at 0/100/250/30000 s: the 0 s event sees {0,100,250}
    // in its 21600 s lookahead → the only burst start (n5=3; the
    // 30000 s straggler is outside every earlier window). u2's pair of
    // errors never reaches 3. Non-error events are invisible.
    val dir = eventsDir(Seq(
      (1L, 0L, "error"), (1L, 10L, "view"), (1L, 100L, "error"),
      (1L, 250L, "error"), (1L, 30000L, "error"),
      (2L, 0L, "error"), (2L, 50L, "error")))
    val got = Events.errorBurst(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 1704067200000000L, 3L)))
  }

  test("peakHours: UTC hour-of-day shares in floor ppm") {
    // type a: hours 0,0,1 → (a,0) 2/3 = 666666 ppm, (a,1) 333333;
    // type b: hour 5 → 1000000.
    val dir = eventsDir(Seq(
      (1L, 0L, "a"), (2L, 60L, "a"), (1L, 3600L, "a"),
      (1L, 5L * 3600L, "b")))
    val got = Events.peakHours(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", 0L, 2L, 666666L), ("a", 1L, 1L, 333333L),
      ("b", 5L, 1L, 1000000L)))
  }

  private def embDir(rows: Seq[(Long, Seq[Float], Int)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("r5emb").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("centroidMargin: micro-quantized pair distance and radii") {
    // label 0: (1,0),(1,0.2) → centroid (1, 0.1), both members at
    // squared radius 0.01 → r2_u = 10000 µ. label 1: single (−1,0) →
    // radius 0. Pair distance (1−(−1))² + 0.1² → 4010000 µ.
    val dir = embDir(Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(1.0f, 0.2f), 0),
      (3L, Seq(-1.0f, 0.0f), 1)))
    val got = graft.engine.Similarity.centroidMargin(spark, dir)
      .as[(Int, Int, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0, 1, 4010000L, 10000L, 0L, 4010000L * 1000000L / 10001L)))
  }

  test("labelConfusion: nearest-centroid classification is diagonal") {
    val dir = embDir(Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(1.0f, 0.2f), 0),
      (3L, Seq(-1.0f, 0.0f), 1)))
    val got = graft.engine.Similarity.labelConfusion(spark, dir)
      .as[(Int, Int, Long)].collect().toSeq
    assert(got == Seq((0, 0, 2L), (1, 1, 1L)))
  }

  test("cumShare: decile cumulative revenue shares over exact cents") {
    // Spends: c1 400 (150+250), c2 300, c3 200, c4 100 → total 1000.
    // 4 customers over ntile(10) → singleton deciles 1..4; cumulative
    // shares 40/70/90/100%.
    val dir = ordersDir(Seq(
      (1L, 1L, "O", 150.0, "1995-01-01"), (2L, 1L, "O", 250.0, "1995-02-01"),
      (3L, 2L, "O", 300.0, "1995-01-01"),
      (4L, 3L, "O", 200.0, "1995-01-01"),
      (5L, 4L, "O", 100.0, "1995-01-01")))
    val got = Relational.cumShare(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 40000L, 400000L), (2L, 1L, 70000L, 700000L),
      (3L, 1L, 90000L, 900000L), (4L, 1L, 100000L, 1000000L)))
  }

  test("convertWindow: conversions per attribution window, floor ppm") {
    // u1 purchases 30 min after first view (all windows); u2 at 2 h
    // (6 h and 24 h only); u3 never; u4 has no view at all and is not
    // a viewer. 1 h: 1/3 = 333333 ppm; 6 h and 24 h: 2/3 = 666666.
    val dir = eventsDir(Seq(
      (1L, 0L, "view"), (1L, 1800L, "purchase"),
      (2L, 0L, "view"), (2L, 7200L, "purchase"),
      (3L, 0L, "view"),
      (4L, 0L, "purchase")))
    val got = Events.convertWindow(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 1L, 333333L),
      (6L, 3L, 2L, 666666L),
      (24L, 3L, 2L, 666666L)))
  }

  test("mixTokens: uniform budget split, capped and uncapped rates") {
    // Budget 20000 over 2 sources → target 10000 each. s1 supplies
    // 20001 tokens → rate 10⁷⁰/20001 = 499975 ppm, expected yield
    // 20001·499975 div 10⁶ = 9999. s2 supplies 1 token → capped at
    // 10⁶ ppm, yield 1.
    val dir = docsDir(Seq(
      (1L, ("x " * 20000) + "y", "s1"),
      (2L, "z", "s2")))
    val got = TextOps.mixTokens(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("s1", 20001L, 10000L, 499975L, 9999L),
      ("s2", 1L, 10000L, 1000000L, 1L)))
  }

  test("mixTokens: a null source is a budget recipient, so it divides " +
      "the budget") {
    // {null, s1} are TWO per-source groups → target 20000/2 = 10000
    // each. countDistinct would divide by 1 and oversubscribe.
    val dir = docsDir(Seq((1L, "a b", "s1"), (2L, "c", null)))
    val got = TextOps.mixTokens(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (null, 1L, 10000L, 1000000L, 1L),
      ("s1", 2L, 10000L, 1000000L, 2L)))
  }
}
