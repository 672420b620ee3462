package graft

import java.sql.Timestamp
import graft.engine.Relational

/** Hand-computed verification for the round-5 trade-analytics widening
  * (the TPC-H-shaped Q7/Q8/Q10/Q11/Q14/top-k family plus the EWMA
  * kernel). The DuckDB differential proves cross-engine agreement;
  * these prove the VALUES on a two-nation micro-warehouse. */
class TradeOpsSpec extends SparkSpec {
  import spark.implicits._

  /** A complete two-nation star schema:
    * regions R0=ASIA / R1=EUROPE; NATION_3 in ASIA, NATION_7 in EUROPE;
    * one supplier and one customer in each nation; two orders
    * (o1: cust c1 1996-02-01, o2: cust c2 1997-03-01); parts p1=PROMO,
    * p2=STANDARD; four line items with hand-traceable revenue:
    *   l1: o1 s1 p1 ship 1996-06-01 price 100.00 disc 0.10 → rev  90.00
    *   l2: o1 s2 p2 ship 1997-06-01 price  50.00 disc 0.00 → rev  50.00  (R)
    *   l3: o2 s1 p1 ship 1998-06-01 price  30.00 disc 0.00 → rev  30.00  (R)
    *   l4: o2 s2 p2 ship 1996-03-01 price  10.00 disc 0.50 → rev   5.00
    */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("trade").toString
    Seq((0, "ASIA"), (1, "EUROPE"))
      .toDF("r_regionkey", "r_name").write.parquet(s"$d/region.parquet")
    Seq((0, "NATION_3", 0), (1, "NATION_7", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.parquet(s"$d/nation.parquet")
    Seq((1L, "S1", 0, 10.0), (2L, "S2", 1, 20.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.parquet(s"$d/supplier.parquet")
    Seq((1L, "C1", 0, 5.0, "BUILDING"), (2L, "C2", 1, 6.0, "AUTOMOBILE"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment").write.parquet(s"$d/customer.parquet")
    Seq((1L, "P1", "Brand#1", "PROMO", 1, 100.0),
      (2L, "P2", "Brand#2", "STANDARD", 2, 50.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice").write.parquet(s"$d/part.parquet")
    Seq((10L, 1L, "F", 150.0, ts("1996-02-01"), "1-URGENT"),
      (20L, 2L, "F", 35.0, ts("1997-03-01"), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority").write.parquet(s"$d/orders.parquet")
    Seq(
      li(10L, 1L, 1L, 1, 100.00, 0.10, "N", "1996-06-01"),
      li(10L, 2L, 2L, 2, 50.00, 0.00, "R", "1997-06-01"),
      li(20L, 1L, 1L, 1, 30.00, 0.00, "R", "1998-06-01"),
      li(20L, 2L, 2L, 2, 10.00, 0.50, "N", "1996-03-01"))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$d/lineitem.parquet")
    d
  }

  private def ts(s: String) = Timestamp.valueOf(s"$s 00:00:00")

  private def li(ok: Long, pk: Long, sk: Long, ln: Int, price: Double,
      disc: Double, rf: String, ship: String) =
    (ok, pk, sk, ln, 1.0, price, disc, 0.0, rf, "O", ts(ship))

  test("tradeMatrix: nation-pair revenue inside the ship window only") {
    // l3 ships 1998-06-01 — outside [1996, 1998) — and must not appear.
    val got = Relational.tradeMatrix(spark, dir)
      .as[(String, String, Long, Double, Long)].collect().toSeq
    assert(got == Seq(
      ("NATION_3", "NATION_3", 1996L, 90.0, 1L),
      ("NATION_7", "NATION_3", 1997L, 50.0, 1L),
      ("NATION_7", "NATION_7", 1996L, 5.0, 1L)))
  }

  test("mktShare: ppm of ASIA-customer revenue supplied by NATION_3") {
    // Only o1 (cust c1, NATION_3 ∈ ASIA) qualifies; its items are l1
    // (s1 = NATION_3, 90.00 → 900000 units) and l2 (s2 = NATION_7,
    // 50.00 → 500000). share = 900000·10⁶ div 1400000 = 642857.
    val got = Relational.mktShare(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1996L, 900000L, 1400000L, 642857L)))
  }

  test("returnedRevenue: only 'R' items, ranked by returned revenue") {
    val got = Relational.returnedRevenue(spark, dir)
      .as[(Long, String, String, Double, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "C1", "NATION_3", 50.0, 1L),
      (2L, "C2", "NATION_7", 30.0, 1L)))
  }

  test("promoShare: per-month ppm of PROMO-part revenue") {
    val got = Relational.promoShare(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("1996-03", 0L, 50000L, 0L),          // l4: STANDARD only
      ("1996-06", 900000L, 900000L, 1000000L), // l1: all PROMO
      ("1997-06", 0L, 500000L, 0L),          // l2: STANDARD only
      ("1998-06", 300000L, 300000L, 1000000L))) // l3: all PROMO
  }

  test("partValueConc: per-part share against the broadcast total") {
    // p1 = 90+30 = 120.00 → 1200000 units, p2 = 50+5 → 550000;
    // total 1750000. Both clear the 1/2000 bar at this size.
    val got = Relational.partValueConc(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1200000L, 2L, 685714L),
      (2L, 550000L, 2L, 314285L)))
  }

  test("suppRank: per-nation top suppliers by lifetime revenue") {
    val got = Relational.suppRank(spark, dir)
      .as[(String, Long, Long, String, Long)].collect().toSeq
    assert(got == Seq(
      ("NATION_3", 1L, 1L, "S1", 1200000L),
      ("NATION_7", 1L, 2L, "S2", 550000L)))
  }

  test("ewmaVolume: power-of-two kernel over trailing days, exact") {
    // Orders: two on 1990-01-01 (dd=0), one on 1990-01-02 (dd=1).
    // ewma(0) = 2·2⁰ = 2.0; ewma(1) = 1·2⁰ + 2·2⁻¹ = 2.0.
    val d = java.nio.file.Files.createTempDirectory("ewma").toString
    Seq((1L, 1L, "O", 1.0, ts("1990-01-01"), "1-URGENT"),
      (2L, 1L, "O", 1.0, ts("1990-01-01"), "1-URGENT"),
      (3L, 2L, "O", 1.0, ts("1990-01-02"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority").write.parquet(s"$d/orders.parquet")
    val got = Relational.ewmaVolume(spark, d)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((0L, 2L, 2.0), (1L, 1L, 2.0)))
  }

  test("localSupp: only customer-nation == supplier-nation revenue") {
    // l1 (s1→c1, both NATION_3, 90.00) and l4 (s2→c2, both NATION_7,
    // 5.00) are local; l2/l3 cross nations and must not appear.
    val got = Relational.localSupp(spark, dir)
      .as[(String, Double, Long)].collect().toSeq
    assert(got == Seq(("NATION_3", 90.0, 1L), ("NATION_7", 5.0, 1L)))
  }

  test("discountRev: empty band → null revenue, zero items") {
    // fixture discounts are 0.10/0.00/0.00/0.50 — none in [0.05, 0.07]
    val got = Relational.discountRev(spark, dir)
      .as[(Option[Double], Long)].collect().toSeq
    assert(got == Seq((None, 0L)))
  }

  test("custOrderDist: count-of-counts including the left join") {
    // both customers placed exactly one order
    val got = Relational.custOrderDist(spark, dir)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L)))
  }

  test("idleRich: above-average balance, no recent order") {
    // positive balances 5.00 (c1) and 6.00 (c2): only c2 clears the
    // cross-multiplied average test (1200 > 1100); its last order is
    // 1997 → idle. c1 is below average and excluded.
    val got = Relational.idleRich(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("NATION_7", 1L, 600L)))
  }

  test("smallQty: no line under 20% of its part average on unit lots") {
    // every fixture line has quantity 1.0, so no line is under 20% of
    // its part's average
    val got = Relational.smallQty(spark, dir)
      .as[(Option[Double], Long)].collect().toSeq
    assert(got == Seq((None, 0L)))
  }

  test("largeOrders: orders above 300 total units with customer") {
    val d = java.nio.file.Files.createTempDirectory("lo").toString
    Seq((10L, 1L, 1L, 1, 200.0, 10.0, 0.0, 0.0, "N", "O", ts("1995-01-01")),
      (10L, 2L, 1L, 2, 150.0, 10.0, 0.0, 0.0, "N", "O", ts("1995-01-01")),
      (20L, 1L, 1L, 1, 10.0, 10.0, 0.0, 0.0, "N", "O", ts("1995-01-01")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$d/lineitem.parquet")
    Seq((10L, 1L, "O", 400.0, ts("1995-01-01"), "1-URGENT"),
      (20L, 1L, "O", 30.0, ts("1995-02-01"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority").write.parquet(s"$d/orders.parquet")
    Seq((1L, "C1", 0, 5.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment").write.parquet(s"$d/customer.parquet")
    val got = Relational.largeOrders(spark, d)
      .as[(Long, String, Long, java.sql.Timestamp, Double, Double)]
      .collect().toSeq
    assert(got == Seq((1L, "C1", 10L, ts("1995-01-01"), 400.0, 350.0)))
  }

  test("dqDims: raw-dimension audit counts planted anomalies") {
    // customer: one duplicate PK, one null PK, one null FK among 4 rows;
    // the other dims are single clean rows.
    val d = java.nio.file.Files.createTempDirectory("dq").toString
    Seq((java.lang.Long.valueOf(1L), "C1", Integer.valueOf(0), 1.0, "S"),
      (java.lang.Long.valueOf(1L), "C1b", Integer.valueOf(0), 1.0, "S"),
      (java.lang.Long.valueOf(2L), "C2", null.asInstanceOf[Integer], 1.0, "S"),
      (null.asInstanceOf[java.lang.Long], "C3", Integer.valueOf(0), 1.0, "S"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment").write.parquet(s"$d/customer.parquet")
    Seq((1L, "S1", 0, 1.0)).toDF("s_suppkey", "s_name", "s_nationkey",
      "s_acctbal").write.parquet(s"$d/supplier.parquet")
    Seq((1L, "P1", "B", "T", 1, 1.0)).toDF("p_partkey", "p_name",
      "p_brand", "p_type", "p_size", "p_retailprice")
      .write.parquet(s"$d/part.parquet")
    Seq((0, "N0", 0)).toDF("n_nationkey", "n_name", "n_regionkey")
      .write.parquet(s"$d/nation.parquet")
    Seq((0, "R0")).toDF("r_regionkey", "r_name")
      .write.parquet(s"$d/region.parquet")
    val got = Relational.dqDims(spark, d)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("customer", 4L, 1L, 1L, 1L),
      ("nation", 1L, 0L, 0L, 0L),
      ("part", 1L, 0L, 0L, 0L),
      ("region", 1L, 0L, 0L, 0L),
      ("supplier", 1L, 0L, 0L, 0L)))
  }

  test("cohortLtv: first-order-month cohorts × month offsets, exact cents") {
    // c1 first orders 1995-01 (mo 23940): offset 0 has one 10.50 order,
    // offset 1 has two (21.00 total). c2's single order starts the
    // 1995-02 cohort.
    val d = java.nio.file.Files.createTempDirectory("ltv").toString
    Seq((1L, 1L, "O", 10.50, ts("1995-01-15"), "1-URGENT"),
      (2L, 1L, "O", 10.50, ts("1995-02-01"), "1-URGENT"),
      (3L, 1L, "O", 10.50, ts("1995-02-20"), "1-URGENT"),
      (4L, 2L, "O", 7.25, ts("1995-02-10"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority").write.parquet(s"$d/orders.parquet")
    val got = Relational.cohortLtv(spark, d)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (23940L, 0L, 1L, 1050L),
      (23940L, 1L, 1L, 2100L),
      (23941L, 0L, 1L, 725L)))
  }

  test("basketRules: directed confidences over distinct-part baskets") {
    // o100 = {1,2,3} (part 2 on two lines — counted once), o200 = {2,3}:
    // pair (2,3) supports 2 of 2 baskets; parts 2 and 3 each appear in
    // 2 baskets, part 1 in one.
    val d = java.nio.file.Files.createTempDirectory("rules").toString
    Seq((100L, 1L), (100L, 2L), (100L, 2L), (100L, 3L),
      (200L, 2L), (200L, 3L)).zipWithIndex.map { case ((ok, pk), i) =>
      (ok, pk, 1L, i + 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ts("1995-01-01"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$d/lineitem.parquet")
    val got = Relational.basketRules(spark, d)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (2L, 3L, 2L, 2L, 2L, 2L, 1000000L, 1000000L),
      (1L, 2L, 1L, 1L, 2L, 2L, 1000000L, 500000L),
      (1L, 3L, 1L, 1L, 2L, 2L, 1000000L, 500000L)))
  }
}
