package graft

import graft.engine.Events
import org.apache.spark.sql.functions.{col, unix_micros}

class EventsSpec extends SparkSpec {
  import spark.implicits._

  test("sessionizeUs: one >30-min gap splits into two sessions (FIXTURES.md micro)") {
    val m = 60L * 1000 * 1000 // one minute in µs
    val df = Seq(
      (1L, 1L, 0 * m, 1.0), (1L, 2L, 5 * m, 2.0), (1L, 3L, 10 * m, 3.0),
      (1L, 4L, 50 * m, 4.0), // 40-min gap → new session
      (1L, 5L, 55 * m, 5.0)
    ).toDF("user_id", "event_id", "us", "value")
    val out = Events.sessionizeUs(df, 30 * m).orderBy("sid")
      .select("sid", "n_events", "start_us", "end_us")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L, 0L, 10 * m), (2L, 2L, 50 * m, 55 * m)))
  }

  test("sessionizeUs: gap exactly at threshold stays in-session (strict >)") {
    val df = Seq((7L, 1L, 0L, 1.0), (7L, 2L, 100L, 1.0))
      .toDF("user_id", "event_id", "us", "value")
    assert(Events.sessionizeUs(df, 100L).count() == 1)
    assert(Events.sessionizeUs(df, 99L).count() == 2)
  }

  test("events source truncates nanos to micros as integers") {
    val e = graft.engine.Sources.events(spark, sf)
    // ts column must be a (µs) timestamp type, usable in date_trunc
    val n = e.selectExpr("date_trunc('hour', ts)").count()
    assert(n == e.count() && n > 0)
  }

  test("rangeJoin (bucketed) equals the naive inequality join") {
    import org.apache.spark.sql.functions._
    val W = 10L * 60 * 1000 * 1000
    val e = graft.engine.Sources.events(spark, sf)
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
    val err = e.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("us").as("eus"))
    val clk = e.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("us").as("cus"))
    val naive = err
      .join(clk, col("cu") === col("user_id") &&
        col("cus") > col("eus") && col("cus") <= col("eus") + W, "left")
      .groupBy("event_id", "user_id")
      .agg(count(col("cus")).as("n_clicks"))
      .select("event_id", "user_id", "n_clicks")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bucketed = Events.rangeJoin(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(bucketed == naive && bucketed.nonEmpty)
  }

  test("eventsFunnel: monotone stages matching a per-user reference fold") {
    val rows = Events.eventsFunnel(spark, sf)
      .select("stage", "n_users", "conv")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == Seq("0_users", "1_view",
      "2_click_after_view", "3_purchase_after_click"))
    // funnel stages can only shrink, and conv is n/n0
    rows.sliding(2).foreach { case Array(a, b) => assert(b._2 <= a._2)
    case _ => () }
    assert(rows.head._3 == 1.0)
    // reference: per-user scan of the raw events
    val evs = graft.engine.Sources.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")))
      .as[(Long, String, Long)].collect().groupBy(_._1)
    var (nV, nC, nP) = (0L, 0L, 0L)
    evs.values.foreach { es =>
      val t1 = es.filter(_._2 == "view").map(_._3).minOption
      val t2 = t1.flatMap(t => es.filter(e => e._2 == "click" && e._3 > t)
        .map(_._3).minOption)
      val t3 = t2.flatMap(t => es.filter(e => e._2 == "purchase" && e._3 > t)
        .map(_._3).minOption)
      if (t1.isDefined) nV += 1
      if (t2.isDefined) nC += 1
      if (t3.isDefined) nP += 1
    }
    assert(rows(0)._2 == evs.size.toLong)
    assert(rows(1)._2 == nV && rows(2)._2 == nC && rows(3)._2 == nP)
  }

  test("retention: week-0 equals cohort size; offsets non-negative") {
    val rows = Events.retention(spark, sf)
      .select("cohort_wk", "wk_offset", "n_active")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 0))
    // reference cohort sizes from the raw events
    val wk = Events.WeekUs
    val cohortOf = graft.engine.Sources.events(spark, sf)
      .filter(col("event_type") === "signup")
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")))
      .as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).min / wk).toMap
    val sizes = cohortOf.values.groupBy(identity).view.mapValues(_.size.toLong)
    // every cohort's week-0 row counts exactly its members (each member's
    // signup event itself is active in week 0)
    rows.filter(_._2 == 0L).foreach { case (cw, _, n) =>
      assert(n == sizes(cw), s"cohort $cw week-0")
    }
    // later weeks can never exceed the cohort size
    rows.foreach { case (cw, _, n) => assert(n <= sizes(cw)) }
  }
}
