package graft

import java.sql.Timestamp
import graft.engine.Events

/** Unit tests for the event-sequence operators: attribution, transition
  * matrix, gaps-and-islands, decay scoring. */
class EventSeqSpec extends SparkSpec {
  import spark.implicits._

  /** events.parquet with a fixed minute-spaced timeline per tuple
    * (user_id, minute offset, event_type). */
  private def eventsDir(rows: Seq[(Long, Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("evseq").toString
    rows.zipWithIndex.map { case ((u, min, t), i) =>
      (i.toLong, new Timestamp(1704067200000L + min * 60000L), u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  test("userAttrib: first/last touch strictly before the first purchase") {
    val dir = eventsDir(Seq(
      (1L, 0L, "view"), (1L, 1L, "click"), (1L, 2L, "purchase"),
      (1L, 3L, "view"), // after purchase — must not count
      (2L, 0L, "signup"), (2L, 5L, "purchase"),
      (3L, 0L, "view"))) // no purchase — excluded entirely
    val got = Events.userAttrib(spark, dir)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("view", "click", 1L), ("signup", "signup", 1L)))
  }

  test("eventTrans: pair counts and ppm floor division") {
    val dir = eventsDir(Seq(
      (1L, 0L, "view"), (1L, 1L, "click"), (1L, 2L, "view"),
      (2L, 0L, "view"), (2L, 1L, "click")))
    val got = Events.eventTrans(spark, dir)
      .as[(String, String, Long, Long)].collect().toSet
    // view→click ×2, click→view ×1; from 'view' total 2, from 'click' 1
    assert(got == Set(
      ("view", "click", 2L, 1000000L),
      ("click", "view", 1L, 1000000L)))
  }

  test("eventTrans: ppm splits on branching transitions") {
    val dir = eventsDir(Seq(
      (1L, 0L, "view"), (1L, 1L, "click"),
      (2L, 0L, "view"), (2L, 1L, "error"),
      (3L, 0L, "view"), (3L, 1L, "error")))
    val m = Events.eventTrans(spark, dir)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(m(("view", "click")) == (1L, 333333L)) // floor(1e6/3)
    assert(m(("view", "error")) == (2L, 666666L))
  }

  test("activeIslands: streak grouping over day gaps") {
    val day = 24 * 60L
    // user 1: days 0,1,2 then 5,6 → islands of 3 and 2
    // user 2: day 0 only (two events same day collapse)
    val dir = eventsDir(Seq(
      (1L, 0L, "view"), (1L, day, "view"), (1L, 2 * day, "view"),
      (1L, 5 * day, "view"), (1L, 6 * day, "view"),
      (2L, 10L, "view"), (2L, 20L, "view")))
    val got = Events.activeIslands(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 3L, 5L), (2L, 1L, 1L, 1L)))
  }

  test("decayScore: halving weights, zero beyond the cap") {
    val day = 24 * 60L
    // ref_day = 25 (user 2's event). user 1: ages 25 (beyond cap → 0),
    // 24 (beyond cap → 0), 1 (500000), 0 (1000000)
    val dir = eventsDir(Seq(
      (1L, 0L, "view"), (1L, day, "view"),
      (1L, 24 * day, "view"), (1L, 25 * day, "view"),
      (2L, 25 * day, "click")))
    val got = Events.decayScore(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 4L, 1500000L), (2L, 1L, 1000000L)))
  }
}
