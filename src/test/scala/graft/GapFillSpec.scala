package graft

import java.sql.Timestamp
import graft.engine.{Events, Similarity}

/** Unit tests for gap-fill (LOCF), hard-negative mining and the
  * similarity histogram. */
class GapFillSpec extends SparkSpec {
  import spark.implicits._

  private def eventsDir(rows: Seq[(Long, Timestamp, Long, String, Double, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("gapfill").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  private def ts(day: Int, h: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  test("gapFill: missing days carry the last observed count forward") {
    // user 1 active on days 1 (2 events), 4 (1 event) — days 2,3 filled
    val dir = eventsDir(Seq(
      (1L, ts(1, 1), 1L, "view", 1.0, "{}"),
      (2L, ts(1, 2), 1L, "view", 1.0, "{}"),
      (3L, ts(4, 3), 1L, "buy", 2.0, "{}")))
    val got = Events.gapFill(spark, dir)
      .as[(Long, Long, Long, Long, Boolean, Boolean)].collect().toSeq
    val days = got.map(_._2)
    assert(days == days.sorted && days.length == 4)
    // (n_obs, n_fill, filled) per day in order
    assert(got.map(t => (t._3, t._4, t._5)) == Seq(
      (2L, 2L, false), (0L, 2L, true), (0L, 2L, true), (1L, 1L, false)))
    assert(got.forall(!_._6), "unclamped span must not be flagged")
  }

  test("gapFill: single-day user emits one unfilled row") {
    val dir = eventsDir(Seq((1L, ts(7), 9L, "view", 1.0, "{}")))
    val got = Events.gapFill(spark, dir)
      .as[(Long, Long, Long, Long, Boolean, Boolean)].collect().toSeq
    assert(got.map(t => (t._1, t._3, t._4, t._5, t._6)) ==
      Seq((9L, 1L, 1L, false, false)))
  }

  test("gapFill: users fill independently") {
    val dir = eventsDir(Seq(
      (1L, ts(1), 1L, "view", 1.0, "{}"),
      (2L, ts(3), 1L, "view", 1.0, "{}"),
      (3L, ts(2), 2L, "view", 1.0, "{}")))
    val got = Events.gapFill(spark, dir)
      .as[(Long, Long, Long, Long, Boolean, Boolean)].collect().toSeq
    assert(got.count(_._1 == 1L) == 3) // days 1..3
    assert(got.count(_._1 == 2L) == 1) // day 2 only
    assert(got.filter(_._1 == 1L).map(_._5) == Seq(false, true, false))
  }

  test("gapFill: decades-wide span is clamped to GapFillMaxSpanDays") {
    val span = Events.GapFillMaxSpanDays
    // user 1 active on day 0 and ~4 years later — without the clamp the
    // grid would be ~1461 rows; with it, exactly GapFillMaxSpanDays.
    // The far-future observed day falls outside the clamped grid.
    val farMs = (span + 730L) * 86400000L
    val dir = eventsDir(Seq(
      (1L, new Timestamp(0L), 1L, "view", 1.0, "{}"),
      (2L, new Timestamp(farMs), 1L, "view", 1.0, "{}")))
    val got = Events.gapFill(spark, dir)
      .as[(Long, Long, Long, Long, Boolean, Boolean)].collect().toSeq
    assert(got.length == span.toInt,
      s"grid must clamp to $span rows, got ${got.length}")
    assert(got.map(_._2).max == span - 1, "grid ends at d0 + span - 1")
    // first day observed, every later day filled from it
    assert(got.count(!_._5) == 1 && got.forall(_._4 == 1L))
    assert(got.forall(_._6),
      "every row of a truncated user must carry the clamped flag")
  }

  test("gapFill: clamp off-by-one edges — d0+729 inside, d0+730 outside") {
    val span = Events.GapFillMaxSpanDays // 730: grid covers d0..d0+729
    // user 1: activity at exactly d0 and d0+729 — the LAST grid day.
    // Full grid, nothing dropped, clamped must be FALSE.
    // user 2: activity at exactly d0 and d0+730 — one past the edge.
    // Same 730-day grid, the far day is dropped, clamped TRUE on
    // every row and no row carries its observation.
    val dir = eventsDir(Seq(
      (1L, new Timestamp(0L), 1L, "view", 1.0, "{}"),
      (2L, new Timestamp((span - 1) * 86400000L), 1L, "view", 1.0, "{}"),
      (3L, new Timestamp(0L), 2L, "view", 1.0, "{}"),
      (4L, new Timestamp(span * 86400000L), 2L, "view", 1.0, "{}")))
    val got = Events.gapFill(spark, dir)
      .as[(Long, Long, Long, Long, Boolean, Boolean)].collect().toSeq
    val u1 = got.filter(_._1 == 1L)
    val u2 = got.filter(_._1 == 2L)
    assert(u1.length == span.toInt && u2.length == span.toInt)
    assert(u1.forall(!_._6), "d0+729 activity is inside the grid: not clamped")
    assert(u1.count(_._3 > 0) == 2, "both observations inside the grid")
    assert(u1.map(_._2).max == span - 1)
    assert(u2.forall(_._6), "d0+730 activity is outside: every row flagged")
    assert(u2.count(_._3 > 0) == 1, "the far observation is dropped")
    assert(u2.map(_._2).max == span - 1, "grid still ends at d0+729")
  }

  test("hardNegatives: nearest different-label vectors, never same label") {
    val dir = java.nio.file.Files.createTempDirectory("hardneg").toString
    // 64-dim one-hot-ish vectors: queries 0..15 all label 0 except 1;
    // corpus has label-1 vectors at varying similarity to query 0
    def vec(hot: Int, v: Float = 1f): Array[Float] = {
      val a = Array.fill(64)(0.001f); a(hot) = v; a
    }
    val rows = (0 until 16).map { i =>
      (i.toLong, vec(i % 8), 0)
    } ++ Seq(
      (100L, vec(0), 1), // near-identical to query 0, label 1
      (101L, vec(32), 1),
      (102L, vec(33), 2))
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = Similarity.hardNegatives(spark, dir)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    // every returned negative has a label different from its query's
    assert(got.forall(t => t._4 != t._2))
    // query 0 (label 0): closest different-label vector is 100
    val q0 = got.filter(_._1 == 0L).sortBy(_._5)
    assert(q0.head._3 == 100L, s"q0 negatives: ${q0.toSeq}")
    // rank 1 cosine ≥ rank 2 ≥ rank 3 within each query
    got.groupBy(_._1).values.foreach { g =>
      val byRank = g.sortBy(_._5).map(_._6)
      assert(byRank.zip(byRank.tail).forall { case (x, y) => x >= y })
    }
  }

  test("simHist: identical vectors land in the top decile") {
    val dir = java.nio.file.Files.createTempDirectory("simhist").toString
    def vec(hot: Int): Array[Float] = {
      val a = Array.fill(64)(0.001f); a(hot) = 1f; a
    }
    // three copies of the same direction + one distinct → the three
    // identical pairs score cos≈1 (decile 9)
    val rows = Seq(
      (1L, vec(0), 0), (2L, vec(0), 0), (3L, vec(0), 0), (4L, vec(40), 0))
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = Similarity.simHist(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got.getOrElse(9L, 0L) >= 3L, s"histogram: $got")
    // decile values stay within the clamp
    assert(got.keys.forall(d => d >= -10L && d <= 9L))
  }
}
