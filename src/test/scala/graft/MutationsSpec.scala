package graft

import org.apache.spark.sql.functions._
import graft.engine.Mutations

class MutationsSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (4, "d", 4.0)
  ).toDF("k", "name", "v")

  private def updates = Seq(
    (2, "B2", 20.0), (4, "D2", 40.0), (9, "NEW", 90.0)
  ).toDF("k", "name", "v")

  test("applyUpdates: matched rows take update values, unmatched pass through, no inserts") {
    val out = Mutations.applyUpdates(target, updates.filter($"k" =!= 9), Seq("k"))
      .orderBy("k").as[(Int, String, Double)].collect()
    assert(out.toSeq == Seq((1, "a", 1.0), (2, "B2", 20.0), (3, "c", 3.0), (4, "D2", 40.0)))
  }

  test("applyUpdates is idempotent (same updates twice == once)") {
    val once = Mutations.applyUpdates(target, updates, Seq("k"))
    val twice = Mutations.applyUpdates(once, updates, Seq("k"))
    assert(once.orderBy("k").collect().sameElements(twice.orderBy("k").collect()))
  }

  test("upsert post-image keyset = union of target and update keys") {
    val out = Mutations.upsert(target, updates, Seq("k"))
    val keys = out.select("k").as[Int].collect().sorted.toSeq
    assert(keys == Seq(1, 2, 3, 4, 9))
    val nine = out.filter($"k" === 9).as[(Int, String, Double)].head()
    assert(nine == ((9, "NEW", 90.0)))
  }

  test("deleteWhere leaves no row satisfying the predicate (sql.py:321-332 intent)") {
    val out = Mutations.deleteWhere(target, "v >= 2.0 AND name != 'c'")
    assert(out.filter(expr("v >= 2.0 AND name != 'c'")).count() == 0)
    assert(out.count() == 2) // rows 1 and 3 survive
  }

  test("deleteWhere twice == once (idempotent)") {
    val once = Mutations.deleteWhere(target, "k % 2 = 0")
    val twice = Mutations.deleteWhere(once, "k % 2 = 0")
    assert(once.orderBy("k").collect().sameElements(twice.orderBy("k").collect()))
  }

  test("deleteWhere keeps rows whose predicate is NULL (SQL DELETE semantics)") {
    val t = Seq((1L, Some("A")), (2L, Option.empty[String]), (3L, Some("B")))
      .toDF("k", "flag")
    val out = Mutations.deleteWhere(t, "flag = 'A'")
    // DELETE removes only IS-TRUE rows; the NULL-flag row stays
    assert(out.select("k").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
  }

  test("mergeAggStates: incremental merge == full recompute; empty partial is a no-op") {
    val events = Seq(
      ("a", 1L, 10.0, 1), ("a", 2L, 20.0, 2), ("b", 3L, 5.0, 1),
      ("a", 4L, 1.0, 3), ("b", 5L, 2.0, 3)
    ).toDF("k", "id", "v", "day")
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sv"),
        min("id").as("lo"), max("id").as("hi"))
    val partials = (1 to 4).map(dd => agg(events.filter($"day" === dd)))
    val merged = Mutations.mergeAggStates(partials, Seq("k"),
      sums = Seq("n", "sv"), mins = Seq("lo"), maxs = Seq("hi"))
    val full = agg(events)
    assert(merged.orderBy("k").collect().toSeq ==
      full.orderBy("k").collect().toSeq)
    intercept[IllegalArgumentException] {
      Mutations.mergeAggStates(Seq(full.drop("hi"), full), Seq("k"),
        Seq("n", "sv"), Seq("lo"), Seq("hi"))
    }
  }

  // ---- SCD Type-2 ----------------------------------------------------

  private def scd2Dim = Seq(
    // k, seg, valid_from, valid_to, is_current
    (1, "A", "2020-01-01", Some("2021-01-01"), false), // closed history
    (1, "B", "2021-01-01", None, true),
    (2, "C", "2020-01-01", None, true),
    (3, "D", "2020-01-01", None, true)
  ).toDF("k", "seg", "vf", "vt", "is_current")
    .select($"k", $"seg", to_date($"vf").as("valid_from"),
      to_date($"vt").as("valid_to"), $"is_current")

  private def scd2Out(changes: org.apache.spark.sql.DataFrame) =
    Mutations.scd2Merge(scd2Dim, changes, Seq("k"),
        to_date(lit("2022-06-01")))
      .select($"k", $"seg", date_format($"valid_from", "yyyy-MM-dd").as("vf"),
        coalesce(date_format($"valid_to", "yyyy-MM-dd"), lit("open")).as("vt"),
        $"is_current")
      .as[(Int, String, String, String, Boolean)].collect().toSeq.sorted

  test("scd2Merge: attribute change closes the current row and opens a new version") {
    val out = scd2Out(Seq((1, "B2")).toDF("k", "seg"))
    assert(out.filter(_._1 == 1) == Seq(
      (1, "A", "2020-01-01", "2021-01-01", false),
      (1, "B", "2021-01-01", "2022-06-01", false),
      (1, "B2", "2022-06-01", "open", true)))
    // untouched keys pass through verbatim
    assert(out.filter(_._1 == 2) == Seq((2, "C", "2020-01-01", "open", true)))
  }

  test("scd2Merge: identical re-delivery is a no-op and unknown keys insert open") {
    val out = scd2Out(Seq((2, "C"), (9, "Z")).toDF("k", "seg"))
    // (2, C) matches the current version exactly — no new version
    assert(out.filter(_._1 == 2) == Seq((2, "C", "2020-01-01", "open", true)))
    assert(out.filter(_._1 == 9) == Seq((9, "Z", "2022-06-01", "open", true)))
    // exactly one open row per key, always
    val open = out.filter(_._5)
    assert(open.map(_._1).distinct.size == open.size)
  }

  test("scd2Merge twice with the same batch == once (idempotent)") {
    val ch = Seq((1, "B2"), (3, "D2"), (9, "Z")).toDF("k", "seg")
    val once = Mutations.scd2Merge(scd2Dim, ch, Seq("k"),
      to_date(lit("2022-06-01")))
    val twice = Mutations.scd2Merge(once, ch, Seq("k"),
      to_date(lit("2022-06-01")))
    val cols = Seq("k", "seg", "valid_from", "valid_to", "is_current")
    assert(once.orderBy(cols.map(col): _*).collect().toSeq ==
      twice.orderBy(cols.map(col): _*).collect().toSeq)
  }
}
