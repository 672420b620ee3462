package graft

import graft.engine.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (100L, 1L, 10L), // key 1 at t=10
    (101L, 1L, 4L),  // key 1 at t=4 (before any right row at t<=4? r at t=4)
    (102L, 2L, 7L),  // key 2 at t=7 — no right rows for key 2
    (103L, 1L, 3L)   // key 1 at t=3 — before all right rows
  ).toDF("id", "k", "t")

  private def right = Seq(
    (1L, 4L, 40L, "r40"),  // key 1 t=4
    (1L, 4L, 41L, "r41"),  // tie at t=4 → max rid wins
    (1L, 9L, 90L, "r90")   // key 1 t=9
  ).toDF("k", "t", "rid", "tag")

  test("asofLatest picks latest right row with rt <= lt, max tie-break, null when none") {
    val out = AsOfJoin.asofLatest(left, right, "k", "k", "t", "t",
        rightCols = Seq("rid", "tag"), tieBreak = Seq("rid"))
      .orderBy("id")
      .select("id", "rid")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(out.toSeq == Seq(
      (100L, 90L),  // t=10 → latest is t=9
      (101L, 41L),  // t=4 → inclusive, tie broken to max rid
      (102L, -1L),  // no right rows for key 2
      (103L, -1L))) // earlier than all right rows
  }

  test("every left row survives exactly once (left-join cardinality)") {
    val out = AsOfJoin.asofLatest(left, right, "k", "k", "t", "t",
      Seq("rid"), Seq("rid"))
    assert(out.count() == 4)
    assert(out.select("id").distinct().count() == 4)
  }

  test("string keys join natively; null right keys never match") {
    // regression: keys were cast("long"), nulling string keys and
    // collapsing every row into one window partition
    val l = Seq(("a", 5L, 1L), ("b", 5L, 2L)).toDF("k", "t", "id")
    val r = Seq((Option("a"), 1L, 10L), (Option("b"), 2L, 20L),
      (Option.empty[String], 3L, 99L)).toDF("k", "t", "rid")
    val out = AsOfJoin.asofLatest(l, r, "k", "k", "t", "t",
        Seq("rid"), Seq("rid"))
      .select("id", "rid").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toMap
    // each key matches its own right row; the null-key right row (rid
    // 99, latest of all) matches nobody
    assert(out == Map(1L -> 10L, 2L -> 20L))
  }

  test("DateType time columns join (Spark 4 forbids DATE→BIGINT casts)") {
    import java.sql.Date
    val l = Seq((1L, Date.valueOf("2024-03-10"), 1L),
      (1L, Date.valueOf("2024-01-01"), 2L)).toDF("k", "t", "id")
    val r = Seq((1L, Date.valueOf("2024-03-01"), 30L),
      (1L, Date.valueOf("2024-02-01"), 20L)).toDF("k", "t", "rid")
    val out = AsOfJoin.asofLatest(l, r, "k", "k", "t", "t",
        Seq("rid"), Seq("rid"))
      .select("id", "rid").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toMap
    assert(out == Map(1L -> 30L, 2L -> -1L))
  }

  test("mixed time-type families are refused, not silently mis-compared") {
    import java.sql.Date
    val l = Seq((1L, Date.valueOf("2024-03-10"), 1L)).toDF("k", "t", "id")
    val ex = intercept[IllegalArgumentException] {
      AsOfJoin.asofLatest(l, right, "k", "k", "t", "t", Seq("rid"), Seq("rid"))
    }
    assert(ex.getMessage.contains("share a type family"))
  }
}
