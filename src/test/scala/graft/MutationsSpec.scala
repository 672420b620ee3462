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
}
