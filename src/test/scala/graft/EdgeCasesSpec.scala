package graft

import org.apache.spark.sql.functions._
import graft.engine.{Components, Mutations, TextOps}

/** Degenerate-input behavior: empty edge lists, sub-shingle documents,
  * empty update sets. These are the inputs iterative / persist-based
  * operators typically crash or hang on. */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents on an empty edge list terminates empty") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Components.connectedComponents(empty).count() == 0)
  }

  test("jaccardPairs on sub-shingle docs is empty, not a crash") {
    val docs = Seq((1L, "a b"), (2L, "x"), (3L, "")).toDF("doc_id", "text")
    assert(TextOps.jaccardPairs(docs, 0.8).count() == 0)
  }

  test("minhash signature of a sub-shingle doc is absent (no shingles)") {
    val docs = Seq((1L, "only two"), (2L, "three token doc")).toDF("doc_id", "text")
    val sig = TextOps.minhashSignature(docs)
    assert(sig.count() == 1 && sig.select("doc_id").as[Long].head() == 2L)
  }

  test("applyUpdates with an empty update set leaves the target unchanged") {
    val target = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    val updates = Seq.empty[(Long, Long)].toDF("k", "v")
    val out = Mutations.applyUpdates(target, updates, Seq("k"))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(out == Seq((1L, 10L), (2L, 20L)))
  }

  test("simhashNearPairs on a single doc is empty") {
    val sh = TextOps.simhashShingles(Seq((1L, "a b c d e")).toDF("doc_id", "text"))
    assert(TextOps.simhashNearPairs(sh).count() == 0)
  }

  test("approxDistinct: HLL estimate within 5% of the exact count") {
    val rows = graft.engine.Relational.approxDistinct(spark, sf)
      .select("approx_parts", "exact_parts").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (approx, exact) =>
      assert(math.abs(approx - exact) <= math.max(1L, exact / 20),
        s"approx=$approx exact=$exact")
    }
  }
}
