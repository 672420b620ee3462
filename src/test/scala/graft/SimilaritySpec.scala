package graft

import org.apache.spark.sql.functions._
import graft.engine.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine on hand-computed vectors (FIXTURES.md micro)") {
    val df = Seq(
      (Seq(1.0, 0.0, 0.0), Seq(1.0, 0.0, 0.0)),   // identical → 1
      (Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0)),   // orthogonal → 0
      (Seq(1.0, 1.0, 0.0), Seq(1.0, 0.0, 0.0))    // 45° → √2/2
    ).toDF("a", "b")
    val got = df.select(Similarity.cosine(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
    assert(math.abs(got(2) - math.sqrt(2) / 2) < 1e-12)
  }

  test("simTopK returns k neighbors per query, best-first, excluding self") {
    val out = Similarity.simTopK(spark, sf, every = 50, k = 5)
    val rows = out.select("q_id", "vec_id", "rk", "cos4")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (q, v, _, _) => q != v })
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.length == 5)
      val byRank = g.sortBy(_._3).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH buckets partition the corpus; ANN results come from own bucket") {
    val vs = Similarity.vectors(spark, sf)
      .withColumn("bkt", Similarity.lshBucket(col("v")))
    val buckets = vs.select("bkt").as[Int].collect()
    assert(buckets.forall(b => b >= 0 && b < 256))
    assert(buckets.distinct.length > 1)
  }

  test("dedupEmbed never pairs across buckets and respects threshold") {
    val out = Similarity.dedupEmbed(spark, sf, threshold = 0.3)
    assert(out.filter(col("cos4") < 0.29).count() == 0)
    assert(out.filter(col("a") >= col("b")).count() == 0)
  }
}
