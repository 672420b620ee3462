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
    val out = Similarity.simTopK(spark, sf, k = 5)
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
    val buckets = vs.select("bkt").as[Long].collect()
    assert(buckets.forall(b => b >= 0 && b < 256))
    assert(buckets.distinct.length > 1)
  }

  test("dedupEmbed never pairs across buckets and respects threshold") {
    val out = Similarity.dedupEmbed(spark, sf, threshold = 0.3)
    assert(out.filter(col("cos4") < 0.29).count() == 0)
    assert(out.filter(col("a") >= col("b")).count() == 0)
  }

  test("lshBitsFor: occupancy-driven, floored, capped, monotone") {
    import Similarity.{lshBitsFor, MinLshBits, MaxLshBits, TargetBucket}
    assert(lshBitsFor(0) == MinLshBits)
    assert(lshBitsFor(TargetBucket << MinLshBits) == MinLshBits)
    assert(lshBitsFor((TargetBucket << MinLshBits) + 1) == MinLshBits + 1)
    assert(lshBitsFor(Long.MaxValue / 4) == MaxLshBits)
    // expected occupancy n / 2^bits stays ≤ TargetBucket until the cap
    (10 to 36).map(1L << _).foreach { n =>
      val b = lshBitsFor(n)
      assert(b == MaxLshBits || (n >> b) <= TargetBucket, s"n=$n bits=$b")
    }
  }

  test("dedupEmbedBanded: more bands find a superset of verified pairs") {
    val vs = Similarity.vectors(spark, sf)
    def pairs(bands: Int) =
      Similarity.dedupEmbedBanded(vs, bands, bits = 8, threshold = 0.3)
        .select("a", "b").as[(Long, Long)].collect().toSet
    val one = pairs(1)
    val four = pairs(4)
    assert(one.subsetOf(four), "OR-construction can only add candidates")
    assert(four.nonEmpty)
  }
}
