package graft

import graft.engine.Similarity

/** Cross-check [[Similarity.embedCov]]'s exploded-pair formulation
  * against a driver-side brute-force over the same vectors — locks the
  * posexplode rewrite (i/j indexing, diagonal inclusion, fixed-point
  * quantization) to the mathematical definition. */
class EmbedCovSpec extends SparkSpec {

  test("embedCov matches a driver-side brute force at sf0.001") {
    val vecs = Similarity.vectors(spark, sf)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    val n = vecs.length.toDouble
    assert(vecs.nonEmpty && vecs.head.length == 64)

    // exact integer second-moment sums, same floor quantization
    val spp = Array.ofDim[Long](64, 64)
    val sq = Array.ofDim[Long](64)
    vecs.foreach { v =>
      var i = 0
      while (i < 64) {
        sq(i) += math.floor(v(i) * Similarity.KmeansFixedPoint).toLong
        var j = i
        while (j < 64) {
          spp(i)(j) += math.floor(
            v(i) * v(j) * Similarity.KmeansFixedPoint).toLong
          j += 1
        }
        i += 1
      }
    }

    val got = Similarity.embedCov(spark, sf)
      .select("i", "j", "spp", "cov6").collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got.size == 64 * 65 / 2, "one row per upper-triangle cell")

    val k = Similarity.KmeansFixedPoint.toDouble
    for (i <- 1 to 64; j <- i to 64) {
      val (gSpp, gCov) = got((i, j))
      assert(gSpp == spp(i - 1)(j - 1), s"spp mismatch at ($i,$j)")
      // Spark's round() is HALF_UP decimal rounding, not IEEE rint
      val raw = spp(i - 1)(j - 1) / k / n -
        (sq(i - 1) / k / n) * (sq(j - 1) / k / n)
      val want = BigDecimal(raw)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      assert(gCov == want, s"cov6 mismatch at ($i,$j): $gCov vs $want")
    }
  }
}
