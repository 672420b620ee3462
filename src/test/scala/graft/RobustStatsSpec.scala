package graft

import graft.engine.{Relational, TextOps}

/** Unit tests for salted aggregation, winsorized means, and KS drift. */
class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg: two-level result equals the plain aggregate") {
    val sf = "/root/testdata/sf0.001"
    val salted = Relational.saltedAgg(spark, sf)
      .select("l_returnflag", "l_linestatus", "sum_qty", "sum_disc", "n_rows")
      .as[(String, String, Double, Double, Long)].collect().toSet
    val plain = Relational.aggGroup(spark, sf)
      .select("l_returnflag", "l_linestatus", "sum_qty", "sum_disc", "n_rows")
      .as[(String, String, Double, Double, Long)].collect().toSet
    assert(salted == plain)
    // the salt actually spread rows: every group saw >1 salt partition
    val fanout = Relational.saltedAgg(spark, sf)
      .select("n_salts").as[Long].collect()
    assert(fanout.forall(_ > 1))
  }

  private def docsDir(rows: Seq[(Long, String, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("rstat").toString
    rows.map { case (id, src, n) => (id, "x", "en", src, n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("winsorize: clamped mean shrinks toward the bulk under one huge outlier") {
    // 19 docs of length 100 plus one of 100000
    val rows = (1L to 19L).map(i => (i, "srcA", 100L)) :+ (20L, "srcA", 100000L)
    val dir = docsDir(rows)
    val got = TextOps.winsorize(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.length == 1)
    val (_, n, p05, p95, meanRaw, meanWin) = got(0)
    assert(n == 20L)
    assert(p05 == 100L)
    assert(meanRaw == (19 * 100L + 100000L) / 20) // 5095
    // winsorized mean is pulled back near the bulk: p95 interpolates
    // between 100 and 100000 at rank 0.95·19 → clamp caps the outlier
    assert(meanWin < meanRaw && meanWin >= 100L && p95 < 100000L)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("ksDrift: identical distributions → 0; disjoint → 1e6") {
    // i%2 keeps both halves at exactly 5×100 + 5×101
    val same = docsDir(
      (1L to 10L).map(i => (i, "src0", 100L + (i % 2))) ++
        (11L to 20L).map(i => (i, "src1", 100L + (i % 2))))
    val gotSame = TextOps.ksDrift(spark, same)
      .as[(Long, Long, Long, Long)].collect()(0)
    assert(gotSame._3 == 0L, s"identical dists must give D=0: $gotSame")

    val disjoint = docsDir(
      (1L to 5L).map(i => (i, "src0", 10L)) ++
        (6L to 10L).map(i => (i, "src1", 99L)))
    val gotDis = TextOps.ksDrift(spark, disjoint)
      .as[(Long, Long, Long, Long)].collect()(0)
    // all of src0's mass sits at v=10 before any of src1's → D = 1e6 at v=10
    assert(gotDis == (5L, 5L, 1000000L, 10L))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(same))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(disjoint))
  }
}
