package graft

import org.apache.spark.sql.functions._
import graft.engine.{Components, TextOps}

/** Unit tests for triangle counting and PSI drift. */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  test("triangles: hand-computed counts on a fixed graph") {
    // triangle {1,2,3} plus pendant 4 on 3
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val got = Components.triangles(edges)
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(got(1L) == (2L, 1L, 1000000L)) // coef = 2·1/(2·1)
    assert(got(2L) == (2L, 1L, 1000000L))
    assert(got(3L) == (3L, 1L, 333333L)) // 2·10⁶ DIV 6
    assert(got(4L) == (1L, 0L, 0L))
    spark.catalog.clearCache()
  }

  test("triangles: K4 — every node in 3 triangles, coefficient 1") {
    val edges = (for {
      a <- 1L to 4L; b <- (a + 1) to 4L
    } yield (a, b)).toDF("a", "b")
    val got = Components.triangles(edges)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == 4)
    assert(got.forall(t => t._2 == 3L && t._3 == 3L && t._4 == 1000000L))
    spark.catalog.clearCache()
  }

  test("triangles: triangle-free path graph is all zeros") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val got = Components.triangles(edges)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.forall(t => t._3 == 0L && t._4 == 0L))
    spark.catalog.clearCache()
  }

  test("psiDrift: symmetric sources score exactly zero") {
    val dir = java.nio.file.Files.createTempDirectory("psi0").toString
    // two sources with IDENTICAL length distributions: every smoothed
    // p equals its q, every term floors to 0
    (1L to 40L).map { i =>
      // bin from i/2 so it is INDEPENDENT of the source parity — both
      // sources see 5 docs in each of bins 0..3
      val nc = 32L + 64L * ((i / 2) % 4)
      (i, "x " * 8, "en", if (i % 2 == 0) "s0" else "s1", nc)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = TextOps.psiDrift(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("s0", 20L, 0L), ("s1", 20L, 0L)))
  }

  test("psiDrift: disjoint length distributions score high") {
    val dir = java.nio.file.Files.createTempDirectory("psi1").toString
    // s0 all short (bin 0), s1 all long (bin 9)
    (1L to 40L).map { i =>
      val short = i % 2 == 0
      (i, "x " * 8, "en", if (short) "s0" else "s1",
        if (short) 10L else 600L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = TextOps.psiDrift(spark, dir)
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> t._3).toMap
    // PSI ≥ 0 by construction; disjoint supports push it far past the
    // 0.25 "drifted" reading (psi6 is PSI·10⁶)
    assert(got("s0") > 250000L, s"s0 psi6 = ${got("s0")}")
    assert(got("s1") > 250000L, s"s1 psi6 = ${got("s1")}")
  }
}
