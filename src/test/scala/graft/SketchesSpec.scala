package graft

import org.apache.spark.sql.functions._
import graft.engine.Sketches

/** Unit tests for the fixed-size sketch operators: linear-counting
  * distinct estimate, count-min top-K, bloom-prefiltered join. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def corpusDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("sketch").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("distinctSketch: estimate brackets the exact count in the low-load regime") {
    // 40 docs × 8 distinct shingles each, all distinct across docs:
    // 320 distinct shingles in 4096 buckets — load 0.08, so the
    // linear-counting estimate must land within 5% of exact.
    val rows = (0 until 40).map { i =>
      val toks = (0 until 10).map(t => s"w${i}_$t").mkString(" ")
      (i.toLong, toks, "en", s"src${i % 2}", 10L)
    }
    val dir = corpusDir(rows)
    val got = Sketches.distinctSketch(spark, dir)
      .as[(String, Long, Long, Long)].collect()
    assert(got.length == 2)
    got.foreach { case (_, filled, exact, est) =>
      assert(filled <= exact) // collisions only ever reduce filled
      assert(math.abs(est - exact) <= math.max(1L, exact / 20),
        s"estimate $est vs exact $exact")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("cmsTopk: estimates never undercount and exact counts are right") {
    // "a b" bigram appears 30 times, "b c" 10, "c d" 5 — three hot keys
    // plus 200 singleton bigrams to populate the grid with collisions.
    val rows = Seq((1L, Seq.fill(30)("a b").flatMap(_.split(" ")).mkString(" "), "en", "s", 5L)) ++
      (0 until 200).map(i => (100L + i, s"u$i v$i", "en", "s", 5L))
    val dir = corpusDir(rows)
    val got = Sketches.cmsTopk(spark, dir)
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty && got.length <= Sketches.CmsTop)
    // CMS invariant: est >= exact, over = est - exact >= 0
    got.foreach { case (bg, exact, est, over) =>
      assert(est >= exact, s"$bg: est $est < exact $exact")
      assert(over == est - exact)
    }
    // doc 1 is "a b a b ..." → bigrams: (a b) ×30, (b a) ×29
    val m = got.map(r => r._1 -> r._2).toMap
    assert(m("a b") == 30L)
    assert(m("b a") == 29L)
  }

  test("bloomJoin: no false negatives; fp accounting is consistent") {
    // build source shares half its shingles with probe source
    val shared = (0 until 5).map(t => s"s$t").mkString(" ")
    val rows = Seq(
      (1L, shared + " b0 b1 b2 b3 b4", "en", Sketches.BloomBuildSource, 9L),
      (2L, shared + " p0 p1 p2 p3 p4", "en", "srcP", 9L),
      (3L, "q0 q1 q2 q3 q4 q5", "en", "srcQ", 6L))
    val dir = corpusDir(rows)
    val got = Sketches.bloomJoin(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    got.values.foreach { case (src, nSh, nCand, nTrue, nFp) =>
      assert(nCand >= nTrue, s"$src: candidates must cover all members")
      assert(nFp == nCand - nTrue)
      assert(nCand <= nSh)
    }
    // srcP's first 3 shingles (within "s0..s4") are true members
    assert(got("srcP")._4 == 3L)
    // srcQ shares nothing with the build side
    assert(got("srcQ")._4 == 0L)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
