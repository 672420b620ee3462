package graft

import org.apache.spark.sql.functions._
import graft.engine.{Components, TextOps}

/** Unit tests for the round-4 corpus operators: PageRank over the
  * near-dup graph, inverted-index build, co-occurrence lift. */
class Round4OpsSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank: hand-computed scores on a fixed 4-node graph") {
    // path graph 1-2-3 plus pendant 4 on 2: degrees 1,3,1,1
    val edges = Seq((1L, 2L), (2L, 3L), (2L, 4L)).toDF("a", "b")
    val got = Components.pagerank(edges, iters = 1)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    // one round from uniform 1e6: contrib(u→v) = (1e6·17) div (20·deg(u))
    // deg1=deg3=deg4=1 → 850000; deg2=3 → 283333
    val c2 = (1000000L * 17) / (20 * 3) // 283333
    val c1 = (1000000L * 17) / 20 // 850000
    assert(got(1L) == (1L, 150000L + c2))
    assert(got(3L) == (1L, 150000L + c2))
    assert(got(4L) == (1L, 150000L + c2))
    assert(got(2L) == (3L, 150000L + 3 * c1))
  }

  test("pagerank: mass concentrates on the hub of a star graph") {
    val edges = Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L))
      .toDF("a", "b")
    val out = Components.pagerank(edges, iters = 3)
      .as[(Long, Long, Long)].collect()
    val hub = out.find(_._1 == 10L).get
    val leaves = out.filter(_._1 != 10L)
    assert(hub._2 == 4L)
    assert(leaves.forall(_._2 == 1L))
    assert(leaves.forall(_._3 < hub._3), s"hub must outrank leaves: $out")
    // leaves are symmetric — identical scores
    assert(leaves.map(_._3).distinct.length == 1)
  }

  test("invertedIndex: df/cf/postings against a hand-built corpus") {
    val dir = java.nio.file.Files.createTempDirectory("invidx").toString
    Seq(
      (3L, "b a b", "en", "s", 5L),
      (1L, "a b", "en", "s", 3L),
      (2L, "a a a", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = TextOps.invertedIndex(spark, dir)
      .as[(String, Long, Long, String)].collect().toSeq
    // ordered by token; postings ascending doc_id
    assert(got == Seq(("a", 3L, 5L, "1,2,3"), ("b", 2L, 3L, "1,3")))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("invertedIndex: postings head capped at PostingsCap, df/cf exact") {
    val dir = java.nio.file.Files.createTempDirectory("invcap").toString
    val n = TextOps.PostingsCap + 5
    (0 until n).map(i => (i.toLong, "z z", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val row = TextOps.invertedIndex(spark, dir)
      .as[(String, Long, Long, String)].collect().head
    assert(row._2 == n.toLong) // df counts ALL docs
    assert(row._3 == 2L * n) // cf counts ALL occurrences
    // postings list the FIRST PostingsCap ids only
    assert(row._4 ==
      (0 until TextOps.PostingsCap).map(_.toString).mkString(","))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("cooccur: lift separates always-together from never-together") {
    val dir = java.nio.file.Files.createTempDirectory("cooc").toString
    // x,y always co-occur; x,z never do; 4 docs
    Seq(
      (1L, "x y", "en", "s", 3L), (2L, "x y", "en", "s", 3L),
      (3L, "z w", "en", "s", 3L), (4L, "z w", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = TextOps.cooccur(spark, dir)
      .select("x", "y", "n_xy", "lift6")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // lift = n_xy·N/(df_x·df_y) = 2·4/(2·2) = 2.0 for paired tokens
    assert(got(("x", "y")) == (2L, 2.0))
    assert(got(("w", "z")) == (2L, 2.0))
    // cross pairs never co-occur → absent from the join (no zero rows)
    assert(!got.contains(("x", "z")) && !got.contains(("y", "z")))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("q_pagerank runs on testdata: scores positive, ordered, graph-closed") {
    val out = TextOps.pagerankDup(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // every score ≥ the base mass and degrees ≥ 1
    assert(out.forall(r => r._3 >= Components.PrBase && r._2 >= 1))
    // emitted ordered by (pr desc, doc_id)
    assert(out.sortBy(r => (-r._3, r._1)).toSeq == out.toSeq)
  }

  test("fuzzyMatch: blocked pairs respect threshold, ordering, and symmetry-break") {
    val out = graft.engine.Relational.fuzzyMatch(spark, sf)
      .as[(String, String, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // threshold, canonical pair direction, same block (shared noun)
    assert(out.forall(_._3 <= 2))
    assert(out.forall(r => r._1 < r._2))
    assert(out.forall(r => r._1.split(" ")(1) == r._2.split(" ")(1)))
    // known near-pair in the synthetic adjective set: old/cold (dist 1)
    assert(out.exists(r => r._1 == "cold ring" && r._2 == "old ring"))
    // n_a/n_b are real row counts from the dictionary map-back
    assert(out.forall(r => r._4 >= 1 && r._5 >= 1))
  }

  test("bm25: scores rank query-term-dense docs first and stay bounded") {
    val out = TextOps.bm25(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty && out.length <= 100)
    // hits bounded by the query-term count; emitted in (sc desc) order
    assert(out.forall(r => r._2 >= 1 && r._2 <= TextOps.Bm25Terms.length))
    assert(out.sortBy(r => (-r._3, -r._2, r._1)).toSeq == out.toSeq)
  }

  test("outlierMad: per-source tallies are consistent and MAD is robust") {
    val rows = TextOps.outlierMad(spark, sf)
      .as[(String, Long, Double, Double, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._5 >= 0 && r._5 <= r._2))
    assert(rows.forall(r => r._3 > 0 && r._4 >= 0))
    // outlier count matches a direct recomputation for one source
    val (src, _, med, mad, nOut) = rows.head
    val lens = graft.engine.Sources.documents(spark, sf)
      .filter(col("source") === src).select("n_chars").as[Long].collect()
    val recount = lens.count(x => math.abs(x.toDouble - med) > 3.0 * mad)
    assert(recount.toLong == nOut)
  }
}
