package graft

import graft.engine.TextOps
import org.apache.spark.sql.functions.col

/** Hand-computed verification for the round-5 corpus-analysis
  * operators. The DuckDB differential proves cross-engine agreement;
  * these tests prove the VALUES are the intended ones. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  private def corpusDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("corpusops").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("charClasses counts CODEPOINTS per explicit class (astral-safe)") {
    // "ab1 !😀": alpha 2, digit 1, space 1, other 2 — the emoji is ONE
    // codepoint even though it is two UTF-16 units in the JVM; a
    // length()-based count would report 3 "other" and diverge from
    // DuckDB. tot = 6, alpha_ppm = 2_000_000/6 = 333333 (floor).
    val dir = corpusDir(Seq((1L, "ab1 !😀", "en", "s1", 6L)))
    val r = TextOps.charClasses(spark, dir)
      .as[(String, Long, Long, Long, Long, java.lang.Long, java.lang.Long)]
      .collect().toSeq
    assert(r == Seq(("s1", 2L, 1L, 1L, 2L,
      java.lang.Long.valueOf(333333L), java.lang.Long.valueOf(333333L))))
  }

  test("bigramLm: hand-computed heads, continuations and conditional ppm") {
    // "a b a b" → bigrams (a,b),(b,a),(a,b): head a htot=2 (top, then
    // b htot=1); a's best next = b with n=2, cond = 1000000; b→a 1/1.
    val dir = corpusDir(Seq((1L, "a b a b", "en", "s1", 7L)))
    val r = TextOps.bigramLm(spark, dir)
      .as[(String, Long, String, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      ("a", 1L, "b", 2L, 2L, 1000000L),
      ("b", 1L, "a", 1L, 1L, 1000000L)))
  }

  test("topicTerms ranks each source's dominant token with positive lift") {
    // s1 speaks only "alpha", s2 only "beta" (plus one shared token) —
    // each source's rank-1 term must be its own dominant token, with
    // src_ppm > corpus_ppm (positive lift), and lift must be exactly
    // src_ppm - corpus_ppm.
    val dir = corpusDir(Seq(
      (1L, "alpha alpha alpha shared", "en", "s1", 24L),
      (2L, "beta beta beta shared", "en", "s2", 21L)))
    val r = TextOps.topicTerms(spark, dir)
      .as[(String, Long, String, Long, Long, Long)].collect()
      .groupBy(_._1).map { case (src, rs) => src -> rs.minBy(_._2) }
    assert(r("s1")._3 == "alpha" && r("s2")._3 == "beta")
    r.values.foreach { case (_, _, _, srcPpm, corpusPpm, lift) =>
      assert(lift == srcPpm - corpusPpm && lift > 0)
    }
  }

  test("bandCollisions: pair workload equals sum k(k-1)/2 over buckets") {
    // two identical docs share every band bucket; cross-check the
    // n_cand_pairs rollup against an independent recomputation from
    // the band table with a different aggregation shape.
    val dir = corpusDir(Seq(
      (1L, "w x y z q r", "en", "s1", 11L),
      (2L, "w x y z q r", "en", "s1", 11L),
      (3L, "completely different text here now", "en", "s1", 34L)))
    val out = TextOps.bandCollisions(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._1) == (0L until TextOps.Bands.toLong))
    val brute = TextOps.minhashBands(TextOps.sharedSignature(spark, dir))
      .groupBy(col("band"), col("sig")).count()
      .as[(Int, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._3 * (r._3 - 1) / 2).sum)
    out.foreach { case (band, _, _, _, nPairs) =>
      assert(nPairs == brute(band.toInt), s"band $band")
    }
    // the identical pair must collide in every band
    out.foreach { case (_, _, maxB, nColl, nPairs) =>
      assert(maxB >= 2 && nColl >= 1 && nPairs >= 1)
    }
  }

  test("splitLeakage pair total equals the verified near-dup pair count") {
    val d = sf // real sf0.001 corpus: has planted near-dups
    val total = TextOps.splitLeakage(spark, d)
      .agg(org.apache.spark.sql.functions.sum("n_pairs")).as[Long].head()
    val pairs = TextOps.sharedCandPairs(spark, d)
      .filter(col("jacc") >= TextOps.NearDupJaccard).count()
    assert(total == pairs)
    // leaky flag is exactly split_a != split_b
    TextOps.splitLeakage(spark, d)
      .as[(String, String, Long, Boolean)].collect()
      .foreach { case (a, b, _, leaky) => assert(leaky == (a != b)) }
  }

  test("tokZipf: exact micro-quantized regression — slope −1 on a " +
      "perfect 2:1 corpus") {
    // freqs a:4, b:2 → ranks 1, 2. lx = (0, 693147); ly = (1386294,
    // 693147) — note floor(10⁶·ln 4) = 2·floor(10⁶·ln 2) exactly here.
    // num = 2·sxy − sx·sy = −693147², den = 2·sxx − sx² = 693147² →
    // slope exactly −1.0.
    val dir = corpusDir(Seq((1L, "a a a a b b", "en", "s1", 11L)))
    val got = TextOps.tokZipf(spark, dir)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (2L, 693147L, 2079441L, 480452763609L, 480452763609L, -1.0)))
  }

  test("heapsLaw: vocabulary growth at document checkpoints") {
    // d1 "a b a" (3 tokens, vocab {a,b}), d2 "b c" (2 tokens, +c).
    // With 2 docs every doc is a checkpoint: deciles 5 and 10.
    val dir = corpusDir(Seq(
      (1L, "a b a", "en", "s1", 5L),
      (2L, "b c", "en", "s1", 3L)))
    val got = TextOps.heapsLaw(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((5L, 1L, 3L, 2L), (10L, 2L, 5L, 3L)))
  }

  test("langMix: per-source predicted-language shares in floor ppm") {
    // s1: "the of and x" → 3/4 stopwords → en; "x y z" → und →
    // en/und split 500000 ppm each. s2's only doc is und → 1000000.
    val dir = corpusDir(Seq(
      (1L, "the of and x", "en", "s1", 12L),
      (2L, "x y z", "en", "s1", 5L),
      (3L, "q w", "de", "s2", 3L)))
    val got = TextOps.langMix(spark, dir)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("s1", "en", 1L, 500000L),
      ("s1", "und", 1L, 500000L),
      ("s2", "und", 1L, 1000000L)))
  }

  test("lshPrecisionRecall: identical pair is truth AND candidate at " +
      "every threshold") {
    // doc1 = doc2 (jacc 1, identical signatures → candidate in every
    // band); doc3 shares no shingle with either — not ground truth,
    // and its disjoint shingle set cannot produce an equal 3-hash band
    // signature, so the report is exactly one pair at every τ.
    val dir = corpusDir(Seq(
      (1L, "w1 w2 w3 w4 w5", "en", "s1", 14L),
      (2L, "w1 w2 w3 w4 w5", "en", "s1", 14L),
      (3L, "zz yy xx ww vv", "en", "s2", 14L)))
    val got = TextOps.lshPrecisionRecall(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(50L, 60L, 70L, 80L, 90L).map(t =>
      (t, 1L, 1L, 1L, 1000000L, 1000000L)))
  }
}
