package graft

import org.apache.spark.sql.functions._

/** End-to-end disjointness of ScaleGen.replicate — the property every
  * scale artifact's "constant dup density" claim rests on. The affine
  * cipher is pinned in ScaleGenSpec; here the actual DataFrame
  * transforms are: document texts must be pairwise distinct across
  * copies (k past the old 26-copy Caesar collision), and embedding
  * vectors must be pairwise distinct across rotation cycles (k past
  * 64 and 128) while keeping their norms. */
class ScaleGenReplicateSpec extends SparkSpec {

  private lazy val src: String = {
    val dir = java.nio.file.Files.createTempDirectory("sgr-src").toString
    import spark.implicits._
    Seq((1L, "the quick brown fox jumps over the lazy dog", "en", "w", 43L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/tmp_docs")
    val emb = (0 until 64).map(i => (i + 1).toFloat).toArray
    Seq((1L, emb, 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/tmp_emb")
    // single plain file per table, like the testdata layout
    def mv(from: String, to: String): Unit = {
      val f = new java.io.File(s"$dir/$from").listFiles()
        .filter(f => f.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(s"$dir/$to"))
    }
    mv("tmp_docs", "documents.parquet")
    mv("tmp_emb", "embeddings.parquet")
    dir
  }

  test("document texts are pairwise distinct across 40 copies (k > 26)") {
    val texts = ScaleGen.replicate(spark, src, "documents", 40)
      .select("text").collect().map(_.getString(0))
    assert(texts.length === 40)
    assert(texts.distinct.length === 40,
      "copies past the 26-copy Caesar period must stay textually disjoint")
  }

  test("docText: copies across the 312 cipher boundary stay pairwise distinct") {
    import spark.implicits._
    // representative copies spanning all four reversal variants,
    // including the exact boundary pairs (311|312, 623|624, 935|936)
    // and the same-cipher-different-variant pairs (0, 312, 624, 936)
    val picks = Seq(0, 1, 311, 312, 313, 623, 624, 625, 935, 936, 1247)
    val base = Seq("the quick brown fox jumps over the lazy dog")
      .toDF("text")
    val texts = picks.map { i =>
      base.select(ScaleGen.docText(org.apache.spark.sql.functions.col("text"), i))
        .as[String].head()
    }
    assert(texts.distinct.length === picks.length,
      s"copies ${picks.mkString(",")} must be pairwise distinct")
    // length preserved by every variant (n_chars stays valid)
    assert(texts.forall(_.length === 43))
    // copy 0 is the identity
    assert(texts.head === "the quick brown fox jumps over the lazy dog")
  }

  test("reversal variants preserve within-copy shingle structure exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // two near-dup docs: 9 words, 7 shared word-3-grams in the base
    // (non-palindromic words — a palindrome is reversal-invariant and
    // WOULD legitimately collide across variants)
    val d1 = "ab cd ef gh ij kl mn op qr"
    val d2 = "ab cd ef gh ij kl mn op zy"
    def sh(t: String): Set[Seq[String]] =
      t.split(" ").toSeq.sliding(3).map(_.toSeq).toSet
    val baseShared = (sh(d1) & sh(d2)).size
    for (r <- 0 to 3) {
      val Seq(t1, t2) = Seq(d1, d2).toDF("text")
        .select(ScaleGen.reversalVariant(col("text"), r))
        .as[String].collect().toSeq
      assert((sh(t1) & sh(t2)).size === baseShared,
        s"variant $r must preserve the shared-shingle count")
      // cross-variant shingle sets are disjoint for this corpus
      if (r > 0)
        assert((sh(t1) & sh(d1)).isEmpty,
          s"variant $r must not share shingles with the identity copy")
    }
  }

  test("reversal variants form the Klein group (involutions, composition law)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // strings chosen to stress the split/concat_ws round-trip: double
    // spaces (empty tokens), leading/trailing space, single chars,
    // palindromes, empty string
    val samples = Seq("the quick brown fox", "a  b", " x", "y ", "",
      "abc", "a", "racecar level", "ab  cd   ef")
    val df = samples.toDF("text")
    def apply2(r1: Int, r2: Int): Seq[String] =
      df.select(ScaleGen.reversalVariant(
          ScaleGen.reversalVariant(col("text"), r1), r2))
        .as[String].collect().toSeq
    def apply1(r: Int): Seq[String] =
      df.select(ScaleGen.reversalVariant(col("text"), r))
        .as[String].collect().toSeq
    // every non-identity element is an involution: r∘r = id
    for (r <- 1 to 3)
      assert(apply2(r, r) === samples, s"variant $r must be an involution")
    // composition law: full-string reversal = word-chars ∘ word-order
    assert(apply2(2, 1) === apply1(3),
      "R_words ∘ R_order must equal R_full (incl. empty tokens)")
    // length preservation on every sample, every variant
    for (r <- 0 to 3)
      assert(apply1(r).map(_.length) === samples.map(_.length),
        s"variant $r must preserve length")
  }

  test("embedding vectors are distinct across 130 copies, norms kept") {
    val vecs = ScaleGen.replicate(spark, src, "embeddings", 130)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toVector)
    assert(vecs.length === 130)
    // rotation repeats at 64; the per-copy Rademacher signs carry
    // distinctness past it (the old single sign-flip bound was 128 —
    // copies 128 and 0 were bit-identical; now every copy is distinct)
    assert(vecs.distinct.length === 130,
      "every copy must be a distinct vector under rotation x signs")
    val norm0 = math.sqrt(vecs(0).map(x => x.toDouble * x).sum)
    for (v <- vecs) {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - norm0) < 1e-3, "rotation/sign must keep norms")
    }
    // copy 0 is the identity
    assert(vecs(0) === (0 until 64).map(i => (i + 1).toFloat).toVector)
  }

  test("within-copy dot products: sign-only copies bit-exact, rotated ones equal") {
    import spark.implicits._
    // the quantity every dedup/ANN decision reduces to is the
    // within-copy dot product. The Rademacher signs are EXACT (sign
    // terms cancel per component), so copies at rotation 0 (i % 64 ==
    // 0, sign-only transforms) must reproduce the base dot to the
    // BIT; rotated copies compute a cyclic permutation of the same
    // term sequence — mathematically identical, FP-reordered — and
    // must agree to relative 1e-12 (the tolerance the cosine
    // thresholds dwarf by ~10 orders)
    val dir = java.nio.file.Files.createTempDirectory("sgr-dot").toString
    Seq((1L, Array(0.3f, -1.7f, 2.5f, 0.0f) ++ Array.fill(60)(0.1f), 0),
        (2L, Array(-0.9f, 0.4f, -3.3f, 1.1f) ++ Array.fill(60)(-0.2f), 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/tmp")
    val f = new java.io.File(s"$dir/tmp").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(f.toPath,
      java.nio.file.Paths.get(s"$dir/embeddings.parquet"))
    // (copy index, within-copy dot), copy = vec_id / DocOff (10M)
    val dots = ScaleGen.replicate(spark, dir, "embeddings", 129)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
      .groupBy(_._1 / 10000000L)
      .map { case (copy, g) =>
        val Seq(a, b) = g.toSeq.sortBy(_._1).map(_._2)
        copy -> a.zip(b).map { case (x, y) => x * y }.sum
      }
    val base = dots(0L)
    for ((copy, d) <- dots) {
      if (copy % 64 == 0)
        assert(d === base, s"sign-only copy $copy must be bit-exact")
      else
        assert(math.abs(d - base) <= 1e-12 * math.abs(base),
          s"rotated copy $copy drifted: $d vs $base")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
