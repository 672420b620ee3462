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

  test("embedding vectors are distinct across 130 copies, norms kept") {
    val vecs = ScaleGen.replicate(spark, src, "embeddings", 130)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toVector)
    assert(vecs.length === 130)
    // rotation repeats at 64; the sign flip keeps 64 and 128 apart —
    // every copy within the 128-cycle must be a distinct vector
    assert(vecs.take(128).distinct.length === 128,
      "copies within the 128 rotation+sign cycle must be distinct")
    // copy 128 repeats copy 0 by construction — the documented bound
    assert(vecs(128) === vecs(0))
    val norm0 = math.sqrt(vecs(0).map(x => x.toDouble * x).sum)
    for (v <- vecs) {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - norm0) < 1e-3, "rotation/sign must keep norms")
    }
  }
}
