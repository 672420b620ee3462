package graft

import graft.engine.{Similarity, TextOps}

/** Unit tests for token-entropy and embedding-norm stats. */
class EntropyNormSpec extends SparkSpec {
  import spark.implicits._

  test("tokenEntropy: uniform doc maxes entropy, constant doc scores zero") {
    val dir = java.nio.file.Files.createTempDirectory("ent").toString
    Seq(
      (1L, "a b c d", "en", "s", 7L), // uniform over 4 → 2000 mb/tok
      (2L, "a a a a", "en", "s", 7L), // single token → 0
      (3L, "a a b b", "en", "s", 7L)) // uniform over 2 → 1000 mb/tok
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = TextOps.tokenEntropy(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == (1L, 4L, 8000L, 2000L))
    assert(got(2L) == (2L, 4L, 0L, 0L))
    assert(got(3L) == (3L, 4L, 4000L, 1000L))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("embedNorm: exact fixed-point norms on unit and scaled vectors") {
    val dir = java.nio.file.Files.createTempDirectory("norm").toString
    Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), 0), // norm 1 → 1000 fp
      (2L, Array(0.0f, 2.0f, 0.0f), 0), // norm 2 → 2000 fp
      (3L, Array(3.0f, 4.0f, 0.0f), 1)) // norm 5 → 5000 fp
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = Similarity.embedNorm(spark, dir)
      .as[(Int, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(0) == (0, 2L, 1000L, 2000L, 3000L, 1500L))
    assert(got(1) == (1, 1L, 5000L, 5000L, 5000L, 5000L))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
