package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeMeta attaches typed metadata via mapPartitions (no shuffle)") {
    val df = Multimodal.withPayload(
      Seq((1L, "hello world"), (2L, "tiny")).toDF("doc_id", "text"))
    val out = Multimodal.decodeMeta(df)
    assert(out.schema("meta").dataType == Multimodal.MediaMetaSchema)
    val rows = out.select("doc_id", "meta.n_bytes", "meta.width", "meta.height")
      .as[(Long, Long, Int, Int)].collect().sortBy(_._1)
    assert(rows(0)._2 == 11L && rows(1)._2 == 4L)
    assert(rows.forall(r => r._3 >= 64 && r._4 >= 64))
    // determinism: same payload → same metadata
    val again = Multimodal.decodeMeta(df)
      .select("doc_id", "meta.width").as[(Long, Int)].collect().sortBy(_._1)
    assert(again.map(_._2).sameElements(rows.map(_._3)))
  }

  test("featureExtract emits normalized float histograms that feed the ANN ops") {
    val df = Multimodal.withPayload(
      graft.engine.Sources.documents(spark, sf).limit(50))
    val feats = Multimodal.featureExtract(df)
    import org.apache.spark.sql.types._
    assert(feats.schema("features").dataType == ArrayType(FloatType))
    val rows = feats.select("doc_id", "features")
      .as[(Long, Seq[Float])].collect()
    assert(rows.forall(_._2.length == 16))
    // normalized: sums to ~1
    assert(rows.forall(r => math.abs(r._2.sum - 1f) < 1e-3))
    // pipes into the similarity layer (cosine over cast-to-double arrays)
    val cos = feats.select(
      graft.engine.Similarity.cosine(
        col("features").cast("array<double>"),
        col("features").cast("array<double>")).as("c"))
      .as[Double].collect()
    assert(cos.forall(c => math.abs(c - 1.0) < 1e-9))
  }

  test("sampleFrames fans out one row per byte-range frame") {
    val df = Multimodal.withPayload(Seq((1L, "abcdefghij")).toDF("doc_id", "text"))
    val frames = Multimodal.sampleFrames(df, every = 4)
    // 10 bytes, every=4 → (10-1) DIV 4 = 2 → frames 0,1,2: every byte
    // covered, short tail frame (the chunkSigs tiling geometry)
    assert(frames.count() == 3)
    val byNo = frames.select(col("frame_no"),
      col("frame").cast("string")).as[(Long, String)].collect().toMap
    assert(byNo == Map(0L -> "abcd", 1L -> "efgh", 2L -> "ij"))
  }
}
