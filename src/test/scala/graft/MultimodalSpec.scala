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

  test("sampleFrames fans out one row per byte-range frame") {
    val df = Multimodal.withPayload(Seq((1L, "abcdefghij")).toDF("doc_id", "text"))
    val frames = Multimodal.sampleFrames(df, every = 4)
    // 10 bytes / 4 → frames at 0,1 (floor(10/4)-1 = 1)
    assert(frames.count() == 2)
    val f0 = frames.filter(col("frame_no") === 0)
      .select(col("frame").cast("string")).as[String].head()
    assert(f0 == "abcd")
  }
}
