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

  // --- real header parsing (no codec needed: headers are just bytes) ---

  private def png(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(33)
    b.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    b.putInt(13).put("IHDR".getBytes).putInt(w).putInt(h)
    b.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    b.array()
  }

  private def jpeg(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 18 + 19)
    bb.put(Array(0xff, 0xd8).map(_.toByte)) // SOI
    // APP0 segment (JFIF), length 16: the walker must SKIP it by length
    bb.put(Array(0xff, 0xe0).map(_.toByte)).putShort(16.toShort)
      .put("JFIF".getBytes).put(new Array[Byte](10))
    // SOF0: length 17, precision 8, height, width, 3 components
    bb.put(Array(0xff, 0xc0).map(_.toByte)).putShort(17.toShort)
      .put(8.toByte).putShort(h.toShort).putShort(w.toShort).put(3.toByte)
      .put(new Array[Byte](9))
    bb.array()
  }

  private def gif(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(13)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("GIF89a".getBytes).putShort(w.toShort).putShort(h.toShort)
    b.array()
  }

  private def bmp(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(54)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h)
    b.array()
  }

  test("sniffImageMeta parses real PNG/JPEG/GIF/BMP headers") {
    assert(Multimodal.sniffImageMeta(png(640, 480)) == Some((640, 480, "png")))
    assert(Multimodal.sniffImageMeta(jpeg(1920, 1080)) == Some((1920, 1080, "jpeg")))
    assert(Multimodal.sniffImageMeta(gif(320, 200)) == Some((320, 200, "gif")))
    assert(Multimodal.sniffImageMeta(bmp(800, 600)) == Some((800, 600, "bmp")))
    // top-down BMP stores negative height; magnitude is the pixel height
    val td = bmp(800, -600); assert(Multimodal.sniffImageMeta(td) == Some((800, 600, "bmp")))
    // non-image bytes and truncated headers are unrecognized, not errors
    assert(Multimodal.sniffImageMeta("just text".getBytes).isEmpty)
    assert(Multimodal.sniffImageMeta(png(1, 1).take(10)).isEmpty)
    assert(Multimodal.sniffImageMeta(jpeg(9, 9).take(6)).isEmpty)
    assert(Multimodal.sniffImageMeta(Array[Byte]()).isEmpty)
  }

  test("decodeMeta uses header-parsed metadata for real containers, stub otherwise") {
    val rows = Seq(
      (1L, png(99, 77)), (2L, jpeg(50, 40)), (3L, "plain".getBytes))
    val df = rows.toDF("id", "payload")
    val out = Multimodal.decodeMeta(df)
      .select(col("id"), col("meta.width"), col("meta.height"),
        col("meta.format"), col("meta.n_bytes"))
      .as[(Long, Int, Int, String, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == (1L, 99, 77, "png", png(99, 77).length.toLong))
    assert(out(2L) == (2L, 50, 40, "jpeg", jpeg(50, 40).length.toLong))
    // unrecognized → deterministic stub, n_bytes still real
    val (w, h, f, n) = Multimodal.decodeImageStub("plain".getBytes)
    assert(out(3L) == (3L, w, h, f, n))
  }

  // Minimal valid WAV: RIFF/WAVE + fmt (PCM, `rate` Hz, `ch` channels,
  // 16-bit) + a data chunk of `dataLen` zero bytes.
  private def wav(rate: Int, ch: Int, dataLen: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val byteRate = rate * ch * 2
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(ch.toShort); bb.putInt(rate)
    bb.putInt(byteRate); bb.putShort((ch * 2).toShort); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(dataLen)
    bb.array()
  }

  // Minimal ISO-BMFF: ftyp + moov(mvhd v0 + trak(tkhd with 16.16 dims)).
  private def mp4(timescale: Int, dur: Int, w: Int, h: Int): Array[Byte] = {
    def box(name: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      bb.putInt(8 + body.length); bb.put(name.getBytes); bb.put(body)
      bb.array()
    }
    val mvhd = {
      val b = java.nio.ByteBuffer.allocate(100) // v0 mvhd body
      b.putInt(0) // version+flags
      b.putInt(0); b.putInt(0) // ctime/mtime
      b.putInt(timescale); b.putInt(dur)
      box("mvhd", b.array())
    }
    val tkhd = {
      val b = java.nio.ByteBuffer.allocate(84) // v0 tkhd body
      b.position(76)
      b.putInt(w << 16); b.putInt(h << 16)
      box("tkhd", b.array())
    }
    val ftyp = box("ftyp", "isom0000".getBytes)
    ftyp ++ box("moov", mvhd ++ box("trak", tkhd))
  }

  test("sniffWavMeta parses RIFF fmt/data chunks for real") {
    // 8000 Hz stereo 16-bit, 32000 data bytes = 1000 ms
    assert(Multimodal.sniffWavMeta(wav(8000, 2, 32000))
      .contains((1000L, 8000, 2)))
    assert(Multimodal.sniffWavMeta(wav(44100, 1, 44100 * 2 / 2))
      .contains((500L, 44100, 1)))
    assert(Multimodal.sniffWavMeta("RIFFnope".getBytes).isEmpty)
    assert(Multimodal.sniffWavMeta(png(3, 3)).isEmpty)
  }

  test("sniffMp4Meta walks ftyp/moov/mvhd/tkhd boxes for real") {
    assert(Multimodal.sniffMp4Meta(mp4(600, 1200, 640, 480))
      .contains((2000L, 640, 480)))
    assert(Multimodal.sniffMp4Meta(wav(8000, 1, 8)).isEmpty)
    assert(Multimodal.sniffMp4Meta(mp4(600, 1200, 640, 480).take(10)).isEmpty)
  }

  test("decodeAvMeta routes wav/mp4 to parsed metadata, rest to null") {
    val rows = Seq(
      (1L, wav(16000, 1, 64000)), (2L, mp4(90000, 90000, 1920, 1080)),
      (3L, "not media".getBytes))
    val out = Multimodal.decodeAvMeta(rows.toDF("id", "payload"))
      .select(col("id"), col("av_meta.kind"), col("av_meta.duration_ms"),
        col("av_meta.sample_rate"), col("av_meta.channels"),
        col("av_meta.width"), col("av_meta.height"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "wav")
    assert(out(1L).getLong(2) == 2000L) // 64000 / 32000 B/s
    assert(out(1L).getInt(3) == 16000 && out(1L).getInt(4) == 1)
    assert(out(2L).getString(1) == "mp4")
    assert(out(2L).getLong(2) == 1000L)
    assert(out(2L).getInt(5) == 1920 && out(2L).getInt(6) == 1080)
    assert(out(3L).isNullAt(1))
  }
}
