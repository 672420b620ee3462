package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The container ships no media codecs, so the *decode kernels* are
  * clearly-marked deterministic STUBs (byte-derived fakes) — the
  * Spark-side plumbing is real: schemas, batch iteration via
  * mapPartitions (one decoder init per partition, the same shape a JNI
  * codec or Python `mapInPandas` worker would use), and partition-count
  * preservation. Swap [[decodeImageStub]] for a real codec and nothing
  * else changes.
  */
object Multimodal {

  /** Typed metadata schema attached to every media payload. */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("format", StringType),
    StructField("n_bytes", LongType)))

  /** ==STUB== deterministic fake image decode: derives shape/format from
    * the payload bytes. Replace with a real codec (JNI / javacv) when
    * media libs are available; signature and batching stay identical. */
  def decodeImageStub(bytes: Array[Byte]): (Int, Int, String, Long) = {
    val h = bytes.foldLeft(1469598103934665603L)((a, b) => (a ^ b) * 1099511628211L)
    val width = 64 + math.floorMod(h, 1024).toInt
    val height = 64 + math.floorMod(h >> 10, 1024).toInt
    val format = if (math.floorMod(h, 2) == 0) "png" else "jpeg"
    (width, height, format, bytes.length.toLong)
  }

  /** REAL image-header sniffer — format + dimensions straight from the
    * container headers, no codec required (header layout is just
    * bytes): PNG IHDR, JPEG SOFn scan, GIF logical-screen descriptor,
    * BMP BITMAPINFOHEADER. Returns None for unrecognized/truncated
    * payloads (callers fall back to the decode stub, which stands in
    * for the pixel decoder this container can't ship). Unlike pixel
    * decode, THIS part of the multimodal pipeline is production-real. */
  def sniffImageMeta(bytes: Array[Byte]): Option[(Int, Int, String)] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def be32(i: Int): Long = (be16(i).toLong << 16) | be16(i + 2)
    def le32(i: Int): Long =
      le16(i).toLong | (le16(i + 2).toLong << 16)
    if (bytes == null) None
    // PNG: 8-byte signature, IHDR length+type at 8..15, width/height BE32
    else if (bytes.length >= 24 && u8(0) == 0x89 && u8(1) == 'P' &&
        u8(2) == 'N' && u8(3) == 'G' && u8(4) == 0x0d && u8(5) == 0x0a &&
        u8(6) == 0x1a && u8(7) == 0x0a)
      Some((be32(16).toInt, be32(20).toInt, "png"))
    // GIF87a/89a: width/height LE16 at 6/8
    else if (bytes.length >= 10 && u8(0) == 'G' && u8(1) == 'I' &&
        u8(2) == 'F' && u8(3) == '8' && (u8(4) == '7' || u8(4) == '9') &&
        u8(5) == 'a')
      Some((le16(6), le16(8), "gif"))
    // BMP: "BM", BITMAPINFOHEADER width/height LE32 at 18/22 (height may
    // be negative = top-down rows; magnitude is the pixel height)
    else if (bytes.length >= 26 && u8(0) == 'B' && u8(1) == 'M')
      Some((le32(18).toInt, math.abs(le32(22).toInt), "bmp"))
    // JPEG: FF D8, then walk marker segments to the first SOFn frame
    // header (C0-CF minus C4/C8/CC), height BE16 at +5, width at +7
    else if (bytes.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      var out: Option[(Int, Int, String)] = None
      while (out.isEmpty && i + 3 < bytes.length) {
        if (u8(i) != 0xff) i += 1 // padding/garbage between segments
        else {
          val m = u8(i + 1)
          if (m == 0xff) i += 1 // fill byte
          else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01)
            i += 2 // standalone markers carry no length
          else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 &&
              m != 0xcc) {
            if (i + 8 < bytes.length)
              out = Some((be16(i + 7), be16(i + 5), "jpeg"))
            else i = bytes.length // truncated SOF → unrecognized
          } else i += 2 + (if (i + 3 < bytes.length) be16(i + 2) else
            bytes.length) // skip segment by its declared length
        }
      }
      out
    } else None
  }

  /** ==STUB== deterministic fake resize: new metadata after scaling. */
  def resizeStub(meta: Row, maxSide: Int): (Int, Int) = {
    val (w, hgt) = (meta.getInt(0), meta.getInt(1))
    val scale = math.min(1.0, maxSide.toDouble / math.max(w, hgt))
    (math.max(1, (w * scale).toInt), math.max(1, (hgt * scale).toInt))
  }

  /** Attach a binary payload column derived from a string column (the
    * ingest shape; real pipelines read binary files via
    * `spark.read.format("binaryFile")`). */
  def withPayload(df: DataFrame, from: String = "text"): DataFrame =
    df.withColumn("payload", col(from).cast(BinaryType))

  /** Decode payloads to typed metadata via mapPartitions: per-partition
    * decoder init, row-streaming, no driver collect. Recognized image
    * containers (PNG/JPEG/GIF/BMP) get REAL header-parsed metadata via
    * [[sniffImageMeta]]; anything else falls back to the deterministic
    * decode stub (the codec stand-in). */
  def decodeMeta(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("meta", MediaMetaSchema))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      // decoder init would happen here, once per partition
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        // null payload -> null metadata, not an executor NPE
        if (bytes == null) Row.fromSeq(r.toSeq :+ null)
        else sniffImageMeta(bytes) match {
          case Some((w, h, f)) =>
            Row.fromSeq(r.toSeq :+ Row(w, h, f, bytes.length.toLong))
          case None =>
            val (w, h, f, n) = decodeImageStub(bytes)
            Row.fromSeq(r.toSeq :+ Row(w, h, f, n))
        }
      }
    }(enc)
  }

  /** Feature extraction over binary payloads via mapPartitions: a
    * 16-bin normalized byte histogram as a float vector. Unlike the
    * decode stub this is a *real* (if simple) feature — its output
    * feeds directly into [[graft.engine.Similarity]]'s cosine/LSH
    * operators, completing the media → features → ANN pipeline shape. */
  def featureExtract(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType)))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        // empty payloads get NULL features, not an all-zero vector: the
        // ANN/similarity consumers this output feeds document a
        // non-zero-vector contract (cosine divides by the norm), so a
        // zero vector would be a latent divide-by-zero/NaN downstream
        if (bytes == null || bytes.isEmpty) Row.fromSeq(r.toSeq :+ null)
        else {
          val hist = new Array[Float](16)
          var i = 0
          while (i < bytes.length) {
            hist((bytes(i) & 0xff) >> 4) += 1f
            i += 1
          }
          val n = math.max(1, bytes.length).toFloat
          Row.fromSeq(r.toSeq :+ hist.map(_ / n).toSeq)
        }
      }
    }(enc)
  }

  /** Frame sampling: byte-range slices standing in for video frames —
    * the partition/fan-out shape of real frame extraction (one row per
    * sampled frame, linear fan-out, no shuffle). Frame count is
    * `(octet_length-1) DIV every` (the chunkSigs tiling formula): every
    * byte lands in exactly one frame, with a short tail frame — the
    * previous `DIV every - 1` dropped the trailing partial frame of any
    * payload ≥ `every` bytes while keeping it for smaller ones. */
  def sampleFrames(df: DataFrame, every: Int, payloadCol: String = "payload"): DataFrame =
    df.withColumn("frame_no",
        explode(sequence(lit(0),
          greatest(expr(s"(octet_length($payloadCol) - 1) DIV $every"), lit(0)))))
      .withColumn("frame",
        substring(col(payloadCol), (col("frame_no") * every + 1).cast("int"), lit(every)))
}
