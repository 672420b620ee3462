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

  /** Typed audio/video metadata schema ([[decodeAvMeta]]): container
    * kind, duration, and the axis that exists for the medium (sample
    * rate/channels for audio, pixel dims for video); absent fields are
    * null. */
  val AvMetaSchema: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("duration_ms", LongType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** REAL audio-header parse — WAV/RIFF: walks the chunk list to
    * `fmt ` (channels LE16@2, sample rate LE32@4, byte rate LE32@8 of
    * the chunk body) and `data` (payload size → duration = bytes /
    * byte-rate). Pure header arithmetic, no codec; None for anything
    * that isn't a well-formed RIFF/WAVE. */
  def sniffWavMeta(bytes: Array[Byte]): Option[(Long, Int, Int)] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      le16(i).toLong | (le16(i + 2).toLong << 16)
    if (bytes == null || bytes.length < 44) return None
    if (!(u8(0) == 'R' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == 'F' &&
        u8(8) == 'W' && u8(9) == 'A' && u8(10) == 'V' && u8(11) == 'E'))
      return None
    var i = 12
    var rate = 0; var ch = 0; var byteRate = 0L; var dataLen = -1L
    while (i + 8 <= bytes.length && (rate == 0 || dataLen < 0)) {
      val id = new String(bytes.slice(i, i + 4), "ISO-8859-1")
      val len = le32(i + 4)
      if (id == "fmt " && i + 16 + 8 <= bytes.length) {
        ch = le16(i + 10)
        rate = le32(i + 12).toInt
        byteRate = le32(i + 16)
      } else if (id == "data") dataLen = len
      // chunks are word-aligned: odd sizes carry a pad byte
      i += 8 + len.toInt + (len.toInt & 1)
    }
    if (rate <= 0 || ch <= 0) None
    else {
      val durMs = if (byteRate > 0 && dataLen >= 0)
        dataLen * 1000L / byteRate else -1L
      Some((durMs, rate, ch))
    }
  }

  /** REAL video-header parse — ISO BMFF (MP4/MOV): verifies `ftyp`,
    * then walks top-level boxes to `moov`, reads `mvhd` (timescale +
    * duration → milliseconds; version 0 = 32-bit fields, version 1 =
    * 64-bit) and the first `trak`'s `tkhd` (width/height as 16.16
    * fixed point in the last 8 bytes). Box walking only — no sample
    * tables, no codec. None for anything not starting with ftyp. */
  def sniffMp4Meta(bytes: Array[Byte]): Option[(Long, Int, Int)] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def be32(i: Int): Long = ((u8(i).toLong << 24) | (u8(i + 1) << 16) |
      (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def boxType(i: Int): String = new String(bytes.slice(i + 4, i + 8), "ISO-8859-1")
    if (bytes == null || bytes.length < 16 || boxType(0) != "ftyp") return None
    // walk [from, until) top-level boxes for `name`; returns body offset
    def find(name: String, from: Int, until: Int): Int = {
      var i = from
      while (i + 8 <= until) {
        val sz = be32(i)
        if (boxType(i) == name) return i
        if (sz < 8) return -1 // malformed: avoid an infinite loop
        i += sz.toInt
      }
      -1
    }
    val end = bytes.length
    val moov = find("moov", 0, end)
    if (moov < 0) return None
    val moovEnd = math.min(end, moov + be32(moov).toInt)
    val mvhd = find("mvhd", moov + 8, moovEnd)
    var durMs = -1L
    if (mvhd >= 0) {
      val v = u8(mvhd + 8)
      if (v == 1 && mvhd + 40 <= end) {
        val scale = be32(mvhd + 28); val dur = be64(mvhd + 32)
        if (scale > 0) durMs = dur * 1000L / scale
      } else if (v == 0 && mvhd + 28 <= end) {
        val scale = be32(mvhd + 20); val dur = be32(mvhd + 24)
        if (scale > 0) durMs = dur * 1000L / scale
      }
    }
    val trak = find("trak", moov + 8, moovEnd)
    var w = 0; var h = 0
    if (trak >= 0) {
      val trakEnd = math.min(moovEnd, trak + be32(trak).toInt)
      val tkhd = find("tkhd", trak + 8, trakEnd)
      if (tkhd >= 0) {
        val sz = be32(tkhd).toInt
        if (tkhd + sz <= end && sz >= 24) {
          // width/height are the box's last two 16.16 fixed-point words
          w = (be32(tkhd + sz - 8) >> 16).toInt
          h = (be32(tkhd + sz - 4) >> 16).toInt
        }
      }
    }
    Some((durMs, w, h))
  }

  /** Decode audio/video payloads to [[AvMetaSchema]] via mapPartitions —
    * the same per-partition-init batching as [[decodeMeta]]. WAV and
    * MP4 headers are parsed for real; unrecognized payloads get a null
    * meta (callers route those to the stubbed pixel/sample decoders). */
  def decodeAvMeta(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("av_meta", AvMetaSchema))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val meta =
          if (bytes == null) null
          else sniffWavMeta(bytes) match {
            case Some((dur, rate, ch)) =>
              Row("wav", dur, rate, ch, null, null)
            case None => sniffMp4Meta(bytes) match {
              case Some((dur, w, h)) =>
                Row("mp4", dur, null, null, w, h)
              case None => null
            }
          }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(enc)
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
