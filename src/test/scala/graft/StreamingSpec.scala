package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps
import graft.streaming.StreamOps.{Event, SessionOut}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    new Timestamp(1700000000000L + minute * 60000L)

  test("hourlyCounts: windowed streaming aggregation over a memory stream") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(5), 1, "click", 2.0),
      Event(3, ts(70), 2, "view", 3.0))
    val q = StreamOps.hourlyCounts(mem.toDF())
      .writeStream.format("memory").queryName("hc").outputMode(OutputMode.Update)
      .start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("hc").select("event_type", "n")
      .as[(String, Long)].collect().toMap
    assert(rows("click") == 2 && rows("view") == 1)
  }

  test("dedupEvents drops replayed event ids within the watermark") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(1, ts(0), 1, "click", 1.0), // exact replay
      Event(2, ts(1), 1, "view", 2.0))
    val q = StreamOps.dedupEvents(mem.toDF())
      .writeStream.format("memory").queryName("dd").outputMode(OutputMode.Append)
      .start()
    q.processAllAvailable()
    mem.addData(Event(2, ts(2), 1, "view", 2.0)) // replayed id, later batch
    q.processAllAvailable(); q.stop()
    val ids = spark.table("dd").select("event_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L))
  }

  test("sessionize: stateful session closes after the gap, emits on close") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamOps.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sess").outputMode(OutputMode.Append)
      .start()
    mem.addData(Event(1, ts(0), 7, "a", 1.0), Event(2, ts(5), 7, "a", 1.0))
    q.processAllAvailable()
    // 40-min gap → first session (2 events) closes when this arrives
    mem.addData(Event(3, ts(45), 7, "a", 1.0))
    q.processAllAvailable(); q.stop()
    val out = spark.table("sess").as[SessionOut].collect()
    assert(out.length == 1)
    assert(out(0).n_events == 2 && out(0).user_id == 7)
  }

  test("sessionize: a late in-watermark event merges without moving the session back") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamOps.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sesslate").outputMode(OutputMode.Append)
      .start()
    mem.addData(Event(1, ts(20), 7, "a", 1.0))
    q.processAllAvailable()
    // a legitimately LATE event (15 < 20, inside the 2h watermark):
    // must merge via min/max — the pre-fix fold overwrote last=15, so
    // the next on-time event spuriously split the session (and could
    // emit end < start)
    mem.addData(Event(2, ts(15), 7, "a", 1.0))
    q.processAllAvailable()
    mem.addData(Event(3, ts(40), 7, "a", 1.0)) // 20 min after last=20: same session
    q.processAllAvailable()
    mem.addData(Event(4, ts(95), 7, "a", 1.0)) // 55 min gap: closes it
    q.processAllAvailable(); q.stop()
    val out = spark.table("sesslate").as[SessionOut].collect()
    assert(out.length == 1, s"expected one closed session, got ${out.toSeq}")
    assert(out(0).n_events == 3)
    assert(out(0).start_us == ts(15).getTime * 1000)
    assert(out(0).end_us == ts(40).getTime * 1000)
    assert(out(0).end_us >= out(0).start_us)
  }

  test("sessionize: a straggler more than gapUs before the open session " +
      "closes as its own session, not a backwards merge") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamOps.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sessstrag")
      .outputMode(OutputMode.Append)
      .start()
    mem.addData(Event(1, ts(60), 7, "a", 1.0))
    q.processAllAvailable()
    // within the 2h watermark but 60 min before the open session's
    // start (gap = 30 min): the batch fold would place these in their
    // own session — two stragglers 5 min apart chain together
    mem.addData(Event(2, ts(0), 7, "a", 1.0), Event(3, ts(5), 7, "a", 1.0))
    q.processAllAvailable()
    mem.addData(Event(4, ts(150), 7, "a", 1.0)) // 90 min gap: closes ts(60)
    q.processAllAvailable(); q.stop()
    val out = spark.table("sessstrag").as[SessionOut].collect()
      .sortBy(_.start_us)
    assert(out.length == 2, s"expected straggler + main sessions: ${out.toSeq}")
    assert(out(0).n_events == 2 && out(0).start_us == ts(0).getTime * 1000
      && out(0).end_us == ts(5).getTime * 1000)
    assert(out(1).n_events == 1 && out(1).start_us == ts(60).getTime * 1000)
  }

  test("dedupEvents drops replayed ids within the watermark") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamOps.dedupEvents(mem.toDF())
      .writeStream.format("memory").queryName("ddev").outputMode(OutputMode.Append)
      .start()
    mem.addData(
      Event(1, ts(0), 7, "a", 1.0),
      Event(1, ts(1), 7, "a", 1.0), // replay of id 1 → dropped
      Event(2, ts(2), 7, "a", 1.0))
    q.processAllAvailable(); q.stop()
    val out = spark.table("ddev").select("event_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 2L))
  }

  test("clicksAfterErrors: stream-stream interval join matches only in-window same-user clicks") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(10), 7, "error", 0.0),
      Event(2, ts(15), 7, "click", 1.0),  // +5 min, same user → match
      Event(3, ts(40), 7, "click", 1.0),  // +30 min → outside window
      Event(4, ts(12), 8, "click", 1.0))  // other user → no match
    val q = StreamOps.clicksAfterErrors(mem.toDF())
      .writeStream.format("memory").queryName("ssj").outputMode(OutputMode.Append)
      .start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("ssj").select("err_id", "user_id")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 7L)))
  }

  test("sessionize: event-time timeout flushes an idle user's final session") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamOps.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sess_to").outputMode(OutputMode.Append)
      .start()
    mem.addData(Event(1, ts(0), 7, "a", 1.0))
    q.processAllAvailable()
    // another user far in the future advances the watermark (2h delay)
    // past user 7's last+gap; the following batch fires the timeout
    mem.addData(Event(2, ts(300), 8, "a", 1.0))
    q.processAllAvailable()
    mem.addData(Event(3, ts(301), 8, "a", 1.0))
    q.processAllAvailable(); q.stop()
    val out = spark.table("sess_to").as[SessionOut].collect()
    assert(out.exists(s => s.user_id == 7 && s.n_events == 1),
      s"expected user 7's final session flushed by timeout, got ${out.toSeq}")
  }

  test("asofStreamAgainstStatic matches the batch as-of join on the same data") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // snapshot table: per-user plan changes over time (equal-time tie
    // at t=4 for user 1 — max rid must win, as in the batch join)
    val snaps = Seq(
      (1L, 4L, 40L, "basic"), (1L, 4L, 41L, "plus"), (1L, 9L, 90L, "pro"),
      (2L, 6L, 60L, "basic"))
      .toDF("user_id", "st", "rid", "plan")
    val eventsSeq = Seq(
      (100L, 1L, 10L), // after t=9 → pro
      (101L, 1L, 4L),  // inclusive tie → plus (rid 41)
      (102L, 2L, 5L),  // before user 2's first snapshot → null
      (103L, 3L, 7L))  // no snapshots for user 3 → null
    val batch = graft.engine.AsOfJoin.asofLatest(
      eventsSeq.toDF("id", "user_id", "t"), snaps,
      "user_id", "user_id", "t", "st", Seq("rid", "plan"), Seq("rid"))
      .select("id", "rid", "plan")
    val mem = MemoryStream[(Long, Long, Long)]
    val stream = StreamOps.asofStreamAgainstStatic(
      mem.toDS().toDF("id", "user_id", "t"), snaps,
      "user_id", "t", "st", Seq("rid", "plan"), Seq("rid"))
      .select("id", "rid", "plan")
    val q = stream.writeStream.format("memory").queryName("asofst")
      .outputMode(OutputMode.Append).start()
    mem.addData(eventsSeq: _*)
    q.processAllAvailable(); q.stop()
    val got = spark.table("asofst").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) "" else r.getString(2))).toSet
    val want = batch.collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) "" else r.getString(2))).toSet
    assert(got == want, s"stream $got != batch $want")
    assert(want == Set((100L, 90L, "pro"), (101L, 41L, "plus"),
      (102L, -1L, ""), (103L, -1L, "")))
  }

  test("dedupStreamAgainstCorpus drops corpus near-dups, passes novel/short docs") {
    implicit val sq = spark.sqlContext
    def doc(lo: Int, n: Int): String = (lo until lo + n).map(i => s"w$i").mkString(" ")
    val corpus = Seq((1L, doc(0, 50)), (2L, doc(100, 50)))
      .toDF("doc_id", "text")
    val cSets = graft.engine.TextOps.shingleSets(corpus)
    val cSig = graft.engine.TextOps.minhashSignatureFromSets(cSets)
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.dedupStreamAgainstCorpus(
        mem.toDF().toDF("doc_id", "text"), cSets, cSig)
      .writeStream.format("memory").queryName("sdd").outputMode(OutputMode.Append)
      .start()
    val nearOf1 = (doc(0, 49).split(" ") :+ "zzz").mkString(" ")
    mem.addData(
      (201L, doc(0, 50)),   // exact dup of corpus doc 1 -> dropped
      (202L, doc(300, 50)), // novel -> kept
      (203L, nearOf1),      // near-dup of corpus doc 1 -> dropped
      (204L, "a b"))        // under 3 tokens: no shingles -> kept
    q.processAllAvailable(); q.stop()
    val kept = spark.table("sdd").select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(202L, 204L), s"got ${kept.toSeq}")
  }

  test("dedupStreamAgainstCorpus rejects a hash-family mismatch like its batch twin") {
    implicit val sq = spark.sqlContext
    def doc(lo: Int, n: Int): String = (lo until lo + n).map(i => s"w$i").mkString(" ")
    val corpus = Seq((1L, doc(0, 50))).toDF("doc_id", "text")
    val cSets = graft.engine.TextOps.shingleSets(corpus)
    val cSigH28 = graft.engine.TextOps.minhashSignatureFromSets(cSets,
      graft.engine.PortableHash.h28)
    val mem = MemoryStream[(Long, String)]
    val e = intercept[IllegalArgumentException] {
      StreamOps.dedupStreamAgainstCorpus(
        mem.toDF().toDF("doc_id", "text"), cSets, cSigH28) // default fast28
    }
    assert(e.getMessage.contains("hash-family mismatch"))
  }

  test("cleanSpanStream drops chunks whose digest is in the frozen index") {
    implicit val sq = spark.sqlContext
    def doc(lo: Int, n: Int): String = (lo until lo + n).map(i => s"w$i").mkString(" ")
    import graft.engine.TextOps
    // frozen index: chunk digests of one corpus doc (>=1 full window)
    val corpus = Seq((1L, doc(0, 80))).toDF("doc_id", "text")
    val idx = StreamOps.chunkStream(corpus).select("sig")
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.cleanSpanStream(mem.toDF().toDF("doc_id", "text"), idx)
      .writeStream.format("memory").queryName("css").outputMode(OutputMode.Append)
      .start()
    mem.addData(
      (301L, doc(0, 80)),    // same spans as corpus doc -> all chunks dropped
      (302L, doc(500, 80)))  // novel spans -> all chunks kept
    q.processAllAvailable(); q.stop()
    val out = spark.table("css").select("doc_id").as[Long].collect()
    assert(out.nonEmpty && out.forall(_ == 302L), s"got ${out.toSeq}")
    // chunk count matches the batch chunker's geometry for the survivor
    assert(out.length ==
      ((80 - 1) / TextOps.ChunkStride + 1), s"got ${out.length}")
  }

  test("qualityGateStream admits exactly the batch recipe's keep set") {
    implicit val sq = spark.sqlContext
    import graft.engine.TextOps
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.qualityGateStream(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("qg").outputMode(OutputMode.Append)
      .start()
    // 40 distinct-token docs (mid grade, 50% keep) + one 3-token doc
    // (low grade, 10% keep)
    val docs = (1L to 40L).map(i =>
      (i, (0 until 40).map(j => s"w${i}_$j").mkString(" "))) :+
      (99L, "a b c")
    mem.addData(docs: _*)
    q.processAllAvailable(); q.stop()
    val kept = spark.table("qg").select("doc_id").as[Long].collect().toSet
    // reference decision from the batch flags on the same frame
    val want = TextOps.qualityFlags(docs.toDF("doc_id", "text"))
      .filter("keep").select("doc_id").as[Long].collect().toSet
    assert(kept == want)
    assert(kept.nonEmpty && kept.size < docs.size, "gate must actually sample")
  }

  test("scrubStream redacts in-flight, matching the batch scrub per row") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.scrubStream(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("scr").outputMode(OutputMode.Append)
      .start()
    mem.addData(
      (1L, "the customer saw a vector"), // two dictionary hits
      (2L, "no dictionary words here"))  // zero hits: digest = md5(text)
    q.processAllAvailable(); q.stop()
    val out = spark.table("scr")
      .select("doc_id", "n_hits", "scrub_len", "sig")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    val scrub1 = "the <X> saw a <X>"
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(out(0) == ((1L, 2L, scrub1.length.toLong, md5hex(scrub1))))
    assert(out(1)._2 == 0L && out(1)._4 == md5hex("no dictionary words here"))
  }

  test("scd2Stream: CDC micro-batches maintain the versioned dimension") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions.{col, lit, to_date}
    // published dimension lives across batches (the foreachBatch state)
    var dim = Seq((1, "A"), (2, "B")).toDF("k", "seg")
      .select(col("k"), col("seg"),
        to_date(lit("2020-01-01")).as("valid_from"),
        lit(null).cast("date").as("valid_to"), lit(true).as("is_current"))
    val mem = MemoryStream[(Int, String, Long)]
    val q = StreamOps.scd2Stream(
      mem.toDF().toDF("k", "seg", "seq"),
      keys = Seq("k"), seqCol = "seq",
      getDim = () => dim,
      publish = d => {
        dim = spark.createDataFrame(
          java.util.Arrays.asList(d.collect(): _*), d.schema)
      },
      eff = () => to_date(lit("2022-06-01")))
    try {
      // batch 1: k=1 changes twice in one batch (last-by-seq wins: A2),
      // k=2 re-delivered unchanged (no-op), k=9 brand new
      mem.addData((1, "A1", 10L), (1, "A2", 11L), (2, "B", 12L), (9, "Z", 13L))
      q.processAllAvailable()
      val afterB1 = dim.orderBy("k", "valid_from")
        .select("k", "seg", "is_current")
        .as[(Int, String, Boolean)].collect().toSeq
      assert(afterB1 == Seq(
        (1, "A", false), (1, "A2", true),
        (2, "B", true), (9, "Z", true)))
      // batch 2: re-deliver batch 1's final state — must be a pure no-op
      mem.addData((1, "A2", 20L), (9, "Z", 21L))
      q.processAllAvailable()
      val afterB2 = dim.orderBy("k", "valid_from")
        .select("k", "seg", "is_current")
        .as[(Int, String, Boolean)].collect().toSeq
      assert(afterB2 == afterB1, "idempotent re-delivery versioned rows")
    } finally q.stop()
  }
}
