package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming extension layer.
  *
  * The reference has no streaming surface at all (SURVEY.md §1.1), so
  * nothing here participates in the oracle-verified inventory — this is
  * the forward-looking streaming path for the same event schema the
  * batch operators use: file/rate sources → watermark → windowed aggs →
  * stateful sessionization via flatMapGroupsWithState.
  *
  * Scale notes: windowed counts shuffle once on (window, event_type);
  * session state is per-user in the state store, sized by active users,
  * with event-time timeout so state drains as watermarks advance.
  */
object StreamOps {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)

  final case class SessionState(start: Long, last: Long, n: Long, total: Double)

  final case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, total: Double)

  /** True event-time micros of a timestamp — `getTime` alone is MILLIS,
    * which would round every boundary down a millisecond and break
    * bit-equivalence with the batch twin's microsecond arithmetic. */
  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000 + (ts.getNanos / 1000) % 1000

  /** File-based event stream over the same parquet schema the batch path
    * reads (a directory Spark watches for new files). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
      .parquet(dir)

  /** Tumbling 1-hour windowed counts with a 2-hour watermark — the
    * streaming twin of Events.eventsWindow. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("total"))

  /** Stateful gap sessionization (30-min inactivity): one state entry per
    * user, emitted when the gap closes the session — either by a later
    * event from the same user, or by the event-time timeout when the
    * watermark passes last+gap (so idle users' final sessions emit and
    * their state is dropped; without the timeout, state grows with every
    * user ever seen). Streaming twin of Events.sessionizeUs. */
  def sessionize(events: Dataset[Event], gapUs: Long = 30L * 60 * 1000 * 1000)(
      implicit enc1: org.apache.spark.sql.Encoder[SessionOut]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap with no new events: flush the
            // final session and drop the state entry
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, s.start, s.last, s.n, s.total))
          } else {
            // Batch-per-trigger events arrive unordered within the group:
            // sort by event time, then fold session windows.
            val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var st = state.getOption
            // Late-chain state: within-watermark events more than gapUs
            // BEFORE the open session's start belong to their own,
            // already-closed session (the batch fold would never merge
            // them — an unconditional min/max merge here diverged from
            // the batch twin). Consecutive stragglers within gapUs of
            // each other chain together. By construction every straggler
            // is > gapUs before s.start, so a chain can never bridge
            // into the open session; the one residual approximation is
            // an event within gapUs of BOTH the chain and s.start — it
            // merges forward (batch would fuse chain+event+session).
            var strag: Option[SessionState] = None
            val out = Seq.newBuilder[SessionOut]
            def closeStrag(): Unit = {
              strag.foreach(g =>
                out += SessionOut(userId, g.start, g.last, g.n, g.total))
              strag = None
            }
            sorted.foreach { ev =>
              val us = micros(ev.ts)
              st match {
                case Some(s) if us >= s.start - gapUs && us - s.last <= gapUs =>
                  // min/max, not overwrite: a legitimately LATE event
                  // (inside the watermark, us < s.last) merges into the
                  // open session — a bare `last = us` would move the
                  // session boundary BACKWARDS, spuriously splitting on
                  // the next on-time event and even emitting end < start
                  st = Some(s.copy(start = math.min(s.start, us),
                    last = math.max(s.last, us),
                    n = s.n + 1, total = s.total + ev.value))
                case Some(s) if us < s.start - gapUs =>
                  strag match {
                    case Some(g) if us - g.last <= gapUs && us >= g.start - gapUs =>
                      strag = Some(g.copy(start = math.min(g.start, us),
                        last = math.max(g.last, us),
                        n = g.n + 1, total = g.total + ev.value))
                    case _ =>
                      closeStrag()
                      strag = Some(SessionState(us, us, 1, ev.value))
                  }
                case Some(s) =>
                  closeStrag()
                  out += SessionOut(userId, s.start, s.last, s.n, s.total)
                  st = Some(SessionState(us, us, 1, ev.value))
                case None =>
                  st = Some(SessionState(us, us, 1, ev.value))
              }
            }
            closeStrag()
            st.foreach { s =>
              state.update(s)
              // timeouts must sit strictly beyond the current watermark
              state.setTimeoutTimestamp(math.max(
                s.last / 1000 + gapUs / 1000,
                state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }

  /** Stream-stream interval join — the streaming twin of
    * Events.rangeJoin: each error event joins the same user's click
    * events in the following 10 minutes. Both sides carry watermarks and
    * the join condition time-bounds both streams, so the state store
    * retains each side only within its horizon (watermark + interval) —
    * bounded state, the requirement for an unbounded run. */
  def clicksAfterErrors(events: DataFrame): DataFrame = {
    val err = events.withWatermark("ts", "1 hour")
      .filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id"), col("ts").as("ets"))
    val clk = events.withWatermark("ts", "1 hour")
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_uid"), col("ts").as("cts"))
    err.join(clk, expr(
      "user_id = c_uid AND cts > ets AND cts <= ets + INTERVAL 10 MINUTES"))
      .select(col("err_id"), col("user_id"), col("ets"), col("cts"))
  }

  /** Streaming exact dedup: drop replayed event ids inside the watermark
    * horizon — the streaming twin of the batch keyed dedup. Must be
    * `dropDuplicatesWithinWatermark`: plain `dropDuplicates(event_id)`
    * only evicts state when the event-time column is PART OF THE KEY, so
    * despite the watermark it would keep one state entry per id ever
    * seen — unbounded growth on a long-running stream. */
  def dedupEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming near-dup filter against a FROZEN corpus index — the
    * streaming twin of `TextOps.dedupIncremental`'s corpus leg: documents
    * arriving on the stream are dropped when they near-dup (exact shingle
    * Jaccard ≥ `threshold`, candidates from MinHash LSH banding) any doc
    * in the materialized corpus index (`TextOps.sharedShingleSets` /
    * `sharedSignature`, or any frame with their schemas).
    *
    * Fully STATELESS: the signature is computed per row with array HOFs
    * (no groupBy, no state store, no watermark needed), each of the 4
    * band checks is a stream-static LEFT ANTI join whose condition embeds
    * the exact-Jaccard verification, and a row survives only if no band
    * verifies a dup — identical semantics to the batch corpus leg. Docs
    * under 3 tokens have null signatures, match nothing, and pass
    * through. In-stream (batch-to-batch) dedup is a separate concern:
    * compose with [[dedupEvents]]-style `dropDuplicates` on a normalized
    * text hash inside a watermark. */
  def dedupStreamAgainstCorpus(docs: DataFrame, corpusSets: DataFrame,
      corpusSig: DataFrame, threshold: Double = 0.8,
      hash: Column => Column = graft.engine.PortableHash.fast28): DataFrame = {
    // `hash` MUST be the family corpusSig was built with (families never
    // band-collide across each other → silent no-op dedup): fast28 pairs
    // with the minhashSignature library default; pass h28 for the
    // oracle-staged sharedSignature tables. Enforced structurally, like
    // the batch twin: a stamped corpusSig with a different family throws.
    graft.engine.TextOps.requireFamilyMatch(corpusSig, hash)
    import graft.engine.TextOps.{tokens, shingles3, withSignatureFromHx, Bands, NumHashes}
    val withSig = withSignatureFromHx(docs
      .withColumn("toks", tokens(col("text")))
      .withColumn("s", shingles3(col("toks")))
      .drop("toks")
      .withColumn("hx", transform(col("s"), sh => hash(sh))))
    def bandKey(pfx: String, b: Int) = concat_ws("_",
      col(s"$pfx${3 * b}"), col(s"$pfx${3 * b + 1}"), col(s"$pfx${3 * b + 2}"))
    val helperCols = Seq("s", "hx") ++ (0 until NumHashes).map(j => s"h$j")
    // Build the (signature, shingle-set) corpus index ONCE: constructing
    // it inside the band fold re-ran the corpus-sized equi-join four
    // times per micro-batch. One static join, four cheap band-key
    // projections of it.
    val corpusIdx = corpusSig.join(
      corpusSets.select(col("doc_id"), col("s").as("c_s")), Seq("doc_id"))
    val kept = (0 until Bands).foldLeft(withSig) { (cur, b) =>
      val idx = corpusIdx.select(bandKey("h", b).as("c_sig"), col("c_s"))
      cur.join(idx,
        bandKey("h", b) === col("c_sig") &&
          size(array_intersect(col("s"), col("c_s"))) /
            size(array_union(col("s"), col("c_s"))) >= threshold,
        "left_anti")
    }
    kept.drop(helperCols: _*)
  }

  /** Streaming chunker — the streaming twin of `TextOps.chunkDocs`:
    * overlapping token windows with per-chunk digests, computed
    * STATELESSLY per row (map + bounded explode; no state store, no
    * watermark), so arriving documents are chunked for training prep
    * in-flight. Emits (doc_id, chunk_id, n_tok_chunk, sig). */
  def chunkStream(docs: DataFrame): DataFrame =
    graft.engine.TextOps.chunkSigs(docs)

  /** Streaming span-level contamination/dup filter against a FROZEN
    * chunk-digest index: chunks arriving on the stream are dropped when
    * their token-window digest appears in the index (e.g. the benchmark
    * suite's chunk table, or the corpus's `TextOps.chunkDocs` output) —
    * the at-ingest twin of `q_span_dedup`/`q_contaminate`, emitting only
    * clean chunks. Stateless: one stream-static LEFT ANTI equi-join on
    * the 16-byte digest; the index side is corpus-chunk-sized, never the
    * corpus text. (A document-level "drop the whole doc if any chunk
    * hits" needs per-doc aggregation — stream state — so that variant
    * stays batch-side: `TextOps.dedupIncremental`/`contamination`.) */
  def cleanSpanStream(docs: DataFrame, corpusChunkSigs: DataFrame): DataFrame =
    chunkStream(docs)
      .join(corpusChunkSigs.select(col("sig")), Seq("sig"), "left_anti")

  /** Streaming redaction — the streaming twin of `q_pii_scrub`: the
    * dictionary scrub is a pure per-row map (count, replace, re-digest),
    * so documents are scrubbed at ingest, BEFORE any digest-keyed dedup
    * state sees them (scrub-then-dedup ordering matters: two documents
    * differing only in redacted spans must collide). No state store, no
    * watermark. Emits (doc_id, n_hits, scrub_len, sig). */
  def scrubStream(docs: DataFrame): DataFrame =
    graft.engine.TextOps.scrubOf(docs)

  /** Streaming quality gate — at-ingest quality filtering: grade each
    * arriving document ([[graft.engine.TextOps.qualityFlags]]'s per-row
    * fold — no explode, no shuffle, no state) and keep it per the
    * quality-temperature sampling decision. The batch twin is
    * `q_quality_sample`; membership is a pure hash of doc_id, so a
    * document admitted on the stream is exactly the document the batch
    * recipe would keep — replaying the stream reproduces the corpus.
    * The input columns (text included) pass THROUGH the gate as added
    * columns on the same frame — a gate that kept only ids would force
    * downstream chunk/scrub/dedup stages into a stateful stream-stream
    * re-join to recover the text. */
  def qualityGateStream(docs: DataFrame): DataFrame =
    graft.engine.TextOps.qualityFlags(docs)
      .filter(col("keep")).drop("rate_ppm", "keep", "n_uniq")

  /** Streaming as-of enrichment against a STATIC snapshot table — the
    * streaming twin of `AsOfJoin.asofLatest`: each arriving event picks
    * up the latest same-key snapshot with snapshot-time <= event-time
    * (the dimension state that was in force when the event happened).
    *
    * The batch union+window formulation cannot stream (it sorts both
    * sides), so the streaming shape converts the static side into
    * VALIDITY INTERVALS batch-side — `lead(time)` over each key gives
    * every snapshot a [start, end) range; equal-time snapshots collapse
    * to zero-width ranges for all but the tie-break winner, matching
    * the batch max-tie-break — and then the stream joins it with a
    * plain stream-static left-outer range join: exactly one interval
    * matches per event, so the operator is STATELESS (no state store,
    * no watermark needed; unmatched events pass through with nulls,
    * the batch left-join semantics).
    *
    * Scale: the interval table is O(snapshots) and computed once per
    * trigger from the static frame; the join is the standard broadcast
    * (small dims) or shuffled stream-static hash join on the key. */
  def asofStreamAgainstStatic(events: DataFrame, snapshots: DataFrame,
      key: String, eventTime: String, snapTime: String,
      snapCols: Seq[String], tieBreak: Seq[String] = Nil): DataFrame = {
    import graft.engine.AsOfJoin
    AsOfJoin.requireSharedTimeFamily(events, eventTime, snapshots, snapTime)
    val ordCols = col("__t") +: tieBreak.map(c => col("__rpay").getField(c))
    val w = Window.partitionBy(col("__k")).orderBy(ordCols: _*)
    val iv = snapshots
      .filter(col(key).isNotNull && col(snapTime).isNotNull)
      .select(col(key).as("__k"),
        AsOfJoin.timeAsLong(snapshots, snapTime).as("__t"),
        struct(snapCols.map(col): _*).as("__rpay"))
      .withColumn("__end", lead(col("__t"), 1).over(w))
    val lt = AsOfJoin.timeAsLong(events, eventTime)
    events.join(iv,
        col(key) === col("__k") && lt >= col("__t") &&
          (col("__end").isNull || lt < col("__end")),
        "left_outer")
      .select(events.columns.toSeq.map(col) ++
        snapCols.map(c => col("__rpay").getField(c).as(c)): _*)
  }

  /** Streaming SCD Type-2 maintenance: absorb a change-batch STREAM
    * into a versioned dimension with the exact batch semantics of
    * [[graft.engine.Mutations.scd2Merge]] — the standard CDC-to-
    * warehouse sink (Kafka upserts → dimension history).
    *
    * Shape: `foreachBatch`, because an SCD2 merge is a whole-table
    * rewrite relative to the CURRENT slice — not an append — so it
    * cannot be a continuous sink; per micro-batch the merge runs the
    * single current×batch join and the caller-supplied `publish`
    * callback atomically swaps the new dimension in (a parquet
    * overwrite, a Delta MERGE, a table swap — storage-layer's choice).
    * Within a micro-batch, duplicate keys collapse to the LAST change
    * per key by `seqCol` (CDC log order): the scd2Merge single-row
    * contract, enforced here instead of pushed to every producer.
    * State between batches lives in the dimension itself — no state
    * store, so a restart resumes from the last published dimension
    * (exactly-once if `publish` is atomic, the foreachBatch norm).
    *
    * `getDim` re-reads the CURRENT dimension at each batch (the
    * previous publish's result), `eff` stamps the batch's effective
    * date. Returns the started query. */
  def scd2Stream(changes: DataFrame, keys: Seq[String], seqCol: String,
      getDim: () => DataFrame, publish: DataFrame => Unit,
      eff: () => Column): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy(col(seqCol).desc)
        val lastPerKey = batch
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .drop("__rn", seqCol)
        val merged = graft.engine.Mutations
          .scd2Merge(getDim(), lastPerKey, keys, eff())
        publish(merged)
      }
      .start()

  /** Drain a (test) stream to an in-memory table and return it. */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode = OutputMode.Append): Unit = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
  }
}
