package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Time-semantics queries over the `events` table (SURVEY.md §2C): batch
  * tumbling-window aggregation, gap-based sessionization, and JSON
  * extraction. The reference has zero streaming code (SURVEY.md §1.1) —
  * these cover the time surface in batch; the Structured Streaming
  * variants live in [[graft.streaming.StreamOps]] as an extension.
  *
  * All session math runs on epoch-microsecond longs (exact integers in
  * both engines), sidestepping nanosecond-parquet truncation semantics.
  */
object Events {

  /** events with `us` = epoch microseconds (exact long). The session
    * time zone must be UTC for cross-engine parity (the Verify/Bench
    * mains and the test session all pin it): DuckDB's oracle takes
    * `epoch_us` of the naive timestamp, and a non-UTC session would
    * shift every cast here by the zone offset. (An earlier TimestampNTZ
    * branch wrapped the cast in `to_utc_timestamp(_, "UTC")`, which is
    * the identity — it delivered nothing the plain cast doesn't.) */
  private def ev(s: SparkSession, d: String): DataFrame =
    Sources.events(s, d).withColumn("us",
      unix_micros(col("ts").cast("timestamp")).cast(LongType))

  /** Tumbling 1-hour window aggregation (batch stand-in for a streaming
    * windowed count; epoch-aligned so `window().start` ==
    * `date_trunc('hour')`). */
  def eventsWindow(s: SparkSession, d: String): DataFrame =
    // undated events are excluded EXPLICITLY in both engines: Spark's
    // window() silently drops null timestamps while a SQL GROUP BY
    // keeps a NULL bucket — the filter pins one semantics portably
    ev(s, d).filter(col("us").isNotNull)
      .groupBy(window(timestamp_micros(col("us")), "1 hour").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        Types.outD(sum(Types.money(col("value")))).as("total"))
      .select(unix_micros(col("w.start")).as("hour_start_us"),
        col("event_type"), col("n"), col("total"))
      .orderBy("hour_start_us", "event_type")

  /** Gap-based sessionization as a reusable operator: input needs
    * (user_id, event_id, us, value); output is one row per session.
    * lag → new-session flag → running sum as session id → rollup.
    *
    * The session-id sum rides a RANGE frame ordered by `us` ALONE, not
    * a ROWS frame over the lag window's (us, event_id) order. With a
    * ROWS frame, fully identical replayed rows straddling a session
    * boundary are a trap: the lag pass gives flag=1 to whichever twin
    * it visits first and flag=0 to the rest, and the running-sum pass
    * re-sorts — ties may land in a DIFFERENT order there (measured:
    * DuckDB 1.0 does exactly this across two window clauses, fuzz seed
    * 78), so a flag-0 twin can precede the flag-1 twin and inherit the
    * PREVIOUS session. A RANGE frame sums flags over the whole same-us
    * peer group, making the session id a function of the row MULTISET:
    * same-timestamp rows always share a session (their mutual gap is
    * zero), whichever engine-internal order the ties take. For
    * distinct timestamps RANGE ≡ ROWS, so green behavior is
    * unchanged. */
  def sessionizeUs(events: DataFrame, gapUs: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    events
      // project to exactly the session-relevant columns BEFORE the
      // window: (a) replayed events that tie on (us, event_id) but
      // differ in an unused column (event_type, props) would make the
      // window order engine-dependent — after the projection any such
      // tie is a fully identical row, hence interchangeable (the
      // ContractSpec window guard checks this); (b) the user-keyed
      // shuffle stops carrying the unused wide columns
      .select(col("user_id"), col("event_id"), col("us"), col("value"))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("flag",
        when(col("prev_us").isNull, 1)
          .when(col("us") - col("prev_us") > gapUs, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("flag")).over(
        Window.partitionBy(col("user_id")).orderBy(col("us"))
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"), max(col("us")).as("end_us"),
        Types.outD(sum(Types.money(col("value")))).as("total"))
  }

  /** Sliding-window aggregation (1-hour windows every 30 minutes): each
    * event lands in exactly 2 overlapping windows — Spark's Generate
    * expands the window list before the (window, type)-keyed hash agg,
    * so fan-out is the constant size/slide ratio, then partial+final
    * aggregation as usual. */
  def eventsSliding(s: SparkSession, d: String): DataFrame =
    ev(s, d).filter(col("us").isNotNull) // see eventsWindow
      .groupBy(window(timestamp_micros(col("us")), "1 hour", "30 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        Types.outD(sum(Types.money(col("value")))).as("total"))
      .select(unix_micros(col("w.start")).as("win_start_us"),
        col("event_type"), col("n"), col("total"))
      .orderBy("win_start_us", "event_type")

  /** Gap-based sessionization of the events table (30-min gap). */
  def eventsSession(s: SparkSession, d: String): DataFrame =
    sessionizeUs(ev(s, d), 30L * 60 * 1000 * 1000).orderBy("user_id", "sid")

  /** JSON scalar extraction over the `props` JSON-string column. */
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** As-of join: each sampled event picks the latest order (by order
    * date, then order key) placed by the same user at or before the
    * event's day — via [[AsOfJoin.asofLatest]] (union+window, one
    * shuffle). */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val left = ev(s, d).filter(col("event_id") % 37 === 0)
      // FLOOR division to epoch days, not truncation: `us DIV d` rounds
      // toward zero, so a pre-1970 timestamp (us < 0) would land on the
      // day AFTER its calendar day and as-of match the next day's
      // orders, diverging from the oracle's CAST(ts AS DATE). pmod is
      // always in [0, d), so the subtraction is exactly divisible and
      // stays in integer arithmetic (no double rounding past 2^53).
      .withColumn("eday",
        expr("(us - pmod(us, 86400000000)) DIV 86400000000"))
      .select("event_id", "user_id", "eday")
      // replayed events collapse to one as-of probe (the oracle's
      // one-row-per-group window does the same); a duplicated event_id
      // on a different user/day stays a distinct probe
      .distinct()
    val right = Sources.orders(s, d)
      .withColumn("oday",
        datediff(col("o_orderdate"), to_date(lit("1970-01-01"))).cast("long"))
      .select("o_custkey", "oday", "o_orderkey", "o_totalprice")
    AsOfJoin.asofLatest(left, right,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "eday", rightTime = "oday",
        rightCols = Seq("o_orderkey", "o_totalprice"),
        tieBreak = Seq("o_orderkey"))
      .select("event_id", "user_id", "o_orderkey", "o_totalprice")
      .orderBy("event_id", "user_id", "o_orderkey", "o_totalprice")
  }

  /** Bucketed interval join (range join, the scale path): for each
    * 'error' event count the same user's 'click' events in the following
    * 10 minutes. A naive range join is an inequality nested-loop; here
    * each probe interval spans at most 2 W-wide time buckets (W = the
    * interval length), so candidates come from a plain equi-join on
    * (user_id, bucket) — one hash shuffle, constant 2× probe fan-out —
    * followed by the exact (cus ∈ (eus, eus+W]) refine. Each click lives
    * in exactly one bucket, so no candidate pair is produced twice. */
  def rangeJoin(s: SparkSession, d: String): DataFrame = {
    val W = 10L * 60 * 1000 * 1000 // 10-minute interval = bucket width, µs
    val e = ev(s, d)
    // replayed error events collapse to one probe (distinct), and the
    // click-count aggregation keys on the FULL probe identity — a
    // duplicated event_id on another user/timestamp must not merge
    // counts across probes
    val err = e.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("us").as("eus"))
      .distinct()
    val clk = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("us").as("cus"))
      .withColumn("bkt", expr(s"cus DIV $W"))
    val probes = err.withColumn("bkt",
      explode(array(expr(s"eus DIV $W"), expr(s"eus DIV $W + 1"))))
    val matched = probes.join(clk, Seq("user_id", "bkt"))
      .filter(col("cus") > col("eus") && col("cus") <= col("eus") + W)
      .groupBy(col("event_id"), col("user_id"), col("eus"))
      .agg(count(lit(1)).as("n_clicks"))
    err.join(matched, Seq("event_id", "user_id", "eus"), "left")
      .select(col("event_id"), col("user_id"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
      .orderBy("event_id", "user_id", "n_clicks")
  }

  /** Keyed dedup keep-latest: the classic CDC compaction shape — latest
    * event per (user_id, event_type) by (time, id). */
  def dedupKeyed(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us").desc, col("event_id").desc)
    ev(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "us")
      .orderBy("user_id", "event_type")
  }

  /** Ordered conversion funnel view → click → purchase: per user the
    * earliest view, the earliest click STRICTLY AFTER that view, the
    * earliest purchase strictly after that click — the sequence-aware
    * funnel (a user who purchased before ever viewing does not count),
    * which plain per-stage counts get wrong. Output: per stage, the
    * user count and the conversion rate vs the active-user base.
    *
    * The funnel is over IDENTIFIED users: null user_id rows are
    * excluded up front in both engines (an anonymous-user funnel stage
    * is meaningless, and the two engines disagree on whether NULL is a
    * "user" — count(DISTINCT) drops it, distinct().count() keeps it).
    *
    * Scale: ONE shuffle of (user_id, event_type, us). Three chained
    * unbounded-frame windows over the same user partitioning compute
    * t1 → t2 → t3 (each conditional min sees the previous stage's
    * timestamp on every row, so the sequential "after" constraint needs
    * no join), then the per-user collapse rides the SAME partitioning —
    * Catalyst reuses the exchange, so the round-4 shape's three
    * join+agg rounds (8 exchanges, 6.3 s driver-side) become
    * exchange + 3 WindowExec + partial agg (~1 s). */
  def eventsFunnel(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val perUser = ev(s, d)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"), col("us"))
      .withColumn("t1",
        min(when(col("event_type") === "view", col("us"))).over(w))
      .withColumn("t2", min(when(
        col("event_type") === "click" && col("us") > col("t1"),
        col("us"))).over(w))
      .withColumn("t3", min(when(
        col("event_type") === "purchase" && col("us") > col("t2"),
        col("us"))).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"),
        max(col("t3")).as("t3"))
    perUser
      .agg(count(lit(1)).as("n0"), count(col("t1")).as("n1"),
        count(col("t2")).as("n2"), count(col("t3")).as("n3"))
      .selectExpr(
        "stack(4, '0_users', n0, '1_view', n1, '2_click_after_view', n2, " +
          "'3_purchase_after_click', n3) AS (stage, n_users)",
        "n0")
      // zero-user guard: DuckDB renders x/0 as NULL where ANSI Spark
      // raises — mirror the NULL (the sf0 fuzz class)
      .withColumn("conv", when(col("n0") === 0, lit(null).cast("double"))
        .otherwise(col("n_users").cast("double") / col("n0")))
      .select("stage", "n_users", "conv")
      .orderBy("stage")
  }

  /** Conversion-window sensitivity: for attribution windows of 1, 6
    * and 24 hours, how many first-viewers purchase within that window
    * of their first view — the report that picks an attribution window
    * by measuring what it would claim, instead of assuming one.
    *
    * One user-keyed window pass builds (first view, first purchase
    * after it) per user; the 3-way window expansion multiplies the
    * already user-collapsed frame, never raw events. All epoch-micro
    * integer arithmetic; shares in floor ppm. Users whose only view
    * events are undated have a null first-view and are excluded in
    * both engines (SQL min skips nulls; the HAVING mirror drops them). */
  def convertWindow(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val perUser = ev(s, d).filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"), col("us"))
      .withColumn("tv",
        min(when(col("event_type") === "view", col("us"))).over(w))
      .withColumn("tp", min(when(
        col("event_type") === "purchase" && col("us") > col("tv"),
        col("us"))).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("tv")).as("tv"), max(col("tp")).as("tp"))
      .filter(col("tv").isNotNull)
    perUser
      .withColumn("window_h",
        explode(array(lit(1L), lit(6L), lit(24L))))
      .groupBy(col("window_h"))
      .agg(count(lit(1)).as("n_viewers"),
        sum(when(col("tp").isNotNull &&
            col("tp") - col("tv") <= col("window_h") * 3600000000L, 1L)
          .otherwise(0L)).as("n_converted"))
      // decimal(38,0) ppm-widening (repo invariant, SCALE.md r8):
      // count-scaled numerators never long-multiply
      .withColumn("conv_ppm",
        expr("CAST(n_converted AS DECIMAL(38,0)) * 1000000 DIV n_viewers"))
      .orderBy("window_h")
  }

  /** Microseconds per week — the cohort bucket of [[retention]]. */
  val WeekUs = 7L * 86400L * 1000000L

  /** Retention cohorts: users bucketed by the epoch week of their first
    * `signup` event; for each (cohort week, week offset ≥ 0) the count
    * of cohort members with ANY event that week — the classic BI
    * retention triangle. Activity BEFORE the signup week is excluded
    * (negative offsets), matching the standard definition.
    *
    * Scale: one user-keyed min-agg for cohorts, one co-partitioned
    * equi-join back (the cohort table carries (user_id, long) only),
    * then a COUNT(DISTINCT user) per (cohort, offset) — Expand-based
    * distinct agg with map-side partials; nothing quadratic, nothing
    * driver-side. Epoch-week arithmetic is pure integer division on
    * non-negative timestamps. */
  def retention(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d).select(col("user_id"), col("event_type"), col("us"))
    // integer DIV, never double division: us is ~1e15 and the repo rule
    // is that big-long arithmetic stays integral (timestamps are
    // non-negative here, so DIV == floor)
    val cohorts = e.filter(col("event_type") === "signup")
      .groupBy("user_id")
      .agg(expr(s"min(us) DIV $WeekUs").as("cohort_wk"))
    e.join(cohorts, Seq("user_id"))
      .withColumn("wk_offset", expr(s"us DIV $WeekUs") - col("cohort_wk"))
      .filter(col("wk_offset") >= 0)
      .groupBy("cohort_wk", "wk_offset")
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy("cohort_wk", "wk_offset")
  }

  /** First-touch / last-touch attribution: for each user with a
    * purchase, the event types of the earliest and latest event
    * STRICTLY before their first purchase, aggregated to a
    * (first_touch, last_touch) → users matrix — the standard marketing
    * attribution report.
    *
    * Scale: one user-keyed min-agg for the purchase threshold, a
    * co-partitioned join back, and both row_numbers ride ONE window
    * partitioning (same key, opposite orders) — a single user-keyed
    * shuffle end-to-end. Ties inside a microsecond break on event_id,
    * so the pick is total-ordered. */
  def userAttrib(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d).select(col("user_id"), col("event_id"),
      col("event_type"), col("us"))
    val p = e.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min("us").as("tp"))
    // event_type tiebreak (both engines): replayed events can tie on
    // (us, event_id) with DIFFERENT types, and row_number would hand
    // attribution credit to an engine-dependent type
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"), col("event_type"))
    val wd = Window.partitionBy(col("user_id"))
      .orderBy(col("us").desc, col("event_id").desc, col("event_type").desc)
    val pre = e.join(p, Seq("user_id")).filter(col("us") < col("tp"))
      .select(col("user_id"), col("event_type"),
        row_number().over(w).as("rf"), row_number().over(wd).as("rl"))
    val f = pre.filter(col("rf") === 1)
      .select(col("user_id"), col("event_type").as("first_touch"))
    val l = pre.filter(col("rl") === 1)
      .select(col("user_id"), col("event_type").as("last_touch"))
    f.join(l, Seq("user_id"))
      .groupBy("first_touch", "last_touch")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("first_touch", "last_touch", "n_users")
  }

  /** Event-type transition matrix (first-order Markov counts): adjacent
    * event pairs per user in (us, event_id, event_type) order, with the
    * transition probability in integer ppm (floor division — bit-exact
    * both engines; doubles never appear).
    *
    * Determinism: replayed events can duplicate (user_id, us, event_id)
    * with DIFFERENT event_type — then adjacent-pair formation under a
    * (us, event_id) order is engine-dependent and the pair counts
    * diverge. Adding event_type as the final tiebreak (in BOTH engines)
    * makes any remaining tie a group of identical-type rows, which is
    * provably interchangeable for pair counts: reordering equal-typed
    * neighbors produces the same (from, to) multiset.
    *
    * Scale: lead() rides one user-keyed window; the pair aggregation
    * output is bounded by |event_type|² = 25 rows, so the second
    * aggregation and the totals join are broadcast-trivial no matter
    * how many events flow in. */
  def eventTrans(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"), col("event_type"))
    val x = ev(s, d)
      .select(col("user_id"), col("event_type"), col("us"), col("event_id"))
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
    val tc = x.groupBy(col("event_type").as("from_type"),
        col("nxt").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = tc.groupBy("from_type").agg(sum("n").as("tot"))
    tc.join(broadcast(tot), Seq("from_type"))
      // decimal(38,0) ppm-widening: transition counts track total
      // event volume (~10^13 at 100 TB) where count*10^6 overflows int64
      .withColumn("ppm",
        expr("CAST(n AS DECIMAL(38,0)) * 1000000 DIV tot"))
      .select("from_type", "to_type", "n", "ppm")
      .orderBy("from_type", "to_type", "n", "ppm")
  }

  /** Microseconds per day — the bucket for [[activeIslands]] and
    * [[decayScore]]. */
  val DayUs = 86400L * 1000000L

  /** Gaps-and-islands: consecutive-active-day streaks per user via the
    * classic day − row_number() grouping trick; reports per user the
    * number of distinct streaks, the longest streak, and total active
    * days.
    *
    * Scale: the distinct collapses events to (user, day) — at most
    * users×days rows — and the window + both aggregations share the
    * user partitioning; pure integer epoch-day arithmetic. */
  def activeIslands(s: SparkSession, d: String): DataFrame = {
    val days = ev(s, d)
      .select(col("user_id"), expr(s"us DIV $DayUs").as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val isl = days.withColumn("grp", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
    isl.groupBy("user_id")
      .agg(count(lit(1)).as("n_islands"),
        max(col("len")).as("max_streak"),
        sum(col("len")).as("active_days"))
      .orderBy("user_id", "n_islands", "max_streak", "active_days")
  }

  /** Span clamp for [[gapFill]]: the per-user grid covers at most this
    * many days from the user's first active day. Bounds the grid at
    * users × [[GapFillMaxSpanDays]] rows regardless of how far apart a
    * user's first and last events sit (two years — generous next to the
    * corpus's actual spans, hard against a decades-wide outlier). */
  val GapFillMaxSpanDays = 730L

  /** Per-user daily activity grid with forward-fill (LOCF): one row per
    * (user, day) for every day in the user's [first, last] active span —
    * days with no events get `n_obs` 0, a `filled` flag, and `n_fill`
    * carried forward from the most recent observed day (the classic
    * time-series gap-fill a telemetry pipeline runs before any
    * day-over-day computation; without it, missing days silently read
    * as "no change" or break lag/lead arithmetic).
    *
    * All integer epoch-day arithmetic ([[DayUs]] discipline — no
    * date/timezone parity risk). Scale: the grid is users × span-days
    * rows, and the per-user span is clamped to [[GapFillMaxSpanDays]]
    * from the first active day (the clamp is mirrored verbatim in the
    * oracle) — a user whose history covers decades contributes a
    * bounded grid, and observed days past the clamp are simply outside
    * the grid (the grid-side left join drops them — and because that
    * loss is invisible in per-row values, every row carries a
    * `clamped` flag so a consumer can tell a complete history from a
    * truncated one from the output alone). The daily
    * aggregate, the span bounds, the grid join and the LOCF window all
    * share the user_id partitioning — one shuffle. */
  def gapFill(s: SparkSession, d: String): DataFrame = {
    val daily = ev(s, d)
      .groupBy(col("user_id"), expr(s"us DIV $DayUs").as("day"))
      .agg(count(lit(1)).as("n_obs"))
    val grid = daily.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      // clamp from d0 (not d1): the LOCF invariant "first grid day is
      // observed" must survive the clamp, and it is d0-anchored
      .select(col("user_id"), explode(sequence(col("d0"),
        least(col("d1"), col("d0") + lit(GapFillMaxSpanDays - 1L)))).as("day"),
        // truncation signal (visible in the OUTPUT, not only the
        // scaladoc): true on all of a user's rows iff observed activity
        // exists beyond the clamped grid, where the grid-side left join
        // drops it — so Σn_obs over a clamped user's rows is a floor,
        // not the event total
        (col("d1") > col("d0") + lit(GapFillMaxSpanDays - 1L)).as("clamped"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      // first grid day is always observed (span starts at min(day)), so
      // the LOCF carry is never null
      .withColumn("n_fill", last(col("n_obs"), ignoreNulls = true).over(w))
      .withColumn("filled", col("n_obs").isNull)
      .select(col("user_id"), col("day"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        col("n_fill"), col("filled"), col("clamped"))
      .orderBy("user_id", "day", "n_obs", "n_fill", "filled", "clamped")
  }

  /** Default journey cap for [[seqPattern]]: each user's journey is
    * built from at most this many of their earliest events. Bounds the
    * per-user row (collect_list array + journey string) by a constant
    * instead of that user's event count — a single bot user with 10M
    * events contributes a 256-char journey, not a 10MB one. The
    * rn-filter is mirrored verbatim in the oracle (same discipline as
    * [[SessionPathLen]]). */
  val SeqPatternMaxEvents = 256

  /** Event-sequence pattern matching (the batch MATCH_RECOGNIZE stand-
    * in): each user's events collapse — in (ts, event_id) order — to a
    * compact journey string of event-type initials, and regex predicates
    * over that string answer ordering questions a funnel count can't
    * ("a view EVENTUALLY followed by a purchase", "how many errors en
    * route"). The journey covers each user's first `maxEvents` events
    * (default [[SeqPatternMaxEvents]]; enforced by an rn-filter BEFORE
    * the collect, so the bound holds during aggregation, not after),
    * and `n_events` counts the capped set. Because a capped journey is
    * semantically different from a complete one (a late purchase no
    * longer flips `converted`, and `n_events` is the capped count),
    * every row carries a `capped` flag: the window scans to rn =
    * maxEvents+1 — one probe row past the cap, which keeps the
    * map-side WindowGroupLimit plan — and the probe row feeds ONLY the
    * flag, never the journey or the counts. collect_list is unordered
    * by contract — the deterministic order comes from array_sort over
    * (us, event_id, ch) structs, not from arrival.
    * Scale: one shuffle on user_id (the rn window and the groupBy share
    * the user_id hash partitioning); the regex runs per user row, not
    * per event; every per-user row is O(maxEvents). */
  def seqPattern(s: SparkSession, d: String): DataFrame =
    seqPattern(s, d, SeqPatternMaxEvents)

  /** [[seqPattern]] with an explicit journey cap (the declared query
    * uses the [[SeqPatternMaxEvents]] default). */
  def seqPattern(s: SparkSession, d: String, maxEvents: Int): DataFrame = {
    require(maxEvents > 0, s"maxEvents must be positive, got $maxEvents")
    // undated events are excluded (a journey position without a
    // timestamp is undefined, and array_sort's struct comparator is out
    // of reach of the registry's null-ordering rewrite); the remaining
    // sort-key fields are coalesced so tied rows compare identically in
    // both engines (Spark struct compare vs DuckDB ORDER BY)
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"), col("ch"))
    ev(s, d).filter(col("us").isNotNull)
      .select(col("user_id"), col("us"),
        coalesce(col("event_id"), lit(Long.MaxValue)).as("event_id"),
        coalesce(substring(col("event_type"), 1, 1), lit("")).as("ch"))
      .withColumn("rn", row_number().over(byUser))
      .filter(col("rn") <= maxEvents + 1)
      .select(col("user_id"), col("rn"),
        struct(col("us"), col("event_id"), col("ch")).as("e"))
      .groupBy("user_id")
      .agg(sum(when(col("rn") <= maxEvents, 1L).otherwise(0L))
          .as("n_events"),
        array_join(transform(array_sort(
          collect_list(when(col("rn") <= maxEvents, col("e")))),
          x => x.getField("ch")), "").as("journey"),
        (max(col("rn")) > maxEvents).as("capped"))
      .withColumn("converted", col("journey").rlike("v.*p"))
      .withColumn("n_err",
        (length(col("journey")) -
          length(regexp_replace(col("journey"), "e", ""))).cast(LongType))
      .select("user_id", "n_events", "journey", "converted", "n_err",
        "capped")
      .orderBy("user_id", "n_events", "journey", "converted", "n_err",
        "capped")
  }

  /** Daily-volume spike detector: for each event type, the day whose
    * count deviates most from that type's own daily mean, with the
    * deviation as a |z|-score in micro-units — the telemetry anomaly
    * screen that catches a logging regression or an ingest gap before
    * it poisons downstream counts. Variance from exact integer sums
    * (n·Σc² − (Σc)² — the zero check is exact, never a float ≈0; the
    * moments are decimal(38,0)-widened since c is a per-day EVENT
    * count and c² overflows int64 past ~3·10⁹/day (ANSI throws) — oracle mirrors with
    * HUGEINT);
    * z6 ≈ ⌊10⁶·|c−μ|/σ_sample⌋ is PURE INTEGER arithmetic: w6 =
    * ⌊⌊dd²·10⁶/varn⌋·(nd−1)/nd⌋ = ⌊z6²·10⁶⌋ (dd = c·nd − sc; the two
    * DIV quotients always fit int64 since z²_pop ≤ nd), then z6 =
    * exact-isqrt(w6·10⁶) via [[graft.engine.PortableMath]] — no output
    * rides an engine's int128→double cast (the boundary that made the
    * previous double-path z6 1-ulp-divergent past int64 moments).
    * Envelope: dd²·10⁶ within decimal(38,0) → |c·nd − sc| < 4·10¹⁵
    * (13× headroom over 3·10⁹/day × 10⁵ days), loud overflow beyond.
    * Degenerate series (one day, or constant volume) pin to 0.
    *
    * Scale: the day×type aggregate is calendar-bounded; the per-type
    * moment table is broadcast back onto it; the argmax is a
    * tiny-partition window rank. */
  def volumeSpike(s: SparkSession, d: String): DataFrame = {
    val daily = ev(s, d)
      .groupBy(col("event_type"), expr(s"us DIV $DayUs").as("day"))
      .agg(count(lit(1)).as("c"))
    // decimal(38,0) second moments: c is a per-day EVENT count — c²
    // overflows int64 past ~3·10⁹ events/day and Σc² long before a 100 TB
    // telemetry table stops growing; unwidened, the shipped ANSI
    // session would throw at the c*c product before any zero check. scc is internal only (never output);
    // the oracle mirrors with HUGEINT.
    val st = daily.groupBy("event_type")
      .agg(count(lit(1)).as("nd"), sum(col("c")).as("sc"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("scc"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("z6").desc, col("day"))
    daily.join(broadcast(st), Seq("event_type"))
      .withColumn("dd", expr("CAST(c AS DECIMAL(38,0)) * nd - sc"))
      .withColumn("varn",
        expr("nd * scc - CAST(sc AS DECIMAL(38,0)) * sc"))
      // w6 = ⌊z6²·10⁶⌋ (≤ nd·10⁶, int64-safe); the ×10⁶ re-widen makes
      // the exact isqrt land on micro-z6
      .withColumn("w6", expr(
        "CASE WHEN nd < 2 OR varn = 0 THEN 0 ELSE " +
          "(((dd * dd * 1000000) DIV varn) * (nd - 1)) DIV nd END"))
      .withColumn("t6", expr("CAST(w6 AS DECIMAL(38,0)) * 1000000"))
      .withColumn("r0",
        expr(PortableMath.isqrtEstimate("t6", "DECIMAL(38,0)")))
      .withColumn("z6",
        expr(s"CAST(${PortableMath.isqrtAdjust("r0", "t6")} AS BIGINT)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("day").as("spike_day"),
        col("c").as("c_spike"), col("z6"))
      .orderBy("event_type", "spike_day", "c_spike", "z6")
  }

  /** Time-to-convert latency histogram: per user, the gap between the
    * FIRST view and the first purchase AT OR AFTER it, bucketed by
    * hour — the funnel-latency distribution a growth team reads next
    * to [[eventsFunnel]]'s stage counts (how long conversion takes,
    * not just whether it happens). Users who never view, or never
    * purchase after viewing, simply don't contribute a row.
    *
    * Scale: two user-keyed aggregations (first-view min, then
    * first-qualifying-purchase min) sharing the user_id partitioning,
    * then a bucket-keyed count with map-side partials — output is
    * bounded by the calendar span in hours. All integer microsecond
    * arithmetic. */
  def ttcHist(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
    val firstView = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("us")).as("t_view"))
    val firstBuy = e.filter(col("event_type") === "purchase")
      .join(firstView, Seq("user_id"))
      .filter(col("us") >= col("t_view"))
      .groupBy(col("user_id"), col("t_view"))
      .agg(min(col("us")).as("t_buy"))
    firstBuy
      .withColumn("gap_h", expr(s"(t_buy - t_view) DIV ${3600L * 1000000L}"))
      .groupBy("gap_h")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("gap_h", "n_users")
  }

  /** Conversion bar for [[abTest]]: a user "converts" with at least
    * this many purchase events (≈ the corpus's above-average buyer —
    * "ever purchased" saturates at 100% on this data and degenerates
    * the z). */
  val AbConvMin = 15L

  /** Two-proportion A/B read-out: users split into variants by
    * `user_id % 2` (the deterministic hash-split discipline), conversion
    * = "≥ [[AbConvMin]] purchases", and the one-row report carries both
    * rates (exact ppm integer quotients) and the pooled two-proportion
    * z-statistic (micro-units). The z arithmetic runs in double FROM
    * EXACT INTEGER inputs with one fixed expression shape mirrored
    * verbatim by the oracle — the [[graft.engine.TextOps.ksDrift]]
    * discipline; an all-or-none conversion split (pooled variance 0,
    * z undefined) is pinned to 0 by an identical guard in both engines.
    * Scale: one user-keyed aggregation (map-side partial sum), then a
    * 2-row → 1-row fold; nothing else moves. */
  def abTest(s: SparkSession, d: String): DataFrame = {
    val per = ev(s, d).groupBy(col("user_id"))
      .agg(when(sum(when(col("event_type") === "purchase", 1L)
        .otherwise(0L)) >= AbConvMin, 1L).otherwise(0L).as("conv"))
      .withColumn("variant", pmod(col("user_id"), lit(2L)))
    // GLOBAL aggregate, not groupBy(lit(1)): grouping by a literal over
    // an EMPTY input yields zero groups (no row), while the oracle's
    // no-GROUP-BY aggregate always yields one — the sf0 fuzz class
    // caught the divergence. A global agg returns one row on any input.
    per
      .agg(
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("variant") === 0, col("conv")).otherwise(0L)).as("c0"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("variant") === 1, col("conv")).otherwise(0L)).as("c1"))
      // empty-variant guards (a one-user corpus puts everyone in one
      // arm): rate 0 and z 0 rather than a division error, identically
      // in both engines
      // decimal(38,0) ppm-widening (repo invariant, SCALE.md r8)
      .withColumn("p0_ppm", expr(
        "CASE WHEN n0 = 0 THEN 0 ELSE CAST(c0 AS DECIMAL(38,0)) * 1000000 DIV n0 END"))
      .withColumn("p1_ppm", expr(
        "CASE WHEN n1 = 0 THEN 0 ELSE CAST(c1 AS DECIMAL(38,0)) * 1000000 DIV n1 END"))
      // identical associativity in the oracle: pooled p, then
      // (p1-p0)/sqrt(p(1-p)(1/n0+1/n1)), floored to micro-units;
      // degenerate all-or-none conversion → 0 (variance undefined)
      .withColumn("z6", expr(
        "CASE WHEN n0 = 0 OR n1 = 0 OR c0 + c1 = 0 " +
          "OR c0 + c1 = n0 + n1 THEN 0 ELSE " +
          "CAST(floor(((CAST(c1 AS DOUBLE)/n1 - CAST(c0 AS DOUBLE)/n0) / " +
          "sqrt(((CAST(c0+c1 AS DOUBLE)/(n0+n1)) * " +
          "(1.0 - CAST(c0+c1 AS DOUBLE)/(n0+n1))) * " +
          "(1.0/n0 + 1.0/n1))) * 1000000.0) AS BIGINT) END"))
      .select("n0", "c0", "n1", "c1", "p0_ppm", "p1_ppm", "z6")
      .orderBy("n0", "c0", "n1", "c1", "p0_ppm", "p1_ppm", "z6")
  }

  /** Day-grain rolling activity: daily event and value totals with a
    * 7-day trailing sum and a running cumulative — the
    * daily-active-with-rolling-window dashboard staple. The window runs
    * over the DAY-GRAIN aggregate (rows bounded by the calendar span,
    * not the event count), so the unpartitioned ORDER BY day window is
    * safe at any corpus size: the shuffle-heavy work is the day-keyed
    * aggregation with map-side partials; the windowed pass sees one row
    * per day. All-integer arithmetic. */
  def rolling7d(s: SparkSession, d: String): DataFrame = {
    val daily = ev(s, d)
      .groupBy(expr(s"us DIV $DayUs").as("day"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
    val w7 = Window.orderBy(col("day")).rowsBetween(-6, 0)
    val wc = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("ev_7d", sum(col("n_events")).over(w7))
      .withColumn("ev_cum", sum(col("n_events")).over(wc))
      .select("day", "n_events", "n_users", "ev_7d", "ev_cum")
      .orderBy("day", "n_events", "n_users", "ev_7d", "ev_cum")
  }

  /** Freshness-weighted engagement score: each event contributes
    * 1e6 / 2^age_days ppm (age capped at 20 so the weight underflows to
    * exactly 0, not a subnormal double — the whole computation stays in
    * long arithmetic and is bit-exact cross-engine, unlike a float
    * exp(−λ·age) would be). The half-life dial is the shift base.
    *
    * Scale: the reference day is a 1-row broadcast; scoring is a single
    * map-side-weighted user-keyed aggregation — one shuffle. */
  def decayScore(s: SparkSession, d: String): DataFrame = {
    val days = ev(s, d)
      .select(col("user_id"), expr(s"us DIV $DayUs").as("day"))
    val ref = days.agg(max("day").as("ref_day"))
    days.crossJoin(broadcast(ref))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(expr("1000000 DIV shiftleft(CAST(1 AS BIGINT), " +
          "CAST(least(ref_day - day, 20) AS INT))")).as("score"))
      .orderBy("user_id", "n_events", "score")
  }

  /** Path prefix length for [[sessionPaths]]. */
  val SessionPathLen = 3

  /** Session journey paths: the first [[SessionPathLen]] event types of
    * each 30-minute-gap session joined into a '>' path, counted across
    * all sessions — the "how do users start a session" rollup.
    *
    * Determinism: the projection keeps ONLY (user_id, event_id, us,
    * etype) before any window, so replayed events that tie on the full
    * window order (us, event_id, etype) are fully identical rows —
    * interchangeable under both the session flag and the row_number
    * prefix cut (same etype multiset → same path). Null event types are
    * pinned to the \u0002 sentinel (chr(2) oracle-side) in both engines, and the path is
    * assembled from an rn-sorted array, never collection order.
    *
    * Scale: two passes over one user-keyed sorted partition (lag +
    * running sum, then row_number), a (user, sid)-keyed prefix rollup,
    * and a path-keyed count whose key space is |event_type|^len — the
    * final aggregate is broadcast-sized no matter the event volume. */
  /** Shared session-id frame for the journey queries: events projected
    * to exactly (user_id, event_id, us, etype) — null types pinned to
    * the \u0002 sentinel (chr(2) oracle-side) — with a 30-minute-gap
    * session id. The projection-before-window rule (see
    * [[sessionizeUs]]) makes any window-order tie a fully identical
    * row, hence interchangeable downstream. */
  private def typedSessions(s: SparkSession, d: String): DataFrame = {
    val gapUs = 30L * 60 * 1000 * 1000
    val base = ev(s, d).select(col("user_id"), col("event_id"), col("us"),
      coalesce(col("event_type"), lit("\u0002")).as("etype"))
    val byU = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"), col("etype"))
    base
      .withColumn("prev_us", lag(col("us"), 1).over(byU))
      .withColumn("flag", when(col("prev_us").isNull, 1)
        .when(col("us") - col("prev_us") > gapUs, 1).otherwise(0))
      // RANGE over us alone, not ROWS over byU: see [[sessionizeUs]] —
      // a boundary-straddling identical twin must not inherit the
      // previous session when a second window pass re-orders the tie
      // (the fuzz seed-78 class)
      .withColumn("sid", sum(col("flag")).over(
        Window.partitionBy(col("user_id")).orderBy(col("us"))
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  def sessionPaths(s: SparkSession, d: String): DataFrame = {
    val sess = typedSessions(s, d)
    val bySess = Window.partitionBy(col("user_id"), col("sid"))
      .orderBy(col("us"), col("event_id"), col("etype"))
    sess.withColumn("rn", row_number().over(bySess))
      .filter(col("rn") <= SessionPathLen)
      .groupBy(col("user_id"), col("sid"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("rn"), col("etype")))),
        x => x.getField("etype")), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy("path")
  }

  /** Session abandonment per user: of the user's 30-minute-gap sessions,
    * how many contained a 'view' and how many of those converted to a
    * 'purchase' in the SAME session — abandon rate in integer ppm (null
    * when the user has no view sessions, never a divide-by-zero).
    *
    * All arithmetic is integer; the session frame is [[typedSessions]]
    * (full-identity window ties). Scale: two keyed aggregates over the
    * session frame — (user, sid) flag rollup then the per-user count —
    * both map-side-combinable, output bounded by the user count. */
  def sessionAbandon(s: SparkSession, d: String): DataFrame =
    typedSessions(s, d)
      .groupBy(col("user_id"), col("sid"))
      .agg(max(when(col("etype") === "view", 1).otherwise(0)).as("has_view"),
        max(when(col("etype") === "purchase", 1).otherwise(0)).as("has_buy"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("has_view")).as("n_view"),
        sum(when(col("has_view") === 1 && col("has_buy") === 0, 1)
          .otherwise(0)).as("n_abandoned"))
      // decimal(38,0) ppm-widening (repo invariant, SCALE.md r8)
      .withColumn("abandon_ppm",
        expr("CASE WHEN n_view > 0 THEN CAST(n_abandoned AS DECIMAL(38,0))" +
          " * 1000000 DIV n_view ELSE NULL END"))
      .orderBy("user_id")

  /** DAU/WAU stickiness per day: daily actives, trailing-7-day actives,
    * and their ratio in integer ppm. Distinct-users-over-a-sliding-
    * window cannot ride a window frame (COUNT(DISTINCT) OVER is
    * unsupported in both engines), so each user-day fans out to the ≤ 7
    * future days it keeps the user "weekly active" for — a constant-7
    * expansion of the DISTINCT (user, day) table, dedup'd, then two
    * plain day-keyed distinct aggregates. Days are epoch-day integers;
    * the ratio is floor ppm; undated/anonymous events are excluded
    * explicitly in both engines.
    *
    * Scale: the expansion multiplies the user-day table (already ≪
    * event volume) by 7 — the two countDistinct aggs are day-keyed
    * shuffles of (user, day) pairs, and the dau⋈wau join is day-keyed
    * on a days-sized frame. */
  def dauStickiness(s: SparkSession, d: String): DataFrame = {
    val ud = ev(s, d)
      .filter(col("us").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), expr(s"us DIV $DayUs").as("day"))
      .distinct()
    val dau = ud.groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("dau"))
    val wau = ud
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + 6)).as("day2"))
      .distinct()
      .groupBy(col("day2").as("day"))
      .agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, Seq("day"))
      // decimal(38,0) ppm-widening (repo invariant, SCALE.md r8)
      .withColumn("stickiness_ppm",
        expr("CAST(dau AS DECIMAL(38,0)) * 1000000 DIV wau"))
      .orderBy("day")
  }

  /** Burst window for [[errorBurst]] (6 h — sized so the sf0.01 events
    * table, ~13 errors/user over a month, still surfaces real
    * clusters; a second-scale window on production traffic is the same
    * query with a smaller constant). */
  val BurstWindowUs: Long = 6L * 3600 * 1000000

  /** Error-burst detection: error events that start a burst — ≥ 3
    * errors by the same user within the following [[BurstWindowUs]] —
    * rolled up per user. The trailing count rides a value-RANGE window frame on
    * the microsecond axis, so membership depends only on timestamp
    * VALUES (replayed identical rows count in both engines alike) and
    * no tie order can matter. All integer.
    *
    * Scale: one user-keyed sorted window over the error slice (the
    * event_type filter pushes to the scan), then a user-keyed rollup of
    * burst starts — output bounded by users with ≥ 3 clustered errors. */
  def errorBurst(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
      .filter(col("event_type") === "error" &&
        col("us").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), col("us"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(Window.currentRow, BurstWindowUs)
    e.withColumn("n5", count(lit(1)).over(w))
      .filter(col("n5") >= 3)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_burst_starts"),
        min(col("us")).as("first_burst_us"),
        max(col("n5")).as("max_burst"))
      .orderBy("user_id")
  }

  /** Diurnal load profile: events per (type, UTC hour-of-day) with each
    * type's share in integer ppm — the capacity-planning heatmap. Hour
    * extraction is integer arithmetic on the microsecond epoch; the
    * per-type total joins back as a broadcast |event_type|-row frame.
    * One (type, hour)-keyed aggregate, output ≤ 24·|event_type|. */
  def peakHours(s: SparkSession, d: String): DataFrame = {
    val c = ev(s, d)
      .filter(col("us").isNotNull && col("event_type").isNotNull)
      .withColumn("hod", expr(s"(us % $DayUs) DIV 3600000000"))
      .groupBy(col("event_type"), col("hod"))
      .agg(count(lit(1)).as("n"))
    val tot = c.groupBy(col("event_type")).agg(sum(col("n")).as("tot"))
    c.join(broadcast(tot), Seq("event_type"))
      // decimal(38,0) ppm-widening: per-type event counts reach the
      // int64 product envelope at 100 TB event volume
      .withColumn("share_ppm",
        expr("CAST(n AS DECIMAL(38,0)) * 1000000 DIV tot"))
      .select(col("event_type"), col("hod"), col("n"), col("share_ppm"))
      .orderBy("event_type", "hod")
  }
}

object EventsRegistry {
  import Registry0.{Entry, e}

  val entries: Seq[(String, Entry)] = Seq(
    "q_events_window" -> e(Events.eventsWindow,
      """SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hour_start_us,
        | event_type, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total
        |FROM events WHERE ts IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    "q_events_sliding" -> e(Events.eventsSliding,
      """WITH e AS (SELECT event_type, value,
        |   epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
        |  WHERE ts IS NOT NULL),
        |-- FLOORED window start (us minus the nonnegative remainder),
        |-- not (us // m) * m: DuckDB's // truncates toward zero, which
        |-- for a pre-epoch event would emit a window that does not
        |-- contain it — Spark's window() floors (r6 fuzz `evns` class)
        | w AS (SELECT event_type, value,
        |   unnest([us - ((us % 1800000000) + 1800000000) % 1800000000,
        |           us - ((us % 1800000000) + 1800000000) % 1800000000
        |             - 1800000000]) AS ws
        |  FROM e)
        |SELECT ws AS win_start_us, event_type, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    "q_events_session" -> e(Events.eventsSession,
      """WITH e AS (SELECT user_id, event_id,
        |   epoch_us(CAST(ts AS TIMESTAMP)) AS us, value FROM events),
        | x AS (SELECT user_id, event_id, us, value,
        |   CASE WHEN lag(us) OVER w IS NULL THEN 1
        |        WHEN us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS flag
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        | s AS (SELECT user_id, us, value,
        |   CAST(sum(flag) OVER (PARTITION BY user_id ORDER BY us
        |     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        |  FROM x)
        |SELECT user_id, sid, count(*) AS n_events,
        | min(us) AS start_us, max(us) AS end_us,
        | CAST(sum(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    "q_events_funnel" -> e(Events.eventsFunnel,
      """WITH e AS (SELECT user_id, event_type,
        |   epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
        |  WHERE user_id IS NOT NULL),
        | v AS (SELECT user_id, min(us) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        | c AS (SELECT e.user_id, min(us) AS t2 FROM e JOIN v USING (user_id)
        |  WHERE event_type = 'click' AND us > t1 GROUP BY 1),
        | p AS (SELECT e.user_id, min(us) AS t3 FROM e JOIN c USING (user_id)
        |  WHERE event_type = 'purchase' AND us > t2 GROUP BY 1),
        | st AS (
        |  SELECT '0_users' AS stage, count(DISTINCT user_id) AS n_users FROM e
        |  UNION ALL SELECT '1_view', count(*) FROM v
        |  UNION ALL SELECT '2_click_after_view', count(*) FROM c
        |  UNION ALL SELECT '3_purchase_after_click', count(*) FROM p),
        | base AS (SELECT n_users AS n0 FROM st WHERE stage = '0_users')
        |SELECT stage, CAST(n_users AS BIGINT) AS n_users,
        | CAST(n_users AS DOUBLE)/n0 AS conv
        |FROM st CROSS JOIN base ORDER BY stage""".stripMargin),

    "q_convert_window" -> e(Events.convertWindow,
      """WITH e AS (SELECT user_id, event_type,
        |   epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
        |  WHERE user_id IS NOT NULL),
        | v AS (SELECT user_id, min(us) AS tv FROM e
        |  WHERE event_type = 'view' GROUP BY 1
        |  HAVING min(us) IS NOT NULL),
        | p AS (SELECT e.user_id, min(us) AS tp FROM e JOIN v USING (user_id)
        |  WHERE event_type = 'purchase' AND us > tv GROUP BY 1),
        | u AS (SELECT v.user_id, tv, tp
        |  FROM v LEFT JOIN p ON v.user_id = p.user_id),
        | x AS (SELECT window_h, count(*) AS n_viewers,
        |   CAST(sum(CASE WHEN tp IS NOT NULL
        |     AND tp - tv <= window_h * 3600000000 THEN 1 ELSE 0 END)
        |     AS BIGINT) AS n_converted
        |  FROM u CROSS JOIN (SELECT CAST(unnest([1, 6, 24]) AS BIGINT)
        |    AS window_h) ws
        |  GROUP BY 1)
        |SELECT window_h, n_viewers, n_converted,
        |-- HUGEINT widening mirrors the Spark decimal(38,0) product
        | CAST(CAST(n_converted AS HUGEINT) * 1000000 // n_viewers
        |   AS BIGINT) AS conv_ppm
        |FROM x ORDER BY window_h""".stripMargin),

    "q_retention" -> e(Events.retention,
      s"""WITH e AS (SELECT user_id, event_type,
         |   epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
         | c AS (SELECT user_id, min(us) // ${Events.WeekUs} AS cohort_wk
         |  FROM e WHERE event_type = 'signup' GROUP BY 1),
         | a AS (SELECT e.user_id, c.cohort_wk,
         |   us // ${Events.WeekUs} - c.cohort_wk AS wk_offset
         |  FROM e JOIN c USING (user_id))
         |SELECT cohort_wk, wk_offset, count(DISTINCT user_id) AS n_active
         |FROM a WHERE wk_offset >= 0
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    "q_json_extract" -> e(Events.jsonExtract,
      """SELECT event_type, count(*) AS n,
        | CAST(sum(try_cast(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | min(try_cast(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        | max(try_cast(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),

    "q_asof_join" -> e(Events.asofJoin,
      """SELECT event_id, user_id, o_orderkey, o_totalprice FROM (
        | SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
        |  row_number() OVER (PARTITION BY e.event_id, e.user_id, e.eday
        |    ORDER BY o.o_orderdate DESC NULLS LAST,
        |             o.o_orderkey DESC NULLS LAST) AS rn
        | FROM (SELECT DISTINCT event_id, user_id,
        |         CAST(CAST(ts AS TIMESTAMP) AS DATE) AS eday
        |       FROM events WHERE event_id % 37 = 0) e
        | LEFT JOIN orders o
        |   ON o.o_custkey = e.user_id AND CAST(o.o_orderdate AS DATE) <= e.eday
        |) x WHERE rn = 1
        |ORDER BY event_id, user_id, o_orderkey, o_totalprice""".stripMargin),

    "q_range_join" -> e(Events.rangeJoin,
      """WITH e AS (SELECT DISTINCT event_id, user_id,
        |   epoch_us(CAST(ts AS TIMESTAMP)) AS eus
        |  FROM events WHERE event_type = 'error'),
        | c AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS cus
        |  FROM events WHERE event_type = 'click')
        |SELECT e.event_id, e.user_id, count(c.cus) AS n_clicks
        |FROM e LEFT JOIN c ON c.user_id = e.user_id
        |  AND c.cus > e.eus AND c.cus <= e.eus + 600000000
        |GROUP BY e.event_id, e.user_id, e.eus
        |ORDER BY event_id, e.user_id, n_clicks""".stripMargin),

    "q_dedup_keyed" -> e(Events.dedupKeyed,
      """SELECT user_id, event_type, event_id, us FROM (
        | SELECT user_id, event_type, event_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |  row_number() OVER (PARTITION BY user_id, event_type
        |    ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) DESC, event_id DESC) AS rn
        | FROM events) x
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin),

    "q_user_attrib" -> e(Events.userAttrib,
      """WITH e AS (SELECT user_id, event_id, event_type,
        |   epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        | p AS (SELECT user_id, min(us) AS tp FROM e
        |  WHERE event_type = 'purchase' GROUP BY 1),
        | pre AS (SELECT e.user_id, event_id, event_type, us
        |  FROM e JOIN p USING (user_id) WHERE us < tp),
        | r AS (SELECT user_id, event_type,
        |   row_number() OVER (PARTITION BY user_id
        |     ORDER BY us, event_id, event_type) AS rf,
        |   row_number() OVER (PARTITION BY user_id
        |     ORDER BY us DESC, event_id DESC, event_type DESC) AS rl
        |  FROM pre),
        | f AS (SELECT user_id, event_type AS first_touch FROM r WHERE rf = 1),
        | l AS (SELECT user_id, event_type AS last_touch FROM r WHERE rl = 1)
        |SELECT first_touch, last_touch, count(*) AS n_users
        |FROM f JOIN l USING (user_id)
        |GROUP BY 1, 2 ORDER BY first_touch, last_touch, n_users""".stripMargin),

    "q_event_trans" -> e(Events.eventTrans,
      """WITH e AS (SELECT user_id, event_id, event_type,
        |   epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        | x AS (SELECT event_type, lead(event_type) OVER (
        |    PARTITION BY user_id ORDER BY us, event_id, event_type) AS nxt
        |   FROM e),
        | tc AS (SELECT event_type AS from_type, nxt AS to_type,
        |   count(*) AS n FROM x WHERE nxt IS NOT NULL GROUP BY 1, 2),
        | ft AS (SELECT from_type, sum(n) AS tot FROM tc GROUP BY 1)
        |-- CAST AS BIGINT is load-bearing: sum(n) is HUGEINT, HUGEINT //
        |-- stays HUGEINT, and an int128 output column round-trips through
        |-- the driver comparator as float64 ("3.0" != "3" — hash-red with
        |-- rows/schema green). Root cause of the r4-r5 q_event_trans reds.
        |SELECT from_type, to_type, n,
        | CAST(CAST(n AS HUGEINT) * 1000000 // tot AS BIGINT) AS ppm
        |FROM tc JOIN ft USING (from_type)
        |ORDER BY from_type, to_type, n, ppm""".stripMargin),

    "q_islands" -> e(Events.activeIslands,
      s"""WITH e AS (SELECT DISTINCT user_id,
         |   epoch_us(CAST(ts AS TIMESTAMP)) // ${Events.DayUs} AS day
         |  FROM events),
         | r AS (SELECT user_id, day, day - row_number() OVER (
         |    PARTITION BY user_id ORDER BY day) AS grp FROM e),
         | isl AS (SELECT user_id, grp, count(*) AS len FROM r GROUP BY 1, 2)
         |SELECT user_id, count(*) AS n_islands, max(len) AS max_streak,
         | CAST(sum(len) AS BIGINT) AS active_days
         |FROM isl GROUP BY 1
         |ORDER BY user_id, n_islands, max_streak, active_days""".stripMargin),

    "q_decay_score" -> e(Events.decayScore,
      s"""WITH e AS (SELECT user_id,
         |   epoch_us(CAST(ts AS TIMESTAMP)) // ${Events.DayUs} AS day
         |  FROM events),
         | m AS (SELECT max(day) AS ref_day FROM e)
         |SELECT user_id, count(*) AS n_events,
         | CAST(sum(1000000 // (CAST(1 AS BIGINT)
         |   << least(ref_day - day, 20))) AS BIGINT) AS score
         |FROM e CROSS JOIN m GROUP BY user_id
         |ORDER BY user_id, n_events, score""".stripMargin),

    "q_gap_fill" -> e(Events.gapFill,
      s"""WITH dly AS (SELECT user_id,
         |   epoch_us(CAST(ts AS TIMESTAMP)) // ${Events.DayUs} AS day,
         |   CAST(count(*) AS BIGINT) AS n_obs
         |  FROM events GROUP BY 1, 2),
         | sp AS (SELECT user_id, min(day) AS d0, max(day) AS d1
         |  FROM dly GROUP BY 1),
         | grid AS (SELECT user_id, unnest(generate_series(d0,
         |   least(d1, d0 + ${Events.GapFillMaxSpanDays - 1L}))) AS day,
         |   d1 > d0 + ${Events.GapFillMaxSpanDays - 1L} AS clamped
         |  FROM sp),
         | j AS (SELECT g.user_id, g.day, g.clamped, dly.n_obs FROM grid g
         |  LEFT JOIN dly ON g.user_id = dly.user_id AND g.day = dly.day)
         |SELECT user_id, day, COALESCE(n_obs, 0) AS n_obs,
         | last_value(n_obs IGNORE NULLS) OVER (PARTITION BY user_id
         |   ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |   AS n_fill,
         | (n_obs IS NULL) AS filled, clamped
         |FROM j
         |ORDER BY user_id, day, n_obs, n_fill, filled, clamped""".stripMargin),

    "q_seq_pattern" -> e(Events.seqPattern,
      s"""WITH e AS (SELECT user_id,
        |   coalesce(event_id, 9223372036854775807) AS event_id,
        |   epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |   coalesce(left(event_type, 1), '') AS ch FROM events
        |  WHERE ts IS NOT NULL),
        | r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY us, event_id, ch) AS rn FROM e),
        |-- scan one probe row past the cap: it feeds ONLY the capped
        |-- flag (aggregate filters skip it for the journey and counts)
        | j AS (SELECT user_id,
        |   CAST(sum(CASE WHEN rn <= ${Events.SeqPatternMaxEvents}
        |     THEN 1 ELSE 0 END) AS BIGINT) AS n_events,
        |   string_agg(CASE WHEN rn <= ${Events.SeqPatternMaxEvents}
        |     THEN ch END, '' ORDER BY us, event_id, ch) AS journey,
        |   max(rn) > ${Events.SeqPatternMaxEvents} AS capped
        |  FROM r WHERE rn <= ${Events.SeqPatternMaxEvents + 1} GROUP BY 1)
        |SELECT user_id, n_events, journey,
        | regexp_matches(journey, 'v.*p') AS converted,
        | CAST(len(journey) - len(replace(journey, 'e', '')) AS BIGINT)
        |   AS n_err, capped
        |FROM j
        |ORDER BY user_id, n_events, journey, converted, n_err,
        | capped""".stripMargin),

    "q_ab_test" -> e(Events.abTest,
      s"""WITH per AS (SELECT user_id,
        |   CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |     >= ${Events.AbConvMin} THEN 1 ELSE 0 END AS conv,
        |   user_id % 2 AS variant
        |  FROM events GROUP BY user_id),
        | g AS (SELECT
        |   CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |   CAST(sum(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT) AS c0,
        |   CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |   CAST(sum(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT) AS c1
        |  FROM per)
        |SELECT n0, c0, n1, c1,
        |-- HUGEINT widening mirrors the Spark decimal(38,0) products
        | CASE WHEN n0 = 0 THEN 0 ELSE CAST(CAST(c0 AS HUGEINT) * 1000000
        |   // n0 AS BIGINT) END AS p0_ppm,
        | CASE WHEN n1 = 0 THEN 0 ELSE CAST(CAST(c1 AS HUGEINT) * 1000000
        |   // n1 AS BIGINT) END AS p1_ppm,
        | CASE WHEN n0 = 0 OR n1 = 0 OR c0 + c1 = 0
        |   OR c0 + c1 = n0 + n1 THEN 0 ELSE
        |  CAST(floor(((CAST(c1 AS DOUBLE)/n1 - CAST(c0 AS DOUBLE)/n0) /
        |   sqrt(((CAST(c0+c1 AS DOUBLE)/(n0+n1)) *
        |   (1.0 - CAST(c0+c1 AS DOUBLE)/(n0+n1))) *
        |   (1.0/n0 + 1.0/n1))) * 1000000.0) AS BIGINT) END AS z6
        |FROM g ORDER BY n0, c0, n1, c1, p0_ppm, p1_ppm, z6""".stripMargin),

    "q_volume_spike" -> e(Events.volumeSpike,
      s"""WITH daily AS (SELECT event_type,
         |   epoch_us(CAST(ts AS TIMESTAMP)) // ${Events.DayUs} AS day,
         |   CAST(count(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1, 2),
         |-- HUGEINT second moments mirror the Spark decimal(38,0) scc:
         |-- c² overflows int64 past ~3·10⁹ events/day (scc is internal,
         |-- never an output column, so int128 is safe here)
         | st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nd,
         |   CAST(sum(c) AS BIGINT) AS sc,
         |   sum(CAST(c AS HUGEINT) * c) AS scc
         |  FROM daily GROUP BY 1),
         | dv AS (SELECT d.event_type, d.day, d.c, st.nd,
         |   CAST(d.c AS HUGEINT) * st.nd - st.sc AS dd,
         |   st.nd * st.scc - CAST(st.sc AS HUGEINT) * st.sc AS varn
         |  FROM daily d JOIN st USING (event_type)),
         |-- w6 = ⌊z6²·10⁶⌋ then exact isqrt (PortableMath mirror): the
         |-- declared z6 never rides the HUGEINT→DOUBLE cast
         | w AS (SELECT event_type, day, c,
         |   CASE WHEN nd < 2 OR varn = 0 THEN 0 ELSE
         |    CAST((CAST((dd * dd * 1000000) // varn AS BIGINT)
         |      * (nd - 1)) // nd AS BIGINT) END AS w6 FROM dv),
         | q AS (SELECT *, CAST(w6 AS HUGEINT) * 1000000 AS t6 FROM w),
         | es AS (SELECT *,
         |   ${PortableMath.isqrtEstimate("t6", "HUGEINT")} AS r0 FROM q),
         | z AS (SELECT event_type, day, c,
         |   CAST(${PortableMath.isqrtAdjust("r0", "t6")} AS BIGINT)
         |     AS z6 FROM es),
         | r AS (SELECT event_type, day, c, z6, row_number() OVER (
         |    PARTITION BY event_type ORDER BY z6 DESC, day) AS rn FROM z)
         |SELECT event_type, day AS spike_day, c AS c_spike, z6
         |FROM r WHERE rn = 1
         |ORDER BY event_type, spike_day, c_spike, z6""".stripMargin),

    "q_ttc_hist" -> e(Events.ttcHist,
      s"""WITH e AS (SELECT user_id, event_type,
         |   epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
         | fv AS (SELECT user_id, min(us) AS t_view FROM e
         |  WHERE event_type = 'view' GROUP BY 1),
         | fb AS (SELECT e.user_id, fv.t_view, min(e.us) AS t_buy
         |  FROM e JOIN fv ON e.user_id = fv.user_id
         |  WHERE e.event_type = 'purchase' AND e.us >= fv.t_view
         |  GROUP BY 1, 2)
         |SELECT (t_buy - t_view) // ${3600L * 1000000L} AS gap_h,
         | count(*) AS n_users
         |FROM fb GROUP BY 1 ORDER BY gap_h, n_users""".stripMargin),

    "q_rolling_7d" -> e(Events.rolling7d,
      s"""WITH daily AS (SELECT
         |   epoch_us(CAST(ts AS TIMESTAMP)) // ${Events.DayUs} AS day,
         |   CAST(count(*) AS BIGINT) AS n_events,
         |   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         |  FROM events GROUP BY 1)
         |SELECT day, n_events, n_users,
         | CAST(sum(n_events) OVER (ORDER BY day
         |   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS ev_7d,
         | CAST(sum(n_events) OVER (ORDER BY day
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |   AS ev_cum
         |FROM daily
         |ORDER BY day, n_events, n_users, ev_7d, ev_cum""".stripMargin),

    "q_session_paths" -> e(Events.sessionPaths,
      s"""WITH e AS (SELECT user_id, event_id,
         |   epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         |   coalesce(event_type, chr(2)) AS etype FROM events),
         | x AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL THEN 1
         |      WHEN us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END
         |      AS flag
         |  FROM e WINDOW w AS (PARTITION BY user_id
         |    ORDER BY us, event_id, etype)),
         | s AS (SELECT *, sum(flag) OVER (PARTITION BY user_id
         |    ORDER BY us
         |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM x),
         | r AS (SELECT *, row_number() OVER (PARTITION BY user_id, sid
         |    ORDER BY us, event_id, etype) AS rn FROM s),
         | p AS (SELECT user_id, sid,
         |   string_agg(etype, '>' ORDER BY rn) AS path
         |  FROM r WHERE rn <= ${Events.SessionPathLen} GROUP BY 1, 2)
         |SELECT path, count(*) AS n_sessions
         |FROM p GROUP BY 1 ORDER BY 1""".stripMargin),

    "q_session_abandon" -> e(Events.sessionAbandon,
      s"""WITH e AS (SELECT user_id, event_id,
         |   epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         |   coalesce(event_type, chr(2)) AS etype FROM events),
         | x AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL THEN 1
         |      WHEN us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END
         |      AS flag
         |  FROM e WINDOW w AS (PARTITION BY user_id
         |    ORDER BY us, event_id, etype)),
         | s AS (SELECT *, sum(flag) OVER (PARTITION BY user_id
         |    ORDER BY us
         |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM x),
         | p AS (SELECT user_id, sid,
         |   max(CASE WHEN etype = 'view' THEN 1 ELSE 0 END) AS has_view,
         |   max(CASE WHEN etype = 'purchase' THEN 1 ELSE 0 END) AS has_buy
         |  FROM s GROUP BY 1, 2),
         | u AS (SELECT user_id, count(*) AS n_sessions,
         |   CAST(sum(has_view) AS BIGINT) AS n_view,
         |   CAST(sum(CASE WHEN has_view = 1 AND has_buy = 0
         |     THEN 1 ELSE 0 END) AS BIGINT) AS n_abandoned
         |  FROM p GROUP BY 1)
         |SELECT user_id, n_sessions, n_view, n_abandoned,
         |-- HUGEINT widening mirrors the Spark decimal(38,0) product
         | CASE WHEN n_view > 0 THEN CAST(CAST(n_abandoned AS HUGEINT)
         |   * 1000000 // n_view AS BIGINT) ELSE NULL END AS abandon_ppm
         |FROM u ORDER BY 1""".stripMargin),

    "q_dau_stickiness" -> e(Events.dauStickiness,
      s"""WITH ud AS (SELECT DISTINCT user_id,
         |   epoch_us(CAST(ts AS TIMESTAMP)) // ${Events.DayUs} AS day
         |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
         | dau AS (SELECT day, count(DISTINCT user_id) AS dau
         |  FROM ud GROUP BY 1),
         | ex AS (SELECT DISTINCT user_id, day2 FROM (
         |   SELECT user_id, unnest(generate_series(day, day + 6)) AS day2
         |   FROM ud)),
         | wau AS (SELECT day2 AS day, count(DISTINCT user_id) AS wau
         |  FROM ex GROUP BY 1)
         |-- HUGEINT widening mirrors the Spark decimal(38,0) product
         |SELECT day, dau, wau,
         | CAST(CAST(dau AS HUGEINT) * 1000000 // wau AS BIGINT)
         |   AS stickiness_ppm
         |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin),

    "q_error_burst" -> e(Events.errorBurst,
      """WITH e AS (SELECT user_id,
        |   epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
        |  WHERE event_type = 'error' AND ts IS NOT NULL
        |    AND user_id IS NOT NULL),
        | c AS (SELECT user_id, us,
        |   count(*) OVER (PARTITION BY user_id ORDER BY us
        |     RANGE BETWEEN CURRENT ROW AND 21600000000 FOLLOWING) AS n5
        |  FROM e)
        |SELECT user_id, count(*) AS n_burst_starts,
        | min(us) AS first_burst_us, CAST(max(n5) AS BIGINT) AS max_burst
        |FROM c WHERE n5 >= 3 GROUP BY 1 ORDER BY 1""".stripMargin),

    "q_peak_hours" -> e(Events.peakHours,
      s"""WITH e AS (SELECT event_type,
         |   (epoch_us(CAST(ts AS TIMESTAMP)) % ${Events.DayUs})
         |     // 3600000000 AS hod
         |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
         | c AS (SELECT event_type, hod, count(*) AS n FROM e GROUP BY 1, 2),
         | t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot
         |  FROM c GROUP BY 1)
         |-- HUGEINT widening mirrors the Spark decimal(38,0) product
         |SELECT c.event_type, c.hod, c.n,
         | CAST(CAST(c.n AS HUGEINT) * 1000000 // t.tot AS BIGINT)
         |   AS share_ppm
         |FROM c JOIN t USING (event_type) ORDER BY 1, 2""".stripMargin),
  )
}
