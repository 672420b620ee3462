package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import Registry0.{Entry, e => oe}

/** Layer-bisection diagnostics for the two pipelines that were driver
  * hash-red in rounds 3-5 (q_pack_seqs, q_event_trans). Each query is a
  * tiny, independently-oracled slice of the failing pipeline, so a
  * red/green pattern in the driver gate localizes a divergence to one
  * layer: corpus+tokenizer → windowed cumsum (packing), and event
  * multiset+µs conversion → per-user adjacency (transitions).
  *
  * The r6 root cause was found statically (HUGEINT-typed oracle output
  * columns — see the q_pack_seqs/q_event_trans oracle comments and
  * scripts/check.py int128_cols), so these are expected green; they stay
  * registered as permanent regression coverage of the layers three
  * rounds of theorizing could not see from outside the driver.
  *
  * Scale notes: pack diagnostics ride the same per-source window
  * partitioning as packSeqs (no global order); event diagnostics are
  * one user-keyed shuffle each; the pairs slice bounds its output by
  * |users/7| × |event_type|².
  */
object DiagRegistry {

  /** events with epoch-µs long, mirroring Events.ev (private there). */
  private def evUs(s: SparkSession, d: String): DataFrame =
    Sources.events(s, d).withColumn("us",
      unix_micros(col("ts").cast("timestamp")).cast(LongType))

  /** Canonical corpus projected to the packSeqs input tuple. */
  def packInput(s: SparkSession, d: String): DataFrame =
    TextOps.corpus(s, d)
      .select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast(LongType).as("n_tok"))
      .orderBy("doc_id", "source", "n_tok")

  /** packSeqs through the windowed running sum, before any seq math. */
  def packCum(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("doc_id"), col("n_tok"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    TextOps.corpus(s, d)
      .select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast(LongType).as("n_tok"))
      .withColumn("tok_end", sum(col("n_tok")).over(w))
      .orderBy("doc_id", "source", "n_tok", "tok_end")
  }

  /** Per-user event multiset + µs-conversion profile: any single-µs
    * ns→µs disagreement moves min/max or the time-of-day sum. The
    * day-remainder sum (not sum(us)) keeps the int64 headroom
    * unconditional: 8.64e10 × rows never approaches 2^63. */
  def evProfile(s: SparkSession, d: String): DataFrame =
    evUs(s, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        count(col("us")).as("n_dated"),
        min(col("us")).as("min_us"),
        max(col("us")).as("max_us"),
        sum(expr(s"us % ${Events.DayUs}")).as("sum_tod"))
      .orderBy("user_id", "n", "n_dated", "min_us", "max_us", "sum_tod")

  /** Per-user transition counts on a deterministic 1-in-7 user slice —
    * the eventTrans lead() chain before its global aggregation, keyed
    * by user so a divergence names the users it lives in. */
  def evPairs(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"), col("event_type"))
    evUs(s, d)
      .filter(col("user_id") % 7 === 0)
      .select(col("user_id"), col("event_type"), col("us"), col("event_id"))
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("user_id"), col("event_type").as("from_type"),
        col("nxt").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("user_id", "from_type", "to_type", "n")
  }

  /** Data-independent type-rendering canary: one literal row covering
    * every output type the declared inventory uses (BIGINT incl.
    * negative, DOUBLE across magnitudes, ASCII + non-ASCII STRING,
    * DATE, TIMESTAMP). Every value is exactly representable, so any
    * red here isolates a COMPARATOR rendering/canonicalization quirk
    * for that type — the class that hid the r3-r5 HUGEINT reds — with
    * zero data dependence. */
  def typeProbe(s: SparkSession, d: String): DataFrame =
    s.range(1).select(
      lit(42L).as("i"), lit(-7L).as("ineg"),
      lit(2.5).as("d"), lit(0.001).as("dsmall"),
      lit(1.5e15).as("dbig"), lit(-3.25).as("dneg"),
      lit("abc").as("str"), lit("café 中文").as("uni"),
      to_date(lit("2024-06-01")).as("dt"),
      lit("2024-06-01 12:34:56.789").cast("timestamp").as("ts"))
      // one literal row, but the registry contract requires an
      // outermost total-order sort on every declared query
      .orderBy("i")

  val entries: Seq[(String, Entry)] = Seq(

    "q_diag_types" -> oe(typeProbe _,
      """SELECT CAST(42 AS BIGINT) AS i, CAST(-7 AS BIGINT) AS ineg,
        | CAST(2.5 AS DOUBLE) AS d, CAST(0.001 AS DOUBLE) AS dsmall,
        | CAST(1.5e15 AS DOUBLE) AS dbig, CAST(-3.25 AS DOUBLE) AS dneg,
        | 'abc' AS str, 'café 中文' AS uni,
        | DATE '2024-06-01' AS dt,
        | TIMESTAMP '2024-06-01 12:34:56.789' AS ts
        |ORDER BY i""".stripMargin),

    "q_diag_pack_input" -> oe(packInput _,
      """SELECT doc_id, source,
        | CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok
        |FROM documents ORDER BY doc_id, source, n_tok""".stripMargin),

    "q_diag_pack_cum" -> oe(packCum _,
      """WITH t AS (SELECT doc_id, source,
        |   CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok
        |  FROM documents)
        |SELECT doc_id, source, n_tok,
        | CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id, n_tok
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS tok_end
        |FROM t ORDER BY doc_id, source, n_tok, tok_end""".stripMargin),

    "q_diag_ev_us" -> oe(evProfile _,
      s"""WITH e AS (SELECT user_id,
         |   epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events)
         |SELECT user_id, count(*) AS n, count(us) AS n_dated,
         | min(us) AS min_us, max(us) AS max_us,
         | CAST(sum(us % ${Events.DayUs}) AS BIGINT) AS sum_tod
         |FROM e GROUP BY 1
         |ORDER BY user_id, n, n_dated, min_us, max_us, sum_tod""".stripMargin),

    "q_diag_ev_pairs" -> oe(evPairs _,
      """WITH e AS (SELECT user_id, event_id, event_type,
        |   epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
        |  WHERE user_id % 7 = 0),
        | x AS (SELECT user_id, event_type, lead(event_type) OVER (
        |    PARTITION BY user_id ORDER BY us, event_id, event_type) AS nxt
        |   FROM e)
        |SELECT user_id, event_type AS from_type, nxt AS to_type,
        | count(*) AS n
        |FROM x WHERE nxt IS NOT NULL GROUP BY 1, 2, 3
        |ORDER BY user_id, from_type, to_type, n""".stripMargin),
  )
}
