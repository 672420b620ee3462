package graft.engine

import scala.util.Try

/** Post-write orchestration hook, modeling the reference's Power BI
  * dataset-refresh flow (flowbyte `pbi.py:163-214`) as a pluggable
  * interface: a sink can trigger a downstream refresh after a load, with
  * the reference's idempotency guard (don't re-trigger while a refresh is
  * in flight, `pbi.py:177-183`).
  *
  * No network implementation is wired here (zero-egress environment) —
  * this is the interface + guard semantics; see [[InMemoryRefreshHook]]
  * for the testable reference implementation.
  */
trait RefreshHook {

  /** Last refresh status. Reference statuses (`pbi.py:130-134`):
    * Completed | Failed | Unknown (= in progress) | Disabled. */
  def lastStatus(): Try[String]

  /** Fire a refresh. */
  protected def trigger(): Try[Unit]

  /** Idempotent refresh: skip when a refresh is already in progress —
    * the guard of `pbi.py:177-183`. Returns true when a refresh was
    * actually triggered. */
  final def refresh(): Try[Boolean] =
    lastStatus().flatMap {
      case "Unknown" => Try(false) // in progress — don't double-trigger
      case _         => trigger().map(_ => true)
    }
}

object RefreshHook {

  /** Refresh-history ingestion (`pbi.py:89-119` `get_refreshes`): the
    * REST payload's `value` array of refresh records → DataFrame —
    * JSON-records ingestion via the built-in reader, schema inferred
    * like the reference's `pd.DataFrame(response['value'])`. */
  def refreshHistoryFrame(spark: org.apache.spark.sql.SparkSession,
      payloadJson: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.read.json(Seq(payloadJson).toDS())
      .selectExpr("inline(value)")
  }
}

/** In-memory implementation used by tests and as the default no-op. */
final class InMemoryRefreshHook(initial: String = "Completed") extends RefreshHook {
  @volatile private var status: String = initial
  @volatile var triggered: Int = 0
  def complete(ok: Boolean): Unit = status = if (ok) "Completed" else "Failed"
  override def lastStatus(): Try[String] = Try(status)
  override protected def trigger(): Try[Unit] = Try {
    triggered += 1
    status = "Unknown"
  }
}
