package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared shape for query-registry entries (used by the per-module
  * registries and aggregated in [[graft.Registry]]). */
object Registry0 {

  final case class Entry(
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  def e(fn: (SparkSession, String) => DataFrame, sql: String): Entry =
    Entry(fn, Some(sql))

  /** Entry with no SQL-expressible oracle (driver records rows-only). */
  def noOracle(fn: (SparkSession, String) => DataFrame): Entry =
    Entry(fn, None)
}
