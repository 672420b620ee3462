package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Ascending, NullsFirst, NullsLast, SortOrder}
import org.apache.spark.sql.graft.Bridge

/** Shared shape for query-registry entries (used by the per-module
  * registries and aggregated in [[graft.Registry]]). */
object Registry0 {

  /** Portable-ordering policy, applied to every registered query.
    *
    * Spark's ASC default is NULLS FIRST; DuckDB's (and the SQL-standard
    * common choice) is NULLS LAST — so ANY nullable sort key in a final
    * ORDER BY or a window ORDER BY diverges the two engines' row order
    * (hash-red with rows/schema green) the moment the data carries a
    * null in that column. Rather than hand-annotating ~190 orderBy call
    * sites, rewrite the analyzed plan once at the registry boundary:
    * every ascending NULLS FIRST SortOrder (the Spark default — the
    * only combination that disagrees with DuckDB; DESC already defaults
    * to NULLS LAST in both engines) becomes NULLS LAST. Explicit
    * `asc_nulls_last` / `desc_*` orderings are untouched, and the
    * rewrite is a no-op on null-free data, so it cannot flip a green
    * query. Window orderings are SortOrder expressions inside the plan,
    * so lead/lag/cumsum placement of null-keyed rows is aligned too.
    */
  def portableOrder(df: DataFrame): DataFrame = {
    val fixed = df.queryExecution.analyzed.transformAllExpressions {
      case SortOrder(c, Ascending, NullsFirst, same) =>
        SortOrder(c, Ascending, NullsLast, same)
    }
    Bridge.ofRows(df.sparkSession, fixed)
  }

  final case class Entry(
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  def e(fn: (SparkSession, String) => DataFrame, sql: String): Entry =
    Entry((s, d) => portableOrder(fn(s, d)), Some(sql))

  /** Entry with no SQL-expressible oracle (driver records rows-only). */
  def noOracle(fn: (SparkSession, String) => DataFrame): Entry =
    Entry((s, d) => portableOrder(fn(s, d)), None)
}
