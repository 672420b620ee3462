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

  /** DuckDB mirror of [[TextOps.corpus]] — the canonical-corpus CTE:
    * one row per non-null doc_id, survivor = min md5 over the
    * chr(1)-delimited, chr(2)-null-sentineled field tuple. Injected by
    * [[canonDocs]] into every oracle that reads the documents table so
    * both engines agree on what "the corpus" is when the raw table
    * carries duplicate or null ids. */
  val DocsCte: String =
    "docs AS (SELECT doc_id, UNNEST(arg_min(" +
      "struct_pack(text:=coalesce(text, ''), " +
      "lang:=lang, source:=source, n_chars:=n_chars), " +
      "md5(concat_ws(chr(1), coalesce(text, chr(2)), " +
      "coalesce(source, chr(2)), coalesce(lang, chr(2)), " +
      "coalesce(CAST(n_chars AS VARCHAR), chr(2)))))) " +
      "FROM documents WHERE doc_id IS NOT NULL GROUP BY doc_id)"

  /** Redirect an oracle's `documents` references to the canonical-docs
    * CTE. No-op for oracles that never touch the documents table. */
  def canonDocs(sql: String): String =
    if (!sql.contains("documents")) sql
    else {
      val r = sql.replaceAll("\\bdocuments\\b", "docs")
      // WITH RECURSIVE lists may mix in non-recursive CTEs, but the
      // RECURSIVE keyword must stay first: inject docs after it
      if (r.matches("(?s)\\s*WITH\\s+RECURSIVE\\s.*"))
        r.replaceFirst("WITH\\s+RECURSIVE\\s", s"WITH RECURSIVE $DocsCte,\n ")
      else if (r.matches("(?s)\\s*WITH\\s.*"))
        r.replaceFirst("WITH\\s", s"WITH $DocsCte,\n ")
      else s"WITH $DocsCte\n$r"
    }

  final case class Entry(
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  def e(fn: (SparkSession, String) => DataFrame, sql: String): Entry =
    Entry((s, d) => portableOrder(fn(s, d)), Some(canonDocs(sql)))

  /** Entry with no SQL-expressible oracle (driver records rows-only). */
  def noOracle(fn: (SparkSession, String) => DataFrame): Entry =
    Entry((s, d) => portableOrder(fn(s, d)), None)
}
