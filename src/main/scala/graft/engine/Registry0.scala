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

  /** DuckDB mirror of [[Similarity.canonEmb]] — the canonical-vectors
    * CTE: degenerate rows (null id, null/empty/zero-norm/NaN-poisoned
    * embedding) dropped at intake, then one survivor per vec_id by the
    * (coalesced label, embedding) min key. Injected by [[canonVecs]]
    * into every oracle that reads the embeddings table. */
  val VecsCte: String =
    // row_number, not arg_min: DuckDB's arg_min cannot order a struct
    // key holding a LIST field, but a window ORDER BY on (coalesced
    // label, embedding) sorts lists lexicographically — the same rule
    // Spark's min_by struct ordering applies
    "vecs AS (SELECT vec_id, embedding, label FROM (" +
      "SELECT vec_id, embedding, label, row_number() OVER (" +
      "PARTITION BY vec_id " +
      "ORDER BY coalesce(label, 2147483647), embedding) AS rn " +
      // list_sum SKIPS null elements while Spark's dot product
      // null-poisons the norm — exclude null-element vectors explicitly
      // so both engines drop the same degenerate rows
      "FROM (SELECT *, sqrt(list_sum(list_transform(embedding, " +
      "x -> CAST(x AS DOUBLE)*x))) AS nm FROM embeddings " +
      "WHERE vec_id IS NOT NULL AND embedding IS NOT NULL " +
      "AND len(list_filter(embedding, x -> x IS NULL)) = 0) " +
      "WHERE nm > 0 AND NOT isnan(nm)) WHERE rn = 1)"

  /** Redirect an oracle's references to `table` to the canonical CTE
    * `cteName`, prepending `cte` to the WITH list (after RECURSIVE,
    * whose keyword must stay first). No-op when the table is unused. */
  private def injectCte(sql: String, table: String, cteName: String,
      cte: String): String =
    if (!sql.contains(table)) sql
    else {
      val r = sql.replaceAll(s"\\b$table\\b", cteName)
      if (r.matches("(?s)\\s*WITH\\s+RECURSIVE\\s.*"))
        r.replaceFirst("WITH\\s+RECURSIVE\\s", s"WITH RECURSIVE $cte,\n ")
      else if (r.matches("(?s)\\s*WITH\\s.*"))
        r.replaceFirst("WITH\\s", s"WITH $cte,\n ")
      else s"WITH $cte\n$r"
    }

  def canonDocs(sql: String): String =
    injectCte(sql, "documents", "docs", DocsCte)

  def canonVecs(sql: String): String =
    injectCte(sql, "embeddings", "vecs", VecsCte)

  final case class Entry(
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  def e(fn: (SparkSession, String) => DataFrame, sql: String): Entry =
    Entry((s, d) => portableOrder(fn(s, d)), Some(canonVecs(canonDocs(sql))))

  /** Entry with no SQL-expressible oracle (driver records rows-only). */
  def noOracle(fn: (SparkSession, String) => DataFrame): Entry =
    Entry((s, d) => portableOrder(fn(s, d)), None)
}
