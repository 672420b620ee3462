package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Set-oriented rewrites of the reference's row-at-a-time mutations.
  *
  * The reference updates row-by-row over ODBC — `update_data`
  * (`sql.py:191-249`) issues one UPDATE statement *per record*, and
  * `update_from_table` (`sql.py:253-289`) templates a single
  * UPDATE…FROM…JOIN. Both collapse to the same Spark shape: one shuffle
  * (or broadcast) join of the updates against the target plus a coalesce
  * projection — per-record commits become a single job commit
  * (SURVEY.md §3.3). At 100 TB this is the only viable shape: the join
  * shuffles on the key once, and a small updates side broadcasts.
  */
object Mutations {

  /** Apply `updates` to `target` by `keys`: rows whose key matches take the
    * updates' non-null column values; unmatched target rows pass through.
    * Column set of `updates` must be keys ⊆ cols ⊆ target cols.
    * This is `update_data`/`update_from_table` as one equi-join.
    *
    * No forced broadcast: an updates side of unbounded size must be
    * allowed to shuffle-join (a hardcoded hint OOMs the moment a backfill
    * ships a big update set). AQE still turns the join into a broadcast
    * at runtime whenever the updates side measures small; callers that
    * KNOW the side is tiny can pass `hintBroadcast = true`. */
  def applyUpdates(target: DataFrame, updates: DataFrame, keys: Seq[String],
      hintBroadcast: Boolean = false): DataFrame = {
    // a misspelled updates column would otherwise be dropped silently by
    // the projection below — the caller would believe the update applied
    require(updates.columns.toSet.subsetOf(target.columns.toSet),
      s"updates columns ${updates.columns.toSet -- target.columns.toSet} " +
        "not present in target")
    require(keys.forall(updates.columns.contains),
      s"updates must carry the key columns $keys")
    // CONTRACT: updates carries at most one row per key — a duplicate key
    // fans the left join out and multiplies target rows, which a per-row
    // UPDATE can never do. Deduplicate upstream (e.g. keep-latest CDC).
    val updatedCols = updates.columns.filterNot(keys.contains)
    val t = target.alias("t")
    val u0 = updates.alias("u")
    val u = if (hintBroadcast) broadcast(u0) else u0
    val joined = t.join(u, keys, "left")
    joined.select(target.columns.toIndexedSeq.map { c =>
      if (keys.contains(c)) col(c)
      else if (updatedCols.contains(c)) coalesce(col(s"u.$c"), col(s"t.$c")).as(c)
      else col(s"t.$c")
    }: _*)
  }

  /** Upsert: applyUpdates + insert of update rows whose key has no match
    * in the target (`sql.py:191-249` extended with insert-of-unmatched;
    * the post-image keyset is the union of both keysets). Updates must
    * carry the full target schema for the insert half. */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val updated = applyUpdates(target, updates, keys)
    val newRows = updates.join(target.select(keys.map(col): _*), keys, "left_anti")
    updated.unionByName(newRows.select(target.columns.toIndexedSeq.map(col): _*))
  }

  /** Conditional delete (`sql.py:321-332`) as an anti-filter: keep exactly
    * the rows NOT matching the caller's predicate string. SQL DELETE
    * removes only rows where the predicate IS TRUE — rows where it
    * evaluates NULL (nullable columns) are KEPT, so the kept-set filter
    * is `NOT coalesce(pred, false)`; a plain `!pred` would silently
    * delete the NULL rows too. Catalyst parses the predicate (`expr`),
    * so filters still push down to the scan. */
  def deleteWhere(table: DataFrame, conditions: String): DataFrame =
    table.filter(!coalesce(expr(conditions), lit(false)))
}
