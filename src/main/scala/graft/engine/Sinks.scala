package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** File sinks, replacing the reference's write-side operators:
  *
  *  - chunked append (`sql.py:174-188` `insert_data`) → partition-parallel
  *    append; the 10k-row chunk loop becomes executor tasks, one job commit
  *    instead of a commit per chunk;
  *  - truncate (`sql.py:292-302`) and full delete (`sql.py:307-317`) →
  *    overwrite with an empty frame of the same schema (both reference ops
  *    leave the table in place with zero rows — identical semantics);
  *  - conditional delete (`sql.py:321-332`) → anti-filter + overwrite,
  *    see [[Mutations.deleteWhere]] for the dataflow half.
  */
object Sinks {

  /** Append-load (`insert_data`). `partitions` plays the role of the
    * reference's chunk count, but writes run in parallel. */
  def append(df: DataFrame, path: String, partitions: Int = 0): Unit = {
    val out = if (partitions > 0) df.repartition(partitions) else df
    out.write.mode(SaveMode.Append).parquet(path)
  }

  def overwrite(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** TRUNCATE TABLE (`sql.py:301`): table survives, rows don't. */
  def truncate(spark: SparkSession, path: String): Unit = {
    val empty = spark.read.parquet(path).limit(0)
    overwrite(empty, path + ".tmp_truncate")
    // Two-step to avoid reading and overwriting the same location in one
    // job (Spark disallows it); final move is a cheap metadata rewrite.
    val df = spark.read.parquet(path + ".tmp_truncate")
    overwrite(df, path)
  }

  /** DELETE FROM without predicate (`sql.py:316`) — same visible state as
    * truncate. */
  def deleteAll(spark: SparkSession, path: String): Unit = truncate(spark, path)
}
