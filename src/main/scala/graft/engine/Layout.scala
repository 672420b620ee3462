package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Physical-layout toolkit — the knobs that decide whether a plan
  * survives a 100× scale-up:
  *
  *  - [[writeBucketed]]: co-locate join keys at write time so repeated
  *    big-big joins on that key skip the shuffle entirely (bucketed
  *    SortMergeJoin with zero Exchange);
  *  - [[writePartitionedByDay]]: day-partitioned layout so time-range
  *    predicates prune whole directories at planning time;
  *  - [[saltedJoin]]: spread a skewed build side across `salts`
  *    replicas when one hot key would otherwise pin a single reducer
  *    (complementary to AQE skew-join, which only splits *post-shuffle*
  *    partitions).
  */
object Layout {

  /** Bucketed, sorted-by-key external table at `path`. Joining two
    * tables bucketed the same way on the same key is shuffle-free. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      bucketCol: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Day-partitioned event layout: `day=YYYY-MM-DD/` directories. */
  def writePartitionedByDay(df: DataFrame, path: String, tsCol: String): Unit =
    df.withColumn("day", date_format(col(tsCol), "yyyy-MM-dd"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("day")
      .parquet(path)

  /** Compact a parquet table to ~`targetMB` files — the small-files
    * repair every long-lived warehouse needs (each append job leaves one
    * file per task; scan overhead grows with file count, not bytes).
    * Partition count derives from actual on-disk bytes, so the operation
    * is idempotent and safe to schedule.
    *
    * A Hive-partitioned layout (`col=value/` directories, e.g. from
    * [[writePartitionedByDay]]) is detected and re-written with the same
    * `partitionBy` chain — a naive rewrite would silently flatten the
    * directory structure and lose partition pruning. Rows cluster on
    * (partition columns, salt) where the salt fans each value across
    * ~`parts / |values|` writers: clustering on the partition columns
    * alone would collapse EVERY value to a single file — a 100 GB day
    * becomes one 100 GB parquet file and later scans of that day lose
    * all parallelism — while no clustering leaves one file per value
    * per task. The salt keeps per-value file sizes near `targetMB` at
    * both extremes. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetMB: Int = 256): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    val parts = math.max(1, (bytes / (targetMB.toLong * 1024 * 1024)).toInt)
    val pcols = partitionColumns(fs, p)
    val df0 = spark.read.parquet(path)
    val df =
      if (pcols.isEmpty) df0.repartition(parts)
      else {
        val nValues =
          math.max(1L, df0.select(pcols.map(col): _*).distinct().count())
        val saltN = math.max(1L, math.ceil(parts.toDouble / nValues).toLong)
        df0.withColumn("__salt",
            pmod(monotonically_increasing_id(), lit(saltN)))
          .repartition(parts, (pcols.map(col) :+ col("__salt")): _*)
          .drop("__salt")
      }
    Sinks.overwriteInPlace(spark, df, path, partitionBy = pcols)
  }

  /** Hive partition columns of an on-disk layout, outermost first: each
    * directory level whose children are all `name=value` dirs with one
    * shared name contributes that name. Empty for unpartitioned tables. */
  private[engine] def partitionColumns(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[String] = {
    val cols = scala.collection.mutable.ArrayBuffer[String]()
    var cur = root
    var descend = true
    while (descend) {
      val dirs = fs.listStatus(cur).filter(_.isDirectory).map(_.getPath)
        .filterNot(d => d.getName.startsWith("_") || d.getName.startsWith("."))
      val names = dirs.map(_.getName).filter(_.contains("="))
        .map(_.split("=", 2)(0)).distinct
      if (dirs.nonEmpty && names.length == 1 &&
          dirs.forall(_.getName.contains("="))) {
        cols += names.head
        cur = dirs.head
      } else descend = false
    }
    cols.toSeq
  }

  /** Salted equi-join of a skewed fact against a dimension: the fact
    * side gets a per-row salt, the dimension is replicated `salts`
    * times, and the join key becomes (key, salt) — one hot key now
    * lands on `salts` reducers instead of one. Result set is identical
    * to `fact.join(dim, key)`. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    val salted = fact.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
