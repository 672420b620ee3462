package graft.api

import scala.util.{Failure, Success, Try}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import graft.engine._

/** User-facing facade with the reference's exact operator surface — a
  * flowbyte `MSSQL` user (`sql.py:21-332`) maps 1:1 onto this class, with
  * a parquet "warehouse" directory standing in for the remote database
  * (one `<table>.parquet` per table) and Spark SQL standing in for the
  * delegated T-SQL surface.
  *
  * | reference                         | here                        |
  * |-----------------------------------|-----------------------------|
  * | `MSSQL(host, db, …)` `sql.py:26`  | `FlowEngine(spark, dir)`    |
  * | `connect` `sql.py:36`             | `connect()` registers views |
  * | `disconnect` `sql.py:62`          | `disconnect()`              |
  * | `get_data(query, …)` `sql.py:88`  | `getData(query, …)`         |
  * | `insert_data` `sql.py:174`        | `insertData`                |
  * | `update_data` `sql.py:191`        | `updateData`                |
  * | `update_from_table` `sql.py:253`  | `updateFromTable`           |
  * | `truncate_table` `sql.py:292`     | `truncateTable`             |
  * | `delete_data` `sql.py:307`        | `deleteData`                |
  * | `delete_data_with_conditions` `sql.py:321` | `deleteDataWithConditions` |
  *
  * Error contract preserved: extraction logs and returns None instead of
  * raising (`sql.py:166-171`); mutations validate inputs.
  */
final class FlowEngine(val spark: SparkSession, warehouse: String) {

  private val log = Log()

  // views THIS engine registered — disconnect must not drop a caller's
  // own temp views, which share the session catalog
  private val registered = scala.collection.mutable.Set.empty[String]

  private def tablePath(table: String): String = s"$warehouse/$table.parquet"

  /** "Open the connection": register every `<table>.parquet` under the
    * warehouse as a temp view so `getData` can run arbitrary SQL against
    * them (the reference's connect, `sql.py:36-58`, with the catalog in
    * place of a socket). */
  def connect(): Try[Seq[String]] = Try {
    val root = new Path(warehouse)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tables = fs.listStatus(root).toSeq
      .map(_.getPath.getName).filter(_.endsWith(".parquet"))
      .map(_.stripSuffix(".parquet")).sorted
    tables.foreach { t =>
      spark.read.parquet(tablePath(t)).createOrReplaceTempView(t)
      registered += t
    }
    log.message = s"Connected: ${tables.size} tables registered"
    log.status = "success"
    log.printMessage()
    tables
  }

  /** Drop the views THIS engine registered (`disconnect`,
    * `sql.py:62-85`; the session itself belongs to the caller, like the
    * reference's engine — so a caller's own temp views survive). */
  def disconnect(): Unit = {
    registered.foreach(spark.catalog.dropTempView)
    registered.clear()
    log.message = "Disconnected"; log.status = "success"; log.printMessage()
  }

  /** Arbitrary-SQL extract with the reference's post-processing pipeline
    * (`sql.py:88-171`): run query → caller dtype coercion → decimal
    * (38,20) normalization → optional progress callback. Returns None on
    * error (logged), like the reference — for errors surfaced by this
    * call (parse/analysis, and full execution when `progress` is set);
    * without a progress callback the returned frame is LAZY, so a
    * runtime-only failure (e.g. a corrupt file) surfaces at the caller's
    * first action, as with any DataFrame.
    *
    * When `progress` is set the frame must execute once to drive the
    * callback, so it is persisted first — the caller's subsequent action
    * reads the cache instead of re-running the query (unpersist when
    * done). */
  def getData(
      query: String,
      spec: Types.CoercionSpec = Types.CoercionSpec(),
      progress: Option[(Long, Long) => Unit] = None): Option[DataFrame] =
    Try {
      val df = Types.normalizeDecimals(Types.coerce(spark.sql(query), spec))
      progress.foreach { cb =>
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // a failing counted query must not leak a pinned cache entry on
        // a long-lived session — unpersist before surfacing the error
        try ProgressReporter.withProgress(spark)(cb)(df.count())
        catch { case e: Throwable => df.unpersist(); throw e }
      }
      df
    } match {
      case Success(df) => Some(df)
      case Failure(ex) =>
        log.message = s"get_data failed: ${ex.getMessage}"
        log.status = "fail"
        log.printMessage()
        None
    }

  /** After any mutation, the table's registered view and Spark's file
    * index must see the new files: temp views pin the `InMemoryFileIndex`
    * listed at connect() time, so without a refresh a subsequent
    * `getData` silently reads STALE rows after an append — or crashes
    * with FILE_NOT_EXIST after a rewrite renamed the old files away.
    * (The reference's MSSQL connection always sees current data.) */
  private def refreshTable(table: String): Unit = {
    spark.catalog.refreshByPath(tablePath(table))
    if (registered.contains(table))
      spark.read.parquet(tablePath(table)).createOrReplaceTempView(table)
  }

  /** Chunked append (`insert_data`, `sql.py:174-188`): `chunkRows` maps
    * the reference's chunk size onto a partition count. The input is
    * persisted around the count + write so the records plan executes
    * once, not twice (and a non-deterministic input cannot yield a
    * chunk count inconsistent with the rows written). */
  def insertData(table: String, records: DataFrame, chunkRows: Int = 10000): Unit = {
    // only unpersist what THIS call persisted: if the caller already
    // persisted this exact frame, a finally-unpersist here would drop
    // their cache entry as a side effect
    val wePersisted =
      records.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    if (wePersisted)
      records.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ceil, not floor: floor put up to 2·chunkRows-1 rows in one chunk
      val n = records.count()
      val parts = math.max(1L, (n + chunkRows - 1) / math.max(1, chunkRows)).toInt
      Sinks.append(records, tablePath(table), parts)
    } finally if (wePersisted) records.unpersist()
    refreshTable(table)
  }

  /** Keyed update (`update_data`, `sql.py:191-249`): the per-record
    * UPDATE loop becomes one join + rewrite. Accepts in-memory records
    * like the reference's `list[dict]`. */
  def updateData(table: String, records: Seq[Row], keys: Seq[String]): Unit = {
    require(records.nonEmpty, "update records must be non-empty")
    require(records.head.schema != null,
      "update records must carry a schema (build rows with a case class, " +
        "Row + RowEncoder, or createDataFrame with an explicit StructType; " +
        "bare Row(...) has no schema)")
    val target = spark.read.parquet(tablePath(table))
    val updates = spark.createDataFrame(
      spark.sparkContext.parallelize(records), records.head.schema)
    require(keys.forall(updates.columns.contains),
      s"keys ${keys.mkString(",")} must be present in update records")
    val out = Mutations.applyUpdates(target, updates, keys)
    Sinks.overwriteInPlace(spark, out, tablePath(table))
    refreshTable(table)
  }

  /** Set-oriented merge from another table (`update_from_table`,
    * `sql.py:253-289`; first updates column list = all non-key source
    * columns, mirroring `sql.py:271`'s "first column is the key"). */
  def updateFromTable(table: String, source: DataFrame, keys: Seq[String]): Unit = {
    val target = spark.read.parquet(tablePath(table))
    val out = Mutations.applyUpdates(target, source, keys)
    Sinks.overwriteInPlace(spark, out, tablePath(table))
    refreshTable(table)
  }

  def truncateTable(table: String): Unit = {
    Sinks.truncate(spark, tablePath(table))
    refreshTable(table)
  }

  def deleteData(table: String): Unit = {
    Sinks.deleteAll(spark, tablePath(table))
    refreshTable(table)
  }

  /** Conditional delete (`sql.py:321-332`): predicate string parsed by
    * Catalyst, rows matching it removed. */
  def deleteDataWithConditions(table: String, conditions: String): Unit = {
    val target = spark.read.parquet(tablePath(table))
    val out = Mutations.deleteWhere(target, conditions)
    Sinks.overwriteInPlace(spark, out, tablePath(table))
    refreshTable(table)
  }
}

object FlowEngine {

  /** JDBC extract — literal parity with the reference's remote-database
    * read path (`sql.py:88-109`: arbitrary query, chunked fetch →
    * `fetchsize`). Untestable in this zero-egress environment. */
  def jdbcQuery(spark: SparkSession, url: String, query: String,
      fetchSize: Int = 10000,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("query", query)
      .option("fetchsize", fetchSize)
      .options(options)
      .load()
}
