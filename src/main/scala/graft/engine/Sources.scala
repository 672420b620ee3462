package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Table readers over the driver testdata layout (`<dir>/<name>.parquet`).
  *
  * Replaces the reference's chunked ODBC extract (flowbyte
  * `sql.py:88-171`): chunked fetch becomes a partitioned columnar scan
  * (Parquet vectorized reader), the per-chunk dtype/decimal passes become
  * a single Project that Catalyst folds into the scan (SURVEY.md §3.1).
  */
object Sources {

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The reference's full extract pipeline (`sql.py:88-171`) as one
    * declarative read: scan → caller dtype coercion → decimal(38,20)
    * normalization. */
  def extract(
      spark: SparkSession,
      dir: String,
      name: String,
      spec: Types.CoercionSpec = Types.CoercionSpec()): DataFrame =
    Types.normalizeDecimals(Types.coerce(read(spark, dir, name), spec))

  def region(s: SparkSession, d: String): DataFrame   = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = read(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")

  /** Delimited-text extract — the flat-file connector an ETL engine
    * pairs with its database connector. The schema is EXPLICIT and
    * required: inference would scan the file once just to guess types
    * (2× the IO at 100 TB) and guess nondeterministically across
    * drops. Mode is PERMISSIVE: malformed lines land in the
    * `_corrupt_record` column when the caller includes it in the
    * schema (the quarantine-not-crash discipline a bulk load needs) —
    * add it and filter to split good/bad streams. */
  def readCsv(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("mode", "PERMISSIVE")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(path)

  /** JSON-lines extract, explicit schema (same rationale as
    * [[readCsv]]): one object per line splits cleanly by newline, so
    * the read parallelizes like any text scan. */
  def readJsonLines(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .json(path)

  /** `events.parquet` carries a nanosecond-precision timestamp, which
    * Spark's Parquet reader does not model natively; read it as raw
    * nanos (legacy long mode) and truncate to microseconds — matching
    * what DuckDB's reader does when it casts TIMESTAMP_NS to TIMESTAMP.
    *
    * The `nanosAsLong` flag is DELIBERATELY session-sticky: it has to be
    * in effect whenever a plan over this frame is analyzed or executed,
    * and the frames returned here are lazy, so a set/restore around the
    * read would break later execution. The flag only affects nano-
    * precision parquet columns — which stock Spark cannot read at all
    * (it errors) — so no working behavior is changed for other reads;
    * they surface as LongType instead of failing.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(spark, dir, "events")
    val df = raw.schema("ts").dataType match {
      case LongType =>
        // Integer division — `/` on longs is double division in Spark and
        // epoch-nanos exceed 2^53, which silently rounds the result.
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ => raw
    }
    df
  }
}
