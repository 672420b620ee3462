package graft.engine

import org.apache.spark.sql.SparkSession

/** Session presets: one place for the configuration that decides whether
  * plans behave at scale, instead of scattering `.config` calls.
  *
  * The same builder settings serve local[N] (tests, the driver harness)
  * and a real cluster — only master/memory/shuffle-partition counts
  * change, never query code.
  */
object Sessions {

  /** Local session matching the driver-harness contract (UTC, AQE on,
    * shuffle partitions = cores, UI off). */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    tuned(SparkSession.builder().master(s"local[$cores]"), shufflePartitions = cores)
      .getOrCreate()

  /** Cluster-shaped tuning applied to any builder. Numbers that matter at
    * 100 TB:
    *  - `shuffle.partitions`: ≈ 2–3× total executor cores; with AQE on,
    *    this is the *upper bound* — AQE coalesces down post-shuffle.
    *  - `files.maxPartitionBytes` 256 MB: fewer, fuller scan tasks for
    *    columnar parquet (default 128 MB doubles task count for no win
    *    on large scans).
    *  - AQE + skew-join: runtime re-planning splits oversized shuffle
    *    partitions; complements [[Layout.saltedJoin]], which handles skew
    *    the planner can see coming.
    *  - broadcast threshold 64 MB: dimension tables (region/nation/
    *    customer at warehouse scale) stay broadcast, avoiding fact-side
    *    shuffles in star joins.
    */
  def tuned(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (256L * 1024 * 1024).toString)
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
}
