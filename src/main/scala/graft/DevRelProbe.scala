package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: break down the relational stage-build cost at a given
  * SF dir (`runMain graft.DevRelProbe <sfDir>`) — times the raw scan,
  * the bare aggregate, and the Stages-materialized build separately so
  * a super-linear stages_sec can be attributed. */
object DevRelProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = graft.engine.Sessions.tuned(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[relprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.1fs  ($r)")
    }
    val ord = spark.read.parquet(s"$d/orders.parquet")
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    t("orders count")(ord.count())
    t("orders parts")(ord.rdd.getNumPartitions)
    t("lineitem count")(li.count())
    val cum = ord.groupBy(col("o_custkey"))
      .agg((sum(col("o_totalprice").try_cast("decimal(10,2)")) * 100)
        .cast("long").as("cents"))
    t("cum_share agg count")(cum.count())
    t("cum_share agg WRITE")(
      cum.write.mode("overwrite").parquet("/tmp/relprobe_cum"))
    t("basket agg (no write)")(
      li.filter(col("l_orderkey").isNotNull)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
        .select(explode(flatten(expr(
          "transform(parts, (x, i) -> " +
            "transform(slice(parts, i + 2, size(parts)), " +
            "y -> struct(x AS p1, y AS p2)))"))).as("pr"))
        .groupBy(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
        .agg(count(lit(1)).as("n_ab")).count())
    spark.stop()
  }
}
