package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time a named query N times in one session (separates
  * codegen/JIT warmup from steady-state cost).
  * Usage: sbt "runMain graft.Probe q_name [sfDir] [reps]" */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val b = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // extra confs as key=value args
    args.drop(3).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b.config(k, v)
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = Registry.queries(name)(spark, dir).count()
      println(f"PROBE $name rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
