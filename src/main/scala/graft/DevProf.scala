package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time declared queries over repeated runs and print the
  * EXECUTED (post-AQE) plan — the initial `explain` shows the
  * pre-adaptive plan, which hides runtime exchange/stage reuse.
  * Usage: sbt "runMain graft.DevProf q1 q2 ... [--sf dir] [--reps n]"
  * Prints per-rep wall seconds (rep 0 includes codegen/setup) and the
  * final plan of the last run. Same Sessions.tuned preset as Bench so
  * the measured plans are the bench's plans. */
object DevProf {
  def main(args: Array[String]): Unit = {
    val (flags, names0) = args.partition(a => a.startsWith("--"))
    def flag(k: String, dflt: String): String = {
      val i = args.indexOf(k); if (i >= 0 && i + 1 < args.length) args(i + 1) else dflt
    }
    val dir = flag("--sf", "/root/testdata/sf0.1")
    val reps = flag("--reps", "3").toInt
    val names = names0.filterNot(n => n == dir || n == reps.toString)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = graft.engine.Sessions.tuned(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same unmeasured warmup as Bench
    spark.read.parquet(s"$dir/region.parquet").groupBy("r_name").count().count()
    graft.engine.Warm.stages(spark, dir)
    names.foreach { n =>
      spark.sparkContext.setJobDescription(s"prof:$n")
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).count()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        t
      }
      println(s"### $n reps=" + times.map(t => f"$t%.2f").mkString(","))
      val df = SparkEntry.queries(n)(spark, dir)
      // run THIS QueryExecution's own adaptive plan to completion so the
      // printed tree is the final (isFinalPlan=true) one with runtime
      // stage/exchange reuse visible — df.count() would execute a
      // different QueryExecution and leave df's plan un-finalized
      df.queryExecution.executedPlan.execute().count()
      println(s"===== executed plan: $n =====")
      println(df.queryExecution.executedPlan.toString.take(12000))
      spark.catalog.clearCache()
      spark.sparkContext.setJobDescription(null)
    }
    spark.stop()
  }
}
