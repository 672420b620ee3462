package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: split a query's first-run cost into plan phases.
  * Usage: sbt "runMain graft.DevPhase q_name [sfDir]" */
object DevPhase {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.engine.Sessions.tuned(
      SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val df = t("build")(Registry.queries(name)(spark, dir))
    t("analyze")(df.queryExecution.analyzed)
    t("optimize")(df.queryExecution.optimizedPlan)
    val ep = t("physical")(df.queryExecution.executedPlan)
    println(s"PHASE plansize ${ep.toString.length}")
    t("execute1")(df.count())
    t("execute2")(df.count())
    spark.stop()
  }
}
