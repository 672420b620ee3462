package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: per-query parquet-scan counts over the whole inventory —
  * the cheap smell test for duplicated subtrees (a union of selects
  * over one frame, a re-derived stage, a missing persist). A query
  * whose plan scans far more files than it has logical inputs is
  * re-computing something. Usage: sbt "runMain graft.DevScans [sfDir]". */
object DevScans {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = graft.engine.Sessions.tuned(
      SparkSession.builder().master("local[8]"), 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val counts = SparkEntry.queries.toSeq.map { case (name, fn) =>
      val n = try {
        val p = fn(spark, dir).queryExecution.sparkPlan.toString
        "Scan parquet".r.findAllIn(p).size
      } catch { case scala.util.control.NonFatal(_) => -1 }
      name -> n
    }
    counts.sortBy(-_._2).foreach { case (n, c) =>
      println(f"SCANS $c%3d  $n")
    }
    spark.stop()
  }
}
