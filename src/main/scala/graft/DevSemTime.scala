package graft

import org.apache.spark.sql.SparkSession

import graft.engine.Sessions

/** Disposable dev probe: split q_semdedup/q_semdedup_hier wall into
  * CONSTRUCTION (queries() invocation — includes semDedupPairs' eager
  * materialization) and CONSUMPTION (the count the bench performs),
  * per rep, to attribute the round-14 gate-time delta precisely.
  * Usage: `sbt "runMain graft.DevSemTime <sfDir> [reps]"`. */
object DevSemTime {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val reps = if (args.length > 1) args(1).toInt else 4
    val spark = Sessions.tuned(
      SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("q_semdedup", "q_semdedup_hier"); r <- 1 to reps) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(q)(spark, d)
      val t1 = System.nanoTime()
      val n = df.count()
      val t2 = System.nanoTime()
      println(f"[semtime] $q%-16s rep$r construct=${(t1-t0)/1e9}%6.2f s " +
        f"consume=${(t2-t1)/1e9}%6.2f s rows=$n")
    }
    spark.stop()
  }
}
