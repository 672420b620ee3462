package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of declared queries.
  * Usage: sbt "runMain graft.Explain q_name [sfDir]"  (or `all`). */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("all")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    // Sessions.tuned: the printed plans are the plans Bench/Verify run
    val spark = graft.engine.Sessions.tuned(
      SparkSession.builder().master("local[4]"), 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (name == "all") Registry.queries.keys.toSeq.sorted else Seq(name)
    names.foreach { n =>
      println(s"========== $n ==========")
      Registry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
