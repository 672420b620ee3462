package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time a named query N times in one session (separates
  * codegen/JIT warmup from steady-state cost). Runs the same
  * Sessions.tuned configuration as Bench so probe timings predict
  * bench timings.
  * Usage: sbt "runMain graft.Probe q_name [sfDir] [reps] [k=v ...]" */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val b = graft.engine.Sessions.tuned(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
    // extra confs as key=value args — reject anything else with a usage
    // message instead of an opaque MatchError
    args.drop(3).foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => b.config(k, v)
        case _ =>
          System.err.println(
            s"Probe: expected key=value conf, got '$kv' — usage: " +
              "Probe q_name [sfDir] [reps] [spark.conf=value ...]")
          sys.exit(1)
      }
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
