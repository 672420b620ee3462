package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke runner: drives the driver contract surface end-to-end —
  * `SparkEntry.entry` (flagship, sf0.001) plus a couple of probes.
  * Usage: sbt "runMain graft.Smoke"
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Sessions.tuned(
      SparkSession.builder().master("local[4]"), 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val df = SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + df.count())
    df.show(5, false)

    println("ORACLE_KEYS_SUBSET_OF_QUERIES=" +
      SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))

    // the subset check above is near-tautological (both maps derive from
    // Registry.entries); the invariant that CAN break is a duplicate
    // query name across the per-module registries silently collapsing
    // in the map — check the raw entry list for collisions
    val names = Registry.entryNames
    println("REGISTRY_NAMES_UNIQUE=" + (names.distinct.size == names.size))

    // error-path probe: missing directory surfaces a clear analysis error
    try {
      SparkEntry.queries("q_scan_project")(spark, "/no/such/dir").count()
      println("BADDIR=no-error (unexpected)")
    } catch {
      case e: Throwable => println("BADDIR_ERR_CLASS=" + e.getClass.getName)
    }
    spark.stop()
  }
}
