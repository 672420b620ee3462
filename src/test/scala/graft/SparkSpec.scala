package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session — sbt forks
  * a single test JVM). */
object SparkSpec {
  // Keep test-created stage checkpoints (many from per-test temp input
  // dirs) in a JVM-private root instead of the per-checkout persistent
  // root, so test runs don't grow the persistent cache with
  // never-again-referenced entries. Set before the first Stages use —
  // the root is resolved lazily on first materialize.
  System.setProperty("graft.stages.dir",
    java.nio.file.Files.createTempDirectory("graft-test-stages").toString)

  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  lazy val sf: String = "/root/testdata/sf0.001"
}
