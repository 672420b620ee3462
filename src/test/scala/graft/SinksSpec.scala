package graft

import java.nio.file.Files
import graft.engine.Sinks

class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_sink").resolve("t").toString

  test("append accumulates rows across writes (insert_data semantics)") {
    val p = tmp()
    Sinks.append(Seq(1, 2).toDF("x"), p)
    Sinks.append(Seq(3).toDF("x"), p)
    assert(spark.read.parquet(p).count() == 3)
  }

  test("truncate leaves an empty table with the same schema (sql.py:292-302)") {
    val p = tmp()
    Sinks.append(Seq((1, "a")).toDF("x", "s"), p)
    Sinks.truncate(spark, p)
    val df = spark.read.parquet(p)
    assert(df.count() == 0)
    assert(df.columns.toSeq == Seq("x", "s"))
  }

  test("truncate of a Hive-partitioned table stays readable with full schema") {
    val p = tmp()
    Seq((1, "a", "d1"), (2, "b", "d2")).toDF("x", "s", "day")
      .write.partitionBy("day").parquet(p)
    Sinks.truncate(spark, p)
    // a partitionBy'd empty write would produce NO parquet files and the
    // table would become unreadable (UNABLE_TO_INFER_SCHEMA)
    val df = spark.read.parquet(p)
    assert(df.count() == 0)
    assert(df.columns.toSet == Set("x", "s", "day"))
    // and the table accepts appends again
    Sinks.append(Seq((3, "c", "d3")).toDF("x", "s", "day"), p)
    assert(spark.read.parquet(p).count() == 1)
  }

  test("deleteAll == truncate semantics (sql.py:307-317)") {
    val p = tmp()
    Sinks.append(Seq(1, 2, 3).toDF("x"), p)
    Sinks.deleteAll(spark, p)
    assert(spark.read.parquet(p).count() == 0)
  }
}
