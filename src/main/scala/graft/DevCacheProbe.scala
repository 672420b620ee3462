package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: does a persisted repartitionByRange+spark_partition_id
  * frame actually serve its consumers from cache? Prints the final
  * plan of a rankedCum-shaped query and whether an InMemory/cache scan
  * appears. */
object DevCacheProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Sessions.tuned(
      SparkSession.builder().master("local[4]"), 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val out = if (args.headOption.contains("heaps")) {
      val d = "/root/testdata/sf0.01"
      graft.engine.Warm.stages(spark, d)
      SparkEntry.queries("q_heaps_law")(spark, d)
    } else if (args.headOption.contains("stagedrc")) {
      val d = "/root/testdata/sf0.01"
      graft.engine.Warm.stages(spark, d)
      val perDoc = graft.engine.TextOps.sharedHeapsPerDoc(spark, d)
      graft.engine.Layout.rankedCum(perDoc, Seq(col("doc_id")), col("n_tok"))
    } else if (args.headOption.contains("checks")) {
      val d = "/root/testdata/sf0.01"
      graft.engine.Warm.stages(spark, d)
      val perDoc = graft.engine.TextOps.sharedHeapsPerDoc(spark, d)
      val ranked = graft.engine.Layout
        .rankedCum(perDoc, Seq(col("doc_id")), col("n_tok"))
        .withColumnRenamed("cum", "cum_tok")
      ranked
        .filter(col("r") * 10 % col("n_rows") < lit(10))
        .withColumn("decile", expr("r * 10 DIV n_rows"))
        .groupBy(col("decile"))
        .agg(max(col("doc_id")).as("boundary_doc"),
          max(col("r")).as("n_docs_seen"),
          max(col("cum_tok")).as("cum_tok"))
    } else if (args.headOption.contains("cross")) {
      val d = "/root/testdata/sf0.01"
      graft.engine.Warm.stages(spark, d)
      val perDoc = graft.engine.TextOps.sharedHeapsPerDoc(spark, d)
      val ranked = graft.engine.Layout
        .rankedCum(perDoc, Seq(col("doc_id")), col("n_tok"))
        .withColumnRenamed("cum", "cum_tok")
      val checks = ranked
        .filter(col("r") * 10 % col("n_rows") < lit(10))
        .withColumn("decile", expr("r * 10 DIV n_rows"))
        .groupBy(col("decile"))
        .agg(max(col("doc_id")).as("boundary_doc"),
          max(col("r")).as("n_docs_seen"),
          max(col("cum_tok")).as("cum_tok"))
      val firstOcc = graft.engine.TextOps.sharedDocToks(spark, d)
        .groupBy(col("tok")).agg(min(col("doc_id")).as("first_doc"))
      firstOcc.crossJoin(broadcast(checks))
        .filter(col("first_doc") <= col("boundary_doc"))
        .groupBy(col("decile"), col("n_docs_seen"), col("cum_tok"))
        .agg(count(lit(1)).as("vocab"))
    } else {
      val df = (1L to 100000L).toDF("id").withColumn("v", col("id") % 97)
      graft.engine.Layout.rankedCum(df, Seq(col("id")), col("v"))
    }
    out.queryExecution.executedPlan.execute().count()
    val plan = out.queryExecution.executedPlan.toString
    println("HAS_CACHE_SCAN=" +
      (plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage")))
    println(plan.split("\n").take(40).mkString("\n"))
    spark.stop()
  }
}
