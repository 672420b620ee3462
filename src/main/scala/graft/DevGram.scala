package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.TextOps
import graft.engine.PortableHash.h28

/** Dev experiment: compare doc-gram stage-build formulations. */
object DevGram {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.engine.Sessions.tuned(
      SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")

    def time(label: String)(df: => DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = df.groupBy().count().collect()(0).getLong(0)
        println(f"GRAM $label rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s n=$n")
      }
    }

    // current shape: interpreted zip_with concat, then hash after explode
    time("current")(TextOps.docGramCounts(docs))

    // candidate: arrays_zip + explode, concat/hash post-explode (codegen)
    time("zipstruct") {
      val toks = split(col("text"), " ")
      val m = greatest(size(col("t")) - 1, lit(0))
      docs.select(col("doc_id"), toks.as("t"))
        .select(col("doc_id"),
          explode(arrays_zip(slice(col("t"), lit(1), m),
            slice(col("t"), lit(2), m)))
            .as("p"))
        .groupBy(col("doc_id"),
          h28(concat(col("p.0"), lit(" "), col("p.1"))).as("bgh"))
        .agg(count(lit(1)).as("lc"))
    }
    spark.stop()
  }
}
