package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Sources, TextOps}

/** Dev tool: measured scaling evidence for SCALE.md — runs the minhash
  * dedup pipeline on 1×/2×/4× copies of the documents table (doc_ids
  * offset so copies are distinct) and prints wall time per scale. Near-
  * dup pairs stay per-copy (offsets keep the planted dups within one
  * copy), so candidate counts should scale ~linearly, and so should
  * runtime. Usage: sbt "runMain graft.ScaleProbe [sfDir]". */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = Sources.documents(spark, dir).select("doc_id", "text")
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    // per-copy Caesar shift keeps each copy's internal near-dup structure
    // (translate is injective) while making copies textually disjoint —
    // dup DENSITY stays constant as the corpus grows, the honest setting
    def copies(k: Int): DataFrame =
      (0 until k).map { i =>
        val shifted = alpha.drop(i % 26) + alpha.take(i % 26)
        base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          translate(col("text"), alpha, shifted).as("text"))
      }.reduce(_ unionByName _)

    // warm up the whole pipeline once so codegen/JIT doesn't skew ratios
    TextOps.jaccardPairs(copies(1), 0.8).count()

    Seq(1, 2, 4).foreach { k =>
      val t0 = System.nanoTime()
      val pairs = TextOps.jaccardPairs(copies(k), 0.8).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"SCALEPROBE k=$k docs=${5000 * k} pairs=$pairs ${secs}%.2f s")
    }
    spark.stop()
  }
}
