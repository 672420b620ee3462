package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{Sessions, Similarity}

/** Stage-cost profiler for q_pq_search at replica scale — the
  * [[LshProfile]] treatment for the PQ/ADC path: decomposes the query
  * into codebook selection, nearest-codeword ENCODE (the N·8-subvector
  * pass whose rank-1 window is the only N-proportional sort in the
  * family), the per-query LUT build (2 048 rows, broadcast), the
  * LUT-join + (q_id, vec_id) distance rollup, and the full query — so
  * a >k wall-time ratio (13.26× for 400× data in SCALE_EMB400.json,
  * rows flat at 80) can be attributed to a stage rather than guessed
  * at.
  *
  * Usage: `sbt "runMain graft.PqProfile <sfDir>"`. */
object PqProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: PqProfile <sfDir>")
    val d = args(0)
    val spark = Sessions.tuned(
      SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime()-t0)/1e9}%7.1f s"); r
    }
    val n = t("warm: canon_emb")(Similarity.canonEmb(spark, d).count())
    val vs = Similarity.vectors(spark, d)
    val codebook = Similarity.pqCodebookOf(vs)
    val nCb = t("codebook (select+explode)")(codebook.count())
    // the encode pass: N·8 subvectors × 16 codewords → rank-1 window
    val nCodes = t("encode (join+rank1)")(
      Similarity.pqEncode(vs, codebook).count())
    val nLut = t("lut (2048 rows)")(
      Similarity.pqLutOf(vs, codebook).count())
    // join+rollup in isolation: re-encode feeds it (no cache, so this
    // leg's time INCLUDES one encode — report the difference)
    val nAgg = t("encode+join+agg (rollup)") {
      val codes = Similarity.pqEncode(vs, codebook)
        .select(col("vec_id"), col("sub"), col("code"))
        .repartition(col("vec_id"))
      codes.join(broadcast(Similarity.pqLutOf(vs, codebook)),
          Seq("sub", "code"))
        .filter(col("vec_id") =!= col("q_id"))
        .groupBy(col("q_id"), col("vec_id"))
        .agg(sum(col("pd6")).as("adist6"))
        .count()
    }
    val full = t("q_pq_search full")(
      SparkEntry.queries("q_pq_search")(spark, d).count())
    println(s"[prof] n=$n codebook=$nCb codes=$nCodes lut=$nLut " +
      s"agg_groups=$nAgg rows=$full")
    spark.stop()
  }
}
