package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.{Sessions, TextOps}

/** Stage-cost profiler for q_lsh_pr at replica scale — decomposes the
  * query into the shared-stage warm, the capped ground-truth join's
  * input volume (Σ df², the quantity [[graft.engine.TextOps]]'s df cap
  * bounds at cap·Σdf), the distinct ground-truth pair count, and the
  * full query, so a >k wall-time ratio can be attributed to a stage
  * rather than guessed at. Round-11 finding (50k → 500k docs): Σdf²
  * 10.08×, gt pairs 10.1× — exactly row-linear — with the join+agg
  * wall 12.7×; the residue is single-box spill on the 114M-group hash
  * aggregate, not a super-linear stage (SCALE.md "sf10-docs").
  *
  * Usage: `sbt "runMain graft.LshProfile <sfDir>"`. */
object LshProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: LshProfile <sfDir>")
    val d = args(0)
    val spark = Sessions.tuned(
      SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime()-t0)/1e9}%7.1f s"); r
    }
    // stage warm (charged separately, like the sweep)
    t("warm: doc stages") {
      TextOps.corpus(spark, d); TextOps.sharedDocToks(spark, d)
      TextOps.sharedShingleSets(spark, d); TextOps.sharedSignature(spark, d)
      TextOps.sharedCandPairs(spark, d); TextOps.sharedCappedPosts(spark, d)
    }
    val posts = TextOps.sharedCappedPosts(spark, d)
    val nPosts = t("posts count")(posts.count())
    // ground-truth join volume: sum df^2 over kept shingles
    val vol = t("sum df^2 (gt join volume)") {
      posts.groupBy("h").count()
        .agg(sum(expr("count*count"))).head().getLong(0)
    }
    val gt = t("gt pairs (self-join+agg)") {
      posts.alias("x").join(posts.alias("y"),
          col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id"), col("y.doc_id")).count().count()
    }
    val full = t("q_lsh_pr full")(SparkEntry.queries("q_lsh_pr")(spark, d).count())
    println(s"[prof] posts=$nPosts df2=$vol gt_pairs=$gt rows=$full")
    spark.stop()
  }
}
