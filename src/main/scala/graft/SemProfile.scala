package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{Sessions, Similarity}

/** Stage-cost profiler for q_semdedup at replica scale — the
  * [[PqProfile]] treatment for the cluster-bucketed semantic-dedup
  * path (VERDICT r12 #2: the 370.6 s leg was 91% of SCALE_EMB1248's
  * wall with its stage split ASSERTED, not measured). Decomposes the
  * operator into:
  *
  *   1. `assign` — the nearest-centroid assignment pass alone
  *      (persisted + counted): the N·K kernel below
  *      [[Similarity.FlatAssignMaxK]], the two-level coarse→fine
  *      cogroup above it;
  *   2. `pair_join` — the within-cell self-join + a<b + cosine ≥
  *      threshold, off the PERSISTED assignment (so the join is timed
  *      without re-running the assignment on both sides);
  *   3. `agg` — pair join + the keep-id/count/max-cos rollup (the
  *      full remainder, off the same persisted assignment);
  *   4. `full` — the uncapped [[Similarity.semDedup]] exactly as
  *      SpineSweep times it (no pre-persisted input: includes one
  *      assignment + the internal persist + pairs + agg).
  *
  * An explicit K argument overrides [[Similarity.semDedupCells]] so
  * the OLD capped behavior is reproducible post-fix: at the 2.496M
  * corpus `SemProfile <dir> 65536` times the flat-kernel shape the
  * r12 leg ran (occupancy 38), `SemProfile <dir>` the adaptive K
  * (131072 → two-level path, occupancy ~19).
  *
  * Usage: `sbt "runMain graft.SemProfile <sfDir> [k]"`. */
object SemProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: SemProfile <sfDir> [k]")
    val d = args(0)
    val spark = Sessions.tuned(
      SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime()-t0)/1e9}%7.1f s"); r
    }
    val n = t("warm: canon_emb")(Similarity.canonEmb(spark, d).count())
    val k = if (args.length > 1) args(1).toInt else Similarity.semDedupCells(n)
    println(s"[prof] n=$n K=$k mode=" +
      (if (k <= Similarity.FlatAssignMaxK) "flat-kernel" else "two-level") +
      s" expected-occupancy=${if (k == 0) 0 else n / k}")
    val vs = Similarity.vectors(spark, d)
    val assigned = Similarity.assignCells(vs, k, nKnown = n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nAssigned = t("assign (persist+count)")(assigned.count())
    // the REAL operator stages (private[graft] accessors), so the
    // profiler cannot drift from what q_semdedup executes
    def pairs = Similarity.semDedupCand(assigned, Similarity.SemDedupCos)
    val nPairs = t("pair_join (cached assign)")(pairs.count())
    val nAgg = t("agg (cached assign)")(
      Similarity.semDedupRollup(pairs).count())
    assigned.unpersist(blocking = true)
    val nFull = t("q_semdedup full (uncached)")(
      // the exact semDedupOf pipeline SpineSweep times (internal
      // persist included), with the explicit K honored for A/B runs
      Similarity.semDedupOf(vs, n, Similarity.SemDedupCos,
        kOverride = k).count())
    println(s"[prof] n=$n assigned=$nAssigned pairs=$nPairs " +
      s"groups=$nAgg full_rows=$nFull")
    spark.stop()
  }
}
