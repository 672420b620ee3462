package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected edge list — the clustering
  * step a dedup pipeline runs on its near-dup pairs to form duplicate
  * groups (one canonical doc per group).
  *
  * Pregel-style iterative min-label propagation: every node starts
  * labeled with its own id; each round every node takes the min of its
  * own and its neighbors' labels; at fixpoint each component carries its
  * minimum node id. Each round is one distributed equi-join + agg — the
  * only driver-side value is the convergence flag (a count), the same
  * control shape GraphX/Pregel use. Rounds needed = component diameter,
  * which for dedup clusters (small, dense groups) is a handful; `maxIter`
  * bounds pathological chains.
  */
object Components {

  /** @param pairs edges as columns (a, b); nodes not present in any pair
    *              are not emitted (singletons are "no duplicates").
    * @param maxIter safety cap on propagation rounds (rounds needed =
    *              component diameter). Hitting the cap before fixpoint
    *              THROWS — partial labels are wrong answers, not results.
    * @return (id, component) — component = min node id reachable. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 100): DataFrame = {
    // both edge directions from ONE pass over pairs (a union of two
    // projections would execute the upstream pair pipeline twice)
    val sym0 = pairs.select(explode(array(
        struct(col("a").as("id"), col("b").as("nb")),
        struct(col("b").as("id"), col("a").as("nb")))).as("e"))
      .select(col("e.id").as("id"), col("e.nb").as("nb"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // The loop's frames are edge-list-sized, far smaller than the session
    // default shuffle width assumes — and persist() blocks AQE's
    // partition coalescing, so every tiny round would otherwise run
    // full-width stages of near-empty tasks. Size the shuffles to the
    // measured edge count (the count also materializes the cache) with
    // EXPLICIT per-frame repartitioning on the join/agg keys: the edge
    // table is hash-clustered on `nb` once, every label frame on `id`,
    // and alias-aware output partitioning lets each round's join and agg
    // reuse them — no exchange at session width, and no toggling of the
    // session-global spark.sql.shuffle.partitions (which would leak into
    // any query running concurrently on the same session).
    val nEdges = sym0.count()
    val parts = math.max(1L, math.min(10000L, nEdges / 100000L + 1)).toInt
    val sym = sym0.repartition(parts, col("nb"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("id")).repartition(parts, col("id")).distinct()
      .withColumn("component", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val nbMin = sym
        .join(labels.select(col("id").as("nb"), col("component").as("nc")), Seq("nb"))
        .select(col("id"), col("nc"))
        .repartition(parts, col("id"))
        .groupBy("id").agg(min(col("nc")).as("nmin"))
      // prev label rides along so the convergence check is a filter on
      // the same materialization — one job per round, not a second join
      val next = labels.join(nbMin, Seq("id"), "left")
        .select(col("id"), col("component").as("prev"),
          least(col("component"), coalesce(col("nmin"), col("component")))
            .as("component"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = next.filter(col("component") =!= col("prev")).count()
      labels.unpersist()
      labels = next.select(col("id"), col("component"))
      i += 1
    }
    sym0.unpersist()
    sym.unpersist()
    if (changed > 0) {
      labels.unpersist()
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          s"(a component's diameter exceeds the cap); partial labels " +
          s"would be silently wrong — raise maxIter")
    }
    labels
  }
}
