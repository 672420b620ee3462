package graft

/** Repo-wide guard for the project's no-data-sized-serial-stage rule:
  * a WindowExec with an EMPTY partition spec funnels its whole input
  * through one partition — acceptable only when the input is bounded
  * by construction (a limit(), a domain-sized aggregate, a
  * partition-count frame), never when it is data-sized. The allowlist
  * below names every query that is permitted such a window, with the
  * bound that justifies it; any NEW query planning one (or a refactor
  * that silently de-partitions an old one) fails here, not on the
  * cluster. q_cum_share and q_heaps_law were removed from this list in
  * r6 (Layout.rankedCum). */
class GlobalWindowSpec extends SparkSpec {

  // query -> the construction that bounds the window's input
  private val Bounded: Map[String, String] = Map(
    "q_vocab_build" -> "vocab head limit()-bounded before the rank",
    "q_top_ngrams" -> "top-50 head limit()-bounded",
    "q_tok_zipf" -> "top-100 frequency head",
    "q_bpe_step" -> "Zipf-capped candidate merges (limit-bounded)",
    "q_rolling_7d" -> "day-grain frame (calendar-bounded)",
    "q_ks_drift" -> "value-domain-grain CDF frame",
    // q_pq_codes: none — the codebook window runs at declare-time
    // inside pqEncode's bounded collect, outside the query plan
    "q_pq_search" -> "codebook limit()-bounded before its window",
  )

  test("only allowlisted queries plan an unpartitioned WindowExec") {
    val offenders = scala.collection.mutable.Map[String, Int]()
    val cartesians = scala.collection.mutable.ListBuffer[String]()
    for ((name, fn) <- Registry.queries) {
      val exec = fn(spark, sf).queryExecution.sparkPlan
      val bare = exec.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
      }
      if (bare.nonEmpty) offenders(name) = bare.size
      // a non-broadcast cartesian product (both sides shuffled to every
      // pairing) is never acceptable at scale, in ANY query — broadcast
      // nested-loop joins of deliberately tiny sides are a different
      // node (BroadcastNestedLoopJoinExec) and are covered per-query in
      // PlanSpec
      if (exec.collect {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      }.nonEmpty) cartesians += name
    }
    assert(cartesians.isEmpty,
      s"CartesianProduct planned in: ${cartesians.sorted.mkString(", ")}")
    val unexpected = offenders.keySet -- Bounded.keySet
    assert(unexpected.isEmpty,
      s"data-sized global window risk in: ${unexpected.toSeq.sorted
        .map(q => s"$q(${offenders(q)})").mkString(", ")} — " +
        "partition it or justify the bound in the allowlist")
    // the allowlist must not go stale either: entries that no longer
    // plan a global window should be removed (they may have been fixed)
    val stale = Bounded.keySet -- offenders.keySet
    assert(stale.isEmpty,
      s"allowlist entries no longer planning a global window: " +
        s"${stale.toSeq.sorted.mkString(", ")} — remove them")
  }
}
