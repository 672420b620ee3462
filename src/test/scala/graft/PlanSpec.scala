package graft

import org.apache.spark.sql.execution.ExplainMode

/** Plan-level assertions backing SCALE.md's claims: these lock in the
  * physical-plan properties the 100 TB argument rests on, so a future
  * refactor that silently de-optimizes a query (drops a pushdown, turns
  * an equi-join into a cartesian) fails CI, not the cluster. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    Registry.queries(name)(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("formatted"))

  test("q_filter pushes its predicates into the parquet scan") {
    val p = plan("q_filter")
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"))
  }

  test("q_scan_project prunes unread lineitem columns at the scan") {
    val p = plan("q_scan_project")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_comment") && !p.contains("l_shipmode"))
  }

  test("q_join_multi runs the star join with broadcast dims, no cartesian") {
    val p = plan("q_join_multi")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q_window_rank gets partial top-k (WindowGroupLimit) before the shuffle") {
    val p = plan("q_window_rank")
    assert(p.contains("WindowGroupLimit"))
  }

  test("LSH/bucketed pair pipelines never plan a cartesian or nested loop") {
    for (q <- Seq("q_range_join", "q_simhash_near", "q_dedup_ngram",
        "q_sim_lsh", "q_dedup_embed", "q_asof_join",
        "q_lateral_top", "q_exists_sql", "q_minhash_est")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested loop")
    }
  }

  test("centroid assignment never plans the N*K nested-loop join") {
    // assignTo is a per-partition kernel over the collected centroid
    // matrix — the round-11 49x fix (342 s -> 6.9 s at 200k x 8192: a
    // BroadcastNestedLoopJoin materializes N*K rows each carrying the
    // 64-double vector, ~800 GB of row copies). A revert to the
    // declarative argmax would reintroduce exactly that node.
    // q_semdedup_hier must additionally keep its CoGroup (the declared
    // two-level path — the K > 65536 plan shape, oracle-gated).
    assert(plan("q_semdedup_hier").contains("CoGroup"),
      "q_semdedup_hier lost the two-level cogroup")
    for (q <- Seq("q_semdedup", "q_semdedup_hier", "q_sim_ivf",
        "q_kmeans_step")) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q plans the N*K nested-loop assignment again")
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian")
    }
  }

  test("two-level assignment plans a cogroup, never the N*K join or a K-row collect plan") {
    // past FlatAssignMaxK the assignment must be the coarse-keyed
    // cogroup (per-group matrices built executor-side) — not a revert
    // to a BroadcastNestedLoopJoin over all K fine centroids, and not
    // a TakeOrdered global sort for the fine sample (the P·k driver
    // merge the pure-filter selection exists to avoid)
    val vs = graft.engine.Similarity.vectors(spark, sf)
    val p = graft.engine.Similarity.assignCellsHier(vs, 8, 4)
      .queryExecution.executedPlan.toString
    assert(p.contains("CoGroup"), "hier assignment lost its cogroup")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "hier assignment plans the N*K nested loop")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("TakeOrderedAndProject"),
      "fine sample plans a global TakeOrdered (P*k driver merge)")
  }

  test("salts=1 bypass drops the replicating explode; salted plan keeps it") {
    // below HierSaltMinRows the adaptive salt count resolves to 1 and
    // assignCellsHier must plan the bare-cell-key cogroup with NO
    // Generate node — the ~1.2 s of one-time codegen/setup the salted
    // shape cost every r14 bench attempt at gate scale. An explicit
    // salts>1 keeps the replicating explode (the SALT_SKEW shape).
    val vs = graft.engine.Similarity.vectors(spark, sf)
    val bypass = graft.engine.Similarity.assignCellsHier(vs, 8, 4)
      .queryExecution.executedPlan.toString
    assert(!bypass.contains("Generate"),
      "salts=1 bypass still plans the replicating explode")
    val salted = graft.engine.Similarity
      .assignCellsHier(vs, 8, 4, salts = 8)
      .queryExecution.executedPlan.toString
    assert(salted.contains("Generate"),
      "explicit salting lost the fine-replica explode")
  }

  test("q_sim_topk broadcasts the (small) query side by design") {
    // brute-force baseline: query set ≪ corpus, so the nested loop
    // streams the corpus once against a broadcast query table
    assert(plan("q_sim_topk").contains("BroadcastNestedLoopJoin"))
  }

  test("q_domain_cap gets partial per-source top-k before the shuffle") {
    // the cap must be applied map-side (WindowGroupLimit) so the
    // exchange carries O(sources·cap), not the corpus
    assert(plan("q_domain_cap").contains("WindowGroupLimit"))
  }

  test("q_seq_pattern's journey cap prunes map-side before the shuffle") {
    // the SeqPatternMaxEvents rn-filter must plan as WindowGroupLimit:
    // a hot user's event firehose is cut to 256 rows BEFORE the
    // user_id exchange, so the shuffle payload is O(users·cap) — losing
    // this in a refactor would silently move the cap post-shuffle
    assert(plan("q_seq_pattern").contains("WindowGroupLimit"))
  }

  test("q_inverted_index caps posting heads map-side; q_cooccur broadcasts the vocab slice") {
    val inv = plan("q_inverted_index")
    // the rank≤cap filter must push below the shuffle so stopword-like
    // tokens never ship their full posting list
    assert(inv.contains("WindowGroupLimit"), "posting cap not pushed map-side")
    val co = plan("q_cooccur")
    assert(co.contains("BroadcastExchange"), "top-token table not broadcast")
    assert(!co.contains("CartesianProduct"), "q_cooccur plans a cartesian")
  }

  test("q_pq_codes encodes in the kernel (no join); q_knn_label broadcasts") {
    // the encode is a per-partition kernel over the collected 128-row
    // codebook (pqEncode scaladoc) — the plan must have NO join of any
    // kind and NO window; only the final presentation sort shuffles
    val pq = plan("q_pq_codes")
    assert(!pq.contains("Join"), "encode must not join the codebook")
    assert(!pq.contains("Window"), "encode must not rank candidates")
    assert(!pq.contains("CartesianProduct"))
    val knn = plan("q_knn_label")
    assert(knn.contains("BroadcastNestedLoopJoin") ||
      knn.contains("BroadcastExchange"), "query set not broadcast")
  }

  test("ANN rank windows sort narrow rows (no vector arrays in scope)") {
    // the simTopK sort-width discipline: the N·NumQueries candidate
    // rows entering a per-query rank sort must not carry the two
    // 64-double arrays (~1 KB/row in the sort at scale). Catalyst's
    // ColumnPruning delivers this today (verified round 12: the
    // pre-projection plan's WindowExec input was already narrow) — the
    // pin exists so a future edit that references v/qv ABOVE the
    // window cannot silently defeat the pruning
    for (q <- Seq("q_sim_topk", "q_sim_lsh", "q_ann_recall",
        "q_knn_label", "q_hard_negatives")) {
      val exec = Registry.queries(q)(spark, sf).queryExecution.sparkPlan
      val wide = exec.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.child.output.exists(
              _.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
          => w.child.output.filter(
               _.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
             .map(_.name)
      }
      assert(wide.isEmpty,
        s"$q rank window input carries array columns: ${wide.flatten}")
    }
  }

  test("chunk/pack/span/funnel plans have no cartesian or corpus nested loop") {
    for (q <- Seq("q_chunk_docs", "q_pack_seqs", "q_span_dedup",
        "q_filter_funnel", "q_dedup_apply")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested loop")
    }
  }

  test("vocab/top-ngram top-K plans use TakeOrderedAndProject, not a global sort") {
    // per-partition heaps + a K·P driver merge — the property that lets
    // the rank run over a 100 TB corpus's vocabulary without a full sort
    for (q <- Seq("q_vocab_build", "q_top_ngrams", "q_bpe_step")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q lost the top-K plan")
    }
  }

  test("q_dataset_card fuses its COUNT(DISTINCT)s into one Expand pass") {
    val p = plan("q_dataset_card")
    assert(p.contains("Expand"), "distinct aggregates not Expand-fused")
    assert(!p.contains("Join"), "card must be a single-scan aggregate")
  }

  test("q_dq_checks: one fused-Expand battery pass + one broadcast anti-join") {
    val p = plan("q_dq_checks")
    assert(p.contains("Expand"), "distinct metrics not Expand-fused")
    assert(p.contains("LeftAnti"), "FK check must be an anti-join")
    assert(p.contains("BroadcastHashJoin"), "dim side must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_pii_scrub is a pure per-row map (no joins, no aggregates)") {
    val p = plan("q_pii_scrub")
    assert(!p.contains("Join") && !p.contains("HashAggregate"))
  }

  test("q_ngram_novelty joins gram counts by key, never a corpus nested loop") {
    val p = plan("q_ngram_novelty")
    assert(!p.contains("CartesianProduct"))
    // the ONLY nested-loop join allowed is the single 1-row totals
    // broadcast (a Cross): any additional BNLJ — e.g. the gram-count
    // join degrading to a corpus-sized loop — must fail here. Count
    // tree entries ("BNLJ <type> Build<side>"), not the detail section
    // (formatted explain prints each node a second time there).
    val bnlj = "BroadcastNestedLoopJoin [A-Za-z]+ Build".r
      .findAllIn(p).size
    assert(bnlj <= 1, s"$bnlj nested-loop joins planned")
    assert(bnlj == 0 || p.contains("BroadcastNestedLoopJoin Cross"))
  }

  test("q_export_shards is map + shard-keyed agg; q_int8_quant broadcasts dims") {
    val ex = plan("q_export_shards")
    assert(!ex.contains("Join"), "shard stats must not join")
    val q8 = plan("q_int8_quant")
    assert(q8.contains("BroadcastExchange"), "64-row range table not broadcast")
    assert(!q8.contains("CartesianProduct"))
    // the range table comes from the staged dim_stats table: the encode
    // pass must be the query's ONLY corpus posexplode (the old shape
    // re-derived ranges from a second explode = 2× the scan at 100 TB)
    val explodes = "posexplode".r.findAllIn(
      Registry.queries("q_int8_quant")(spark, sf).queryExecution
        .optimizedPlan.toString).size
    assert(explodes == 1, s"q_int8_quant plans $explodes posexplodes")
  }

  test("per-row runStats folds are evaluated once per row (no CollapseProject blowup)") {
    // the builder's documented pitfall: a single-reference non-cheap
    // fold gets inlined into its consumer, and a when-chain consumer
    // then pastes the fold once per branch into the merged Project.
    // Lock the optimized plan to exactly one array_sort per declared
    // fold (qualityFlags has 1; repetitionStats has 2: unigram+bigram).
    def folds(name: String): Int =
      "array_sort".r.findAllIn(
        Registry.queries(name)(spark, sf).queryExecution
          .optimizedPlan.toString).size
    assert(folds("q_quality_sample") == 1,
      s"q_quality_sample evaluates the fold ${folds("q_quality_sample")}×")
    assert(folds("q_repetition") == 2,
      s"q_repetition evaluates its two folds ${folds("q_repetition")}×")
    assert(folds("q_filter_funnel") <= 2,
      s"q_filter_funnel evaluates its folds ${folds("q_filter_funnel")}×")
  }

  test("round-4 analytics ops keep their scale-safe plan shapes") {
    // hard negatives: fixed 16-row query side broadcast, corpus
    // streamed once (the q_sim_topk discipline)
    val hn = plan("q_hard_negatives")
    assert(hn.contains("BroadcastNestedLoopJoin") ||
      hn.contains("BroadcastExchange"), "query side not broadcast")
    // sim histogram: bucketed equi self-join — never all-pairs
    val sh = plan("q_sim_hist")
    assert(!sh.contains("CartesianProduct") &&
      !sh.contains("BroadcastNestedLoopJoin"), "q_sim_hist lost the bucket join")
    // gap fill: grid join stays an equi-join on (user_id, day)
    val gf = plan("q_gap_fill")
    assert(!gf.contains("CartesianProduct") &&
      !gf.contains("BroadcastNestedLoopJoin"), "q_gap_fill lost the equi-join")
    // journey + A/B: single user-keyed aggregation paths, no joins
    assert(!plan("q_seq_pattern").contains("Join"), "q_seq_pattern joins")
    assert(!plan("q_ab_test").contains("Join"), "q_ab_test joins")
    // quantile bins: the ntile window partitions by source, never global
    val qb = plan("q_quantile_bins")
    assert(qb.contains("hashpartitioning(source"),
      "q_quantile_bins window lost its source partitioning")
  }

  test("q_dedup_incr reads the staged corpus index; batch side only is fresh") {
    // the incremental filter's whole point: the corpus contributes its
    // materialized signature + shingle-set parquet, never a recompute,
    // and the candidate join stays (band, sig) equi-join shaped
    val p = plan("q_dedup_incr")
    assert(p.contains("minhash_sig-"), "corpus signature stage not read")
    assert(p.contains("shingle_sets-"), "corpus shingle stage not read")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "q_dedup_incr plans a pairwise compare")
  }

  test("sketch queries read the shingle stage, not the raw corpus") {
    // r7: q_bloom_join and q_distinct_sketch used to re-tokenize and
    // re-explode the corpus 3-grams each; both now explode the stored
    // (s, hx) arrays off the shared shingle_sets stage — one corpus
    // explode per corpus, zero md5 re-hashing
    for (q <- Seq("q_bloom_join", "q_distinct_sketch")) {
      val p = plan(q)
      assert(p.contains("shingle_sets-"), s"$q does not read the shingle stage")
      assert(!p.contains("corpus-"), s"$q still re-scans the corpus stage")
    }
  }

  test("q_dedup_ngram reads the materialized pair stage with pushed filter") {
    // the threshold filter must reach the stage's parquet scan — the
    // shared-stage rework keeps the query a pushed-filter file read, not
    // a recomputation of the shingle pipeline
    val p = plan("q_dedup_ngram")
    assert(p.contains("cand_pairs-"), "pair-stage checkpoint not read")
    assert(p.contains("GreaterThanOrEqual(jacc,0.8)"), "jacc filter not pushed")
  }

  test("trade analytics: broadcast dims, pushed filters, top-k heads") {
    // Q7: both nation legs broadcast; date filter reaches the fact scan
    val tm = plan("q_trade_matrix")
    assert(tm.contains("BroadcastHashJoin"), "q_trade_matrix dims not broadcast")
    assert(!tm.contains("CartesianProduct"))
    assert(tm.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      "q_trade_matrix ship-date filter not pushed")
    // Q10: the returnflag filter must reach the scan; top-20 is a
    // TakeOrderedAndProject, never a global sort
    val rr = plan("q_returned_rev")
    assert(rr.contains("EqualTo(l_returnflag,R)"),
      "q_returned_rev flag filter not pushed")
    assert(rr.contains("TakeOrderedAndProject"),
      "q_returned_rev top-20 is not a partial top-k")
    // Q8/Q14: one fact scan each; flag sides broadcast
    for (q <- Seq("q_mkt_share", "q_promo_share")) {
      val p = plan(q)
      assert(p.contains("BroadcastExchange"), s"$q lost its broadcast side")
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian")
    }
    // Q11 (r6 shape): the per-part reduction is a content-keyed stage —
    // the query plan must read the STAGE parquet, never re-scan the
    // lineitem fact table, and take the grand total as a broadcast
    // one-row aggregate (the old partition-less window funneled every
    // per-part row through one partition; GlobalWindowSpec rejects it)
    val pv = plan("q_part_value_conc")
    assert(!pv.contains("CartesianProduct"), "q_part_value_conc cartesian")
    assert("lineitem\\.parquet".r.findAllIn(pv).isEmpty,
      "q_part_value_conc must read its stage, not re-scan lineitem")
    assert(pv.contains("pvc_per-"), "per-part stage not read")
    assert(pv.contains("BroadcastExchange"), "grand total not broadcast")
    // supplier leaderboard: rank≤3 prunes map-side
    assert(plan("q_supp_rank").contains("WindowGroupLimit"),
      "q_supp_rank rank cap not pushed map-side")
    // basket rules: the C(k,2) pair head is read from its stage (built
    // once, shared with q_basket_pairs) and the support lookups
    // broadcast onto the 40-row head
    val br = plan("q_basket_rules")
    assert(br.contains("basket_head-"),
      "q_basket_rules does not read the shared pair stage")
    assert(br.contains("BroadcastHashJoin"),
      "q_basket_rules supports not broadcast")
    assert(plan("q_basket_pairs").contains("basket_head-"),
      "q_basket_pairs does not read the shared pair stage")
  }

  test("TPC-H completion: pushed filters, broadcasts, no cartesians") {
    // Q6: every predicate reaches the scan
    val q6 = plan("q_discount_rev")
    assert(q6.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      "q_discount_rev predicates not pushed")
    // Q5/Q22: broadcast sides present, no cartesian anywhere
    for (q <- Seq("q_local_supp", "q_idle_rich", "q_cust_order_dist",
        "q_small_qty", "q_large_orders")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian")
    }
    assert(plan("q_local_supp").contains("BroadcastHashJoin"),
      "q_local_supp nation maps not broadcast")
    // Q18: top-20 is a partial top-k, never a global sort
    assert(plan("q_large_orders").contains("TakeOrderedAndProject"),
      "q_large_orders top-20 is not a partial top-k")
  }

  test("rankedCum consumers plan no data-sized unpartitioned window") {
    // q_cum_share and q_heaps_law rank O(customers)/O(docs) rows; the
    // r6 rewrite moved both onto Layout.rankedCum (range partition +
    // per-partition windows + broadcast offset join). Every WindowExec
    // left in their plans must carry a partition spec — an empty spec
    // is the single-partition global sort the rewrite removed.
    for (q <- Seq("q_cum_share", "q_heaps_law")) {
      val exec = Registry.queries(q)(spark, sf).queryExecution.sparkPlan
      val bare = exec.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
      }
      assert(bare.isEmpty, s"$q still plans ${bare.size} global window(s)")
    }
  }
}
