package graft

import graft.engine.{Stages, Warm}

/** Completeness guard for [[graft.engine.Warm.stages]]: every
  * [[graft.engine.Stages]]-materialized stage any declared query
  * consumes must be pre-built by the warm pass, or the bench charges
  * that stage's build to whichever query consumes it first instead of
  * to the disclosed `stages_sec` field. Diffing the JVM's resolved
  * stage-name set across "warm, then construct every plan" makes
  * adding an unlisted stage accessor fail here — in `sbt test` — not
  * two rounds later as a mystery bench spike. */
class WarmSpec extends SparkSpec {

  test("Warm.stages pre-builds every stage the declared queries consume") {
    // fresh memo: earlier suites in this JVM may already have resolved
    // stages the warm pass misses, which would mask the gap (reset is
    // safe — stage paths are content-keyed and the files persist, so
    // re-resolution is a pointer read)
    Stages.reset()
    Warm.stages(spark, sf)
    val afterWarm = Stages.resolvedStageNames
    // plan CONSTRUCTION is what triggers Stages.materialize — no
    // actions needed; any stage name appearing only now is unwarmed
    for ((_, fn) <- Registry.queries) fn(spark, sf)
    val missing = Stages.resolvedStageNames -- afterWarm
    assert(missing.isEmpty,
      s"stages consumed by declared queries but absent from Warm.stages: " +
        s"${missing.toSeq.sorted.mkString(", ")} — add the accessor to " +
        "Warm.stages so its build cost lands in stages_sec, not on the " +
        "first consuming query")
  }
}
