package graft

import org.apache.spark.sql.SparkSession

import graft.engine.{Sessions, Stages, Warm}

/** Operational entry point for stage-root garbage collection
  * ([[graft.engine.Stages.reapUnreferenced]]).
  *
  * Warms every declared stage for each SERVED input dir — resolving
  * the live unit set the same way the queries do — then reaps
  * everything else under the root that is older than the age horizon,
  * including pointerless orphan attempt directories.
  *
  * Usage:
  * {{{
  * sbt "runMain graft.StageGc --dry-run /root/testdata/sf0.1"
  * sbt "runMain graft.StageGc --min-age-days 14 sfDir1 sfDir2"
  * }}}
  *
  * Flags: `--dry-run` lists what WOULD be reaped without deleting;
  * `--root <path>` overrides the stage root (default: the library's
  * own resolved root, [[graft.engine.Stages.defaultRoot]] — override
  * with `-Dgraft.stages.dir` exactly as the library does);
  * `--min-age-days <n>` sets the age horizon (default 7). Positional
  * args are the input dirs currently being served.
  *
  * Cron example for a persistent cluster root (weekly, keep 14 days):
  * {{{
  * 0 3 * * 0  spark-submit --class graft.StageGc graft.jar \
  *   --root s3://bucket/graft-stages --min-age-days 14 \
  *   s3://bucket/corpus/v7
  * }}}
  * Every input dir a production driver still queries MUST be listed:
  * the live set is exactly what warming those dirs resolves, and an
  * unlisted-but-served dir's stages look unreferenced once past the
  * horizon. The age gate is the backstop — size it to dwarf any
  * running job's lifetime.
  */
object StageGc {
  def main(args: Array[String]): Unit = {
    var dryRun = false
    var minAgeDays = 7
    var rootOverride: Option[String] = None
    val dirs = Seq.newBuilder[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--dry-run" => dryRun = true
        case "--min-age-days" => minAgeDays = args(i + 1).toInt; i += 1
        case "--root" => rootOverride = Some(args(i + 1)); i += 1
        case d => dirs += d
      }
      i += 1
    }
    val served = dirs.result()
    val spark = Sessions.tuned(
      SparkSession.builder().master(
        sys.props.getOrElse("spark.master", "local[4]")), 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    served.foreach(Warm.stages(spark, _))
    val live = Stages.liveStageUnits
    val root = rootOverride.getOrElse(Stages.defaultRoot)
    println(s"[stage-gc] root=$root servedDirs=${served.size} " +
      s"liveUnits=${live.size} minAgeDays=$minAgeDays dryRun=$dryRun")
    val reaped = Stages.reapUnreferenced(spark, root, live, minAgeDays,
      dryRun = dryRun)
    val verb = if (dryRun) "would reap" else "reaped"
    println(s"[stage-gc] $verb ${reaped.size} unit(s)")
    reaped.foreach(u => println(s"[stage-gc]   $u"))
    spark.stop()
  }
}
