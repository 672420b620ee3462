package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Sessions

/** Dev tool: double an embeddings replica corpus OUTSIDE
  * [[ScaleGen]]'s k ≤ 1248 envelope (VERDICT r13 #2 — one more
  * K-doubling past the flat cap needs ~5M vectors; chaining ScaleGen
  * would collide vec_ids, because a second run's +i·DocOff offsets
  * land exactly on the first run's copy ids). The doubled half gets:
  *
  *   - vec_id + 2^40 — far above any ScaleGen id (≤ 1247·10^7) and
  *     far below the long envelope, so ids stay globally unique and
  *     canonEmb's keep-one grouping keeps every row;
  *   - the same rotation∘Rademacher transform family as ScaleGen's
  *     copies, at copy index 1249 — OUTSIDE the first run's 0..1247
  *     index space, so the (rotation, signs) pair is fresh and the
  *     new half decorrelates from every existing copy exactly like
  *     ScaleGen's copies decorrelate from each other.
  *
  * Output is a multi-part `<dst>/embeddings.parquet` DIRECTORY (this
  * corpus feeds Spark-side SemProfile legs only, never the
  * single-file DuckDB harness). Deterministic end to end.
  *
  * Usage: `sbt "runMain graft.EmbDouble <src> <dst>"`. */
object EmbDouble {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: EmbDouble <src> <dst>")
    val (src, dst) = (args(0), args(1))
    val spark = Sessions.tuned(
      SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet(s"$src/embeddings.parquet")
    // refuse to chain onto our own output: a second doubling would add
    // 2^40 to ids that already carry it, landing exactly on existing
    // ids — duplicate vec_ids, which canonEmb's keep-one grouping then
    // SILENTLY halves (the same trap as chaining ScaleGen, made loud)
    val maxId = base.agg(max(col("vec_id"))).head().getLong(0)
    require(maxId < (1L << 40),
      s"EmbDouble input already carries doubled ids (max vec_id=$maxId " +
        ">= 2^40) — chaining would collide; widen with a fresh offset " +
        "scheme instead")
    val i = 1249
    val r = i % 64
    val rot = concat(slice(col("embedding"), r + 1, 64 - r),
      slice(col("embedding"), 1, r))
    val v = zip_with(rot, typedLit(ScaleGen.signsOf(i)), (x, s) => x * s)
    val copy = base
      .withColumn("vec_id", col("vec_id") + lit(1L << 40))
      .withColumn("embedding", v)
    base.unionByName(copy).write.mode("overwrite")
      .parquet(s"$dst/embeddings.parquet")
    val n = spark.read.parquet(s"$dst/embeddings.parquet").count()
    println(s"[embdouble] wrote $dst/embeddings.parquet rows=$n")
    spark.stop()
  }
}
