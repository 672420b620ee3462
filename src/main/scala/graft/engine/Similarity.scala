package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the 64-dim `embeddings` table: brute-force
  * cosine top-k as the correctness baseline and a sign-LSH bucketed
  * variant as the scale path (SURVEY.md §2D).
  *
  * Scale notes: the brute-force path broadcasts the (small) query set —
  * a BroadcastNestedLoopJoin that streams the big side once, no shuffle
  * of the corpus. The LSH path reduces candidates per query from N to
  * N/2^bits via an equi-join on the bucket id; at 100 TB you'd raise the
  * bit count and add multi-probe, but the plan shape is already the
  * scalable one. All vector math uses codegen'd higher-order functions
  * (`zip_with`/`aggregate`) — no UDF, stays inside whole-stage codegen.
  */
object Similarity {

  /** Dot product over two double arrays: native codegen'd expression
    * ([[graft.functions.DotProduct]]) — one fused loop, no intermediate
    * array, same left-to-right summation as the `zip_with`+`aggregate`
    * fold it replaces (bit-identical results). */
  def dot(a: Column, b: Column): Column = graft.functions.DotProduct.dot(a, b)

  /** The composable-HOF formulation, kept for cross-checking the native
    * expression in tests. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** embeddings as (vec_id, v: array<double>, nm) — floats widened to
    * double *before* any multiply so products are double-exact. */
  def vectors(s: SparkSession, d: String): DataFrame =
    Sources.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nm", l2norm(col("v")))

  /** Deterministic sign-LSH projection weights: 8 pseudo-random integer
    * vectors derived from a fixed LCG (portable across engines). */
  def lshWeight(j: Int, i: Int): Long =
    ((1103515245L * (j * 64 + i) + 12345L) % 2048L) - 1024L

  val LshBits = 8

  /** 8-bit sign-LSH bucket id of a double-array embedding. */
  def lshBucket(v: Column): Column =
    (0 until LshBits).map { j =>
      val w = array((0 until 64).map(i => lit(lshWeight(j, i).toDouble)): _*)
      when(dot(v, w) >= 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  private def queriesEvery(vs: DataFrame, every: Int): DataFrame =
    vs.filter(col("vec_id") % every === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nm").as("qnm"))

  /** Brute-force cosine top-k: every `every`-th vector queries the corpus. */
  def simTopK(s: SparkSession, d: String, every: Int = 50, k: Int = 5): DataFrame = {
    val vs = vectors(s, d)
    val q = queriesEvery(vs, every)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    vs.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qnm") * col("nm")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("vec_id"), col("rk"), round(col("cos"), 4).as("cos4"))
      .orderBy("q_id", "rk", "vec_id")
  }

  /** LSH-bucketed ANN top-k: candidates restricted to the query's bucket. */
  def simLsh(s: SparkSession, d: String, every: Int = 50, k: Int = 3): DataFrame = {
    val vs = vectors(s, d).withColumn("bkt", lshBucket(col("v")))
    val q = vs.filter(col("vec_id") % every === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nm").as("qnm"), col("bkt"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    vs.join(broadcast(q), Seq("bkt"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qnm") * col("nm")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("vec_id"), col("bkt"), col("rk"),
        round(col("cos"), 4).as("cos4"))
      .orderBy("q_id", "rk", "vec_id")
  }

  /** IVF-style ANN: a small deterministic centroid set (every
    * `centroidEvery`-th vector) is broadcast; one pass assigns each
    * vector to its nearest centroid (max cosine, min-centroid-id
    * tie-break); queries then search only their own cell. At 100 TB the
    * centroid table stays broadcast-sized and the assignment is a single
    * scan — the classic coarse-quantization shape (probe more cells by
    * relaxing the rank-1 filter). */
  def simIvf(s: SparkSession, d: String, centroidEvery: Int = 50,
      queryEvery: Int = 50, k: Int = 3): DataFrame = {
    val vs = vectors(s, d)
    val cents = vs.filter(col("vec_id") % centroidEvery === 1)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nm").as("cnm"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_cos").desc, col("c_id"))
    // persisted: both the query side and the corpus side of the cell
    // join derive from it — without the persist each branch re-runs the
    // N×C assignment pass (at cluster scale this is the checkpoint of
    // the assignment table, SCALE.md "what we would change first")
    val assigned = vs.join(broadcast(cents), lit(true))
      .withColumn("c_cos", dot(col("v"), col("cv")) / (col("nm") * col("cnm")))
      .withColumn("c_rk", row_number().over(wAssign))
      .filter(col("c_rk") === 1)
      .select(col("vec_id"), col("v"), col("nm"), col("c_id").as("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = assigned.filter(col("vec_id") % queryEvery === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nm").as("qnm"), col("cell"))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    assigned.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qnm") * col("nm")))
      .withColumn("rk", row_number().over(wTop).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("vec_id"), col("cell"), col("rk"),
        round(col("cos"), 4).as("cos4"))
      .orderBy("q_id", "rk", "vec_id")
  }

  /** Embedding near-dup pairs, LSH-blocked (never O(n²)): same-bucket
    * pairs (a < b) whose cosine clears the threshold. */
  def dedupEmbed(s: SparkSession, d: String, threshold: Double = 0.4): DataFrame = {
    val vs = vectors(s, d).withColumn("bkt", lshBucket(col("v")))
    val x = vs.select(col("bkt"), col("vec_id").as("a"),
      col("v").as("va"), col("nm").as("na"))
    val y = vs.select(col("bkt"), col("vec_id").as("b"),
      col("v").as("vb"), col("nm").as("nb"))
    x.join(y, Seq("bkt"))
      .filter(col("a") < col("b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), col("bkt"), round(col("cos"), 4).as("cos4"))
      .orderBy("a", "b")
  }
}
