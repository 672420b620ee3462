package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.PortableHash.{h28, minhashJ}
import graft.engine.TextOps.{tokens, zipGrams2, gram2}

/** Fixed-size summary structures — the sketch family a 100 TB corpus
  * pipeline leans on when exact answers would shuffle the world.
  *
  * Three operators, each with the same design point: the state that
  * crosses the shuffle (or reaches the driver) is CONSTANT-SIZED no
  * matter how large the corpus grows, and the estimate's error is a
  * function of that constant, not of N.
  *
  *  - [[distinctSketch]]: linear-counting distinct estimate — the
  *    shuffle carries at most [[LcBuckets]] (source, bucket) pairs per
  *    source instead of every distinct shingle.
  *  - [[cmsTopk]]: count-min frequency estimates — a depth×width
  *    counter grid built in one map-side-combined pass; point queries
  *    read the grid with a broadcast join.
  *  - [[bloomJoin]]: bloom-filter join prefilter — the build side
  *    collapses to a [[BloomBits]]-bit bitmap literal folded into the
  *    probe-side scan, the same shape as Spark's own injected runtime
  *    bloom filters (`spark.sql.optimizer.runtime.bloomFilter.enabled`),
  *    made explicit and cross-engine-checkable.
  *
  * All three are built on the portable [[PortableHash.h28]] family so
  * the DuckDB oracle computes bit-identical buckets; production callers
  * swap in [[PortableHash.fast28]] per the established hash-family
  * convention (SCALE.md).
  */
object Sketches {

  /** Linear-counting bucket count m (Whang et al. 1990). Per-source
    * distinct shingles run ~1.4k at test SF, so f/m ≈ 0.3 — the sweet
    * spot where n̂ = −m·ln(1 − f/m) stays within a few percent. */
  val LcBuckets = 4096L

  /** CMS grid: 3 rows × 256 buckets. Width is deliberately SMALLER than
    * the bigram vocabulary (~1k) so collisions are real and the min-over-
    * depth correction is exercised, not vacuous. */
  val CmsDepth = 3
  val CmsWidth = 256L
  val CmsTop = 20

  /** 16384 bits / k=3 over a ~1.4k-key build side: load ≈ 0.25 bits per
    * slot, fp ≈ (1−e^−0.25)³ ≈ 1% — a realistic operating point. */
  val BloomBits = 16384L
  val BloomK = 3
  val BloomBuildSource = "src0"

  /** The staged shingle table exploded to `(source, sh, h)` — one row
    * per shingle OCCURRENCE, hashes read from the stored `hx` array so
    * neither sketch query re-tokenizes the corpus or re-runs md5 (the
    * corpus is exploded once per corpus, at stage build). */
  private def stagedShingles(s: SparkSession, d: String): DataFrame =
    // spreadSmall before the explode: the shingle explode + distinct
    // partial aggregation otherwise run inside the stage scan's single
    // byte-sized split at sub-cluster SFs (measured 4.5 s steady at the
    // 10× SF on one core). Size-gated no-op at cluster scale.
    Layout.spreadSmall(TextOps.sharedShingleSets(s, d), Seq(col("doc_id")))
      .select(col("source"),
        explode(arrays_zip(col("s"), col("hx"))).as("z"))
      .select(col("source"), col("z").getField("s").as("sh"),
        col("z").getField("hx").as("h"))

  /** Per-source distinct-shingle estimate by linear counting: bucket
    * each 3-token shingle's stored hash into m buckets, count occupied
    * buckets f, estimate n̂ = −m·ln(1 − f/m).
    *
    * Saturation (caught by the r9 10× sweep): once a source's distinct
    * count pushes EVERY bucket occupied, the estimator's ln(0) is
    * undefined — Spark's log returned NULL while DuckDB's ln threw, a
    * cross-engine crash divergence. A saturated sketch now reports est
    * NULL explicitly in both engines (the honest answer: the estimate
    * is unbounded-below-by-data; a deployment sizing m for its corpus
    * reads NULL as "raise [[LcBuckets]]").
    *
    * The `exact` column (a real COUNT(DISTINCT shingle)) is the
    * verification column for the oracle gate; a production pipeline
    * drops it — the sketch path's shuffle then carries at most m
    * (source, bucket) pairs per source where the exact path carries
    * every distinct shingle string. */
  def distinctSketch(s: SparkSession, d: String): DataFrame = {
    val m = LcBuckets
    stagedShingles(s, d)
      .withColumn("b", col("h") % lit(m))
      .groupBy(col("source"))
      .agg(countDistinct(col("b")).as("filled"),
        countDistinct(col("sh")).as("exact"))
      .withColumn("est",
        when(col("filled") >= m, lit(null).cast("long"))
          .otherwise(floor(lit(-m.toDouble) *
            log(lit(1.0) - col("filled").cast("double") / lit(m.toDouble)))))
      .orderBy("source", "filled", "exact", "est")
  }

  private def cmsBucket(h: Column, j: Int): Column =
    minhashJ(h, j) % lit(CmsWidth)

  /** Count-min sketch (Cormode & Muthukrishnan 2005) frequency
    * estimates for the exact top-[[CmsTop]] token bigrams: the counter
    * grid is depth×width = 768 rows regardless of corpus size (the
    * groupBy map-side-combines into at most that many partial rows per
    * task), and each point query takes min over depth of its buckets.
    * Estimates only ever overcount (`over` ≥ 0, spec-asserted); the
    * exact top-K column is the oracle's verification side. */
  def cmsTopk(s: SparkSession, d: String): DataFrame = {
    val hx = TextOps.corpus(s, d)
      .select(tokens(col("text")).as("toks"))
      .select(explode(zipGrams2(col("toks"))).as("p"))
      .select(gram2(col("p")).as("bg"))
      .withColumn("h", h28(col("bg")))
    val counters = hx
      .select(posexplode(array((0 until CmsDepth).map(j =>
        cmsBucket(col("h"), j)): _*)).as(Seq("j", "b")))
      .groupBy(col("j"), col("b")).agg(count(lit(1)).as("c"))
    val top = hx.groupBy(col("bg")).agg(count(lit(1)).as("c_exact"))
      .orderBy(col("c_exact").desc, col("bg")).limit(CmsTop)
      .withColumn("h", h28(col("bg")))
    val probe = top.select(col("bg"), col("c_exact"),
      posexplode(array((0 until CmsDepth).map(j =>
        cmsBucket(col("h"), j)): _*)).as(Seq("j", "b")))
    counters.join(broadcast(probe), Seq("j", "b"))
      .groupBy(col("bg"), col("c_exact"))
      .agg(min(col("c")).as("est"))
      .withColumn("over", col("est") - col("c_exact"))
      .orderBy(col("c_exact").desc, col("bg"))
  }

  private def bloomSlot(h: Column, j: Int): Column =
    minhashJ(h, j) % lit(BloomBits)

  /** Bloom-prefiltered membership join: build a [[BloomBits]]-bit bloom
    * filter (k = [[BloomK]] hash functions, ONE shared bit array) over
    * the distinct shingles of the [[BloomBuildSource]] documents, fold
    * it into the probe scan as a BloomBits/64-long bitmask LITERAL
    * (zero probe-side shuffle — candidacy is decided inside the scan's
    * codegen stage, exactly where Spark's runtime-filter rewrite would
    * put it), then account per source: distinct probe shingles,
    * bloom candidates, true members, false positives.
    *
    * The driver-side collect is bounded by construction at
    * BloomBits/64 = 256 longs — the bitmap, not the data. No false
    * negatives by construction (spec-asserted): every true member
    * passes the filter, so n_cand ≥ n_true always. */
  def bloomJoin(s: SparkSession, d: String): DataFrame = {
    val staged = stagedShingles(s, d)
    val build = staged.filter(col("source") === lit(BloomBuildSource))
      .select(col("sh"), col("h")).distinct()
    val nWords = (BloomBits / 64).toInt
    val wordRows = build
      .select(explode(array((0 until BloomK).map(j =>
        bloomSlot(col("h"), j)): _*)).as("s"))
      .select((col("s") / 64).cast("int").as("w"),
        // SQL expr: the functions-API shiftleft only takes a literal
        // shift distance
        expr("shiftleft(CAST(1 AS BIGINT), CAST(s % 64 AS INT))").as("bit"))
      .groupBy(col("w")).agg(bit_or(col("bit")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val words: Seq[Long] = (0 until nWords).map(w => wordRows.getOrElse(w, 0L))
    val bitmap = typedLit(words)
    // bit test (word >> bit) & 1 — via SQL expr, the functions-API
    // shiftright only takes a literal shift distance; & 1 makes the
    // arithmetic-vs-logical shift distinction irrelevant. The BloomK
    // tests ride ONE forall lambda so the 256-long bitmap literal
    // appears ONCE in the expression tree: the previous explicit
    // `test(s0) AND test(s1) AND test(s2)` had the projection-collapsed
    // `bm` literal inlined into every conjunct — 3 copies of a 2 KB
    // array that every optimizer/canonicalization pass re-walks and
    // codegen re-emits a reference for. Same value: the conjunction of
    // non-null boolean tests equals forall over them.
    val memberLambda =
      "forall(array(" + (0 until BloomK).map(j => s"s$j").mkString(",") +
        "), sj -> (shiftright(element_at(bm, CAST(sj / 64 AS INT) + 1), " +
        "CAST(sj % 64 AS INT)) & 1) = 1)"
    val probe = staged.filter(col("source") =!= lit(BloomBuildSource))
      .distinct()
    val flagged = probe
      .withColumn("bm", bitmap)
      .withColumns((0 until BloomK).map(j =>
        s"s$j" -> bloomSlot(col("h"), j)).toMap)
      .withColumn("cand", expr(memberLambda))
      .join(broadcast(build.select(col("sh"), lit(1L).as("hit"))),
        Seq("sh"), "left")
    flagged.groupBy(col("source"))
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("cand"), 1L).otherwise(0L)).as("n_cand"),
        sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("n_true"))
      .withColumn("n_fp", col("n_cand") - col("n_true"))
      .orderBy("source", "n_sh", "n_cand", "n_true", "n_fp")
  }
}
