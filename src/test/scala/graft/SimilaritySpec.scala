package graft

import org.apache.spark.sql.functions._
import graft.engine.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine on hand-computed vectors (FIXTURES.md micro)") {
    val df = Seq(
      (Seq(1.0, 0.0, 0.0), Seq(1.0, 0.0, 0.0)),   // identical → 1
      (Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0)),   // orthogonal → 0
      (Seq(1.0, 1.0, 0.0), Seq(1.0, 0.0, 0.0))    // 45° → √2/2
    ).toDF("a", "b")
    val got = df.select(Similarity.cosine(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
    assert(math.abs(got(2) - math.sqrt(2) / 2) < 1e-12)
  }

  test("simTopK returns k neighbors per query, best-first, excluding self") {
    val out = Similarity.simTopK(spark, sf, k = 5)
    val rows = out.select("q_id", "vec_id", "rk", "cos4")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (q, v, _, _) => q != v })
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.length == 5)
      val byRank = g.sortBy(_._3).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH buckets partition the corpus; ANN results come from own bucket") {
    val vs = Similarity.vectors(spark, sf)
      .withColumn("bkt", Similarity.lshBucket(col("v")))
    val buckets = vs.select("bkt").as[Long].collect()
    assert(buckets.forall(b => b >= 0 && b < 256))
    assert(buckets.distinct.length > 1)
  }

  test("dedupEmbed never pairs across buckets and respects threshold") {
    val out = Similarity.dedupEmbed(spark, sf, threshold = 0.3)
    assert(out.filter(col("cos4") < 0.29).count() == 0)
    assert(out.filter(col("a") >= col("b")).count() == 0)
  }

  test("lshBitsFor: occupancy-driven, floored, capped, monotone") {
    import Similarity.{lshBitsFor, MinLshBits, MaxLshBits, TargetBucket}
    assert(lshBitsFor(0) == MinLshBits)
    assert(lshBitsFor(TargetBucket << MinLshBits) == MinLshBits)
    assert(lshBitsFor((TargetBucket << MinLshBits) + 1) == MinLshBits + 1)
    assert(lshBitsFor(Long.MaxValue / 4) == MaxLshBits)
    // expected occupancy n / 2^bits stays ≤ TargetBucket until the cap
    (10 to 36).map(1L << _).foreach { n =>
      val b = lshBitsFor(n)
      assert(b == MaxLshBits || (n >> b) <= TargetBucket, s"n=$n bits=$b")
    }
  }

  test("kmeansStep: exact fixed-point cell means, identical vectors share a cell") {
    val dir = java.nio.file.Files.createTempDirectory("graft-emb").toString
    Seq(
      (10L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 1),
      (11L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 1), // identical to 10 -> same cell
      (20L, Seq(0.0f, 1.0f, 0.0f, 0.0f), 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Similarity.kmeansStep(spark, dir)
      .select("cell", "pos", "n", "sq", "m6")
      .as[(Long, Long, Long, Long, Double)].collect()
    // every vector is its own centroid here; 10 and 11 tie at cos=1 with
    // both identical centroids and the min-c_id break lands both in cell 10
    assert(out.length == 8) // 2 cells × 4 components
    val cell10 = out.filter(_._1 == 10L).sortBy(_._2)
    assert(cell10.forall(_._3 == 2L))
    assert(cell10.map(_._4).toSeq == Seq(2000000L, 0L, 0L, 0L))
    assert(cell10.map(_._5).toSeq == Seq(1.0, 0.0, 0.0, 0.0))
    val cell20 = out.filter(_._1 == 20L).sortBy(_._2)
    assert(cell20.forall(_._3 == 1L))
    assert(cell20.map(_._5).toSeq == Seq(0.0, 1.0, 0.0, 0.0))
  }

  test("semDedup drops a planted near-duplicate within its cell, keeps the earliest") {
    val dir = java.nio.file.Files.createTempDirectory("graft-emb").toString
    // a corpus this small makes every vector a centroid, so only exact
    // copies co-locate (cos-1 tie -> min-centroid-id): the cell
    // structure of real corpora is covered by the oracle check at
    // sf0.001-0.1; this spec pins the drop/keep/count semantics
    Seq(
      (10L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 1),
      (11L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 1),    // copy of 10 -> cell 10
      (12L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 1),    // copy -> cell 10
      (20L, Seq(0.0f, 1.0f, 0.0f, 0.0f), 2))    // orthogonal, own cell
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Similarity.semDedup(spark, dir, threshold = 0.9)
      .select("vec_id", "keep_id", "n_near")
      .as[(Long, Long, Long)].collect().toSeq
    // 11 and 12 are each similar to every earlier cell-mate; canonical
    // keeper is always the earliest (10). 20 is alone in its cell.
    assert(out == Seq((11L, 10L, 1L), (12L, 10L, 2L)))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("semDedup on an empty corpus returns an empty frame (kernel empty-cents path)") {
    // zero vectors -> zero centroids -> assignTo's collected matrix is
    // empty: the kernel must return the typed empty frame, not crash
    // on an argmax over nothing (fuzz classes zero/zdocs cover this
    // end-to-end against the oracle; this pins it as a unit)
    val dir = java.nio.file.Files.createTempDirectory("graft-emb0").toString
    spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("vec_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("embedding",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.FloatType)),
          org.apache.spark.sql.types.StructField("label",
            org.apache.spark.sql.types.IntegerType))))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    assert(Similarity.semDedup(spark, dir).count() === 0L)
    assert(Similarity.kmeansStep(spark, dir).count() === 0L)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("semDedupCells: identity at every gate SF, occupancy-bounded, capped") {
    // every driver gate SF has <= 2000 embeddings: the adaptive K must
    // be exactly NumCentroids there (gate results unchanged by design)
    for (n <- Seq(1L, 500L, 2000L, 2048L))
      assert(Similarity.semDedupCells(n) == Similarity.NumCentroids)
    // first doubling exactly past CellTarget occupancy
    assert(Similarity.semDedupCells(2049) == 2 * Similarity.NumCentroids)
    // the replica-leg shapes
    assert(Similarity.semDedupCells(20000) == 1024)
    assert(Similarity.semDedupCells(200000) == 8192)
    // occupancy n/K <= CellTarget everywhere below the cap's reach
    for (n <- Seq(100L, 3000L, 50000L, 999999L, 2097152L)) {
      val k = Similarity.semDedupCells(n)
      assert(n <= Similarity.CellTarget * k,
        s"occupancy bound violated at n=$n: K=$k")
    }
    // capped: past MaxCellDoublings K stops growing (~4.19M centroids
    // ≈ 134M vectors at target occupancy; the two-level assignment
    // serves every K past FlatAssignMaxK with bounded collects)
    assert(Similarity.semDedupCells(Long.MaxValue / 2)
      == (Similarity.NumCentroids << Similarity.MaxCellDoublings))
    // the 1248x-leg shape that used to pin at the old 65536 cap: K now
    // keeps occupancy at target through the measured ceiling
    assert(Similarity.semDedupCells(2496000L) == 131072)
    assert(2496000L <= Similarity.CellTarget * 131072L)
  }

  test("assignCellsHier: per-coarse-cell argmax matches a declarative reference (incl. fallback cells)") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.expressions.Window
    val vs = Similarity.vectors(spark, sf).persist()
    val n = vs.count()
    // (k=8, coarse=4): several fine centroids per coarse cell;
    // (k=1, coarse=16): most coarse cells have NO fine centroid — the
    // negative-keyed fallback blocks must match the reference too
    for ((k, coarseK) <- Seq((8, 4), (1, 16))) {
      val coarse = Similarity.hashRankedLimit(vs, "h_", coarseK)
        .select(col("vec_id").as("c_id"), col("v").as("cv"),
          col("nm").as("cnm"))
      def coarseAssign(x: DataFrame): DataFrame = {
        val w = Window.partitionBy(col("vec_id"))
          .orderBy(col("__cos").desc, col("c_id"))
        x.crossJoin(broadcast(coarse))
          .withColumn("__cos",
            Similarity.dot(col("v"), col("cv")) / (col("nm") * col("cnm")))
          .withColumn("__rk", row_number().over(w))
          .filter(col("__rk") === 1)
          .withColumnRenamed("c_id", "ccell")
          .drop("cv", "cnm", "__cos", "__rk")
      }
      // the fine-sample rule, restated independently of the library
      val t = math.min(1L << 28, math.max(1L, (1L << 28) * k.toLong / n))
      val fineC = coarseAssign(
          vs.withColumn("fk", graft.engine.PortableHash.h28(
              concat(lit("c_"), col("vec_id"))))
            .filter(col("fk") < t).drop("fk"))
        .select(col("ccell"), col("vec_id").as("f_id"),
          col("v").as("fv"), col("nm").as("fnm"))
      val wF = Window.partitionBy(col("vec_id"))
        .orderBy(col("fcos").desc, col("f_id"))
      val want = coarseAssign(vs)
        .join(fineC, Seq("ccell"), "left")
        .withColumn("fcos",
          Similarity.dot(col("v"), col("fv")) / (col("nm") * col("fnm")))
        .withColumn("frk", row_number().over(wF))
        .filter(col("frk") === 1)
        .select(col("vec_id"),
          when(col("f_id").isNull, -col("ccell") - 1)
            .otherwise(col("f_id")).as("cell"),
          round(col("fcos"), 9).as("cos9"))
      val got = Similarity.assignCellsHier(vs, k, coarseK)
        .select(col("vec_id"), col("cell"),
          round(col("c_cos"), 9).as("cos9"))
      assert(got.count() == n, s"k=$k coarse=$coarseK: one row per vector")
      assert(got.exceptAll(want).count() == 0 &&
        want.exceptAll(got).count() == 0,
        s"k=$k coarse=$coarseK: hier assignment diverges from reference")
      if (k == 1)
        assert(got.filter(col("cell") < 0).count() > 0,
          "fallback branch not exercised at k=1")
    }
    vs.unpersist()
    ()
  }

  test("assignCells routes past FlatAssignMaxK to the two-level path") {
    val vs = Similarity.vectors(spark, sf)
    val n = vs.count()
    // k just past the flat kernel's require-bound: must route to the
    // hier path (not throw), with t clamped so every vector is a fine
    // centroid — one row per vector, no fallback cells
    val out = Similarity.assignCells(vs, Similarity.FlatAssignMaxK + 1)
    assert(out.count() == n)
    assert(out.select("vec_id").distinct().count() == n)
    assert(out.filter(col("cell") < 0).count() == 0)
  }

  test("assignCellsHier on an empty frame returns the typed empty frame") {
    val vs = Similarity.vectors(spark, sf).filter(lit(false))
    assert(Similarity.assignCellsHier(vs, 8).count() == 0)
  }

  test("assignCellsHier is invariant to input partitioning") {
    // each row's (cell, c_cos) depends only on the row, the coarse
    // sample and the fine set — never on which partition carried it or
    // in what order the cogroup iterators arrive; a partitioning-
    // sensitive result here would be a nondeterminism bug of the class
    // the fixed-point aggregation discipline exists to prevent
    val vs = Similarity.vectors(spark, sf)
    def runAt(p: Int) =
      Similarity.assignCellsHier(vs.repartition(p), 8, 4)
        .select("vec_id", "cell", "c_cos").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Double])))
        .sortBy(_._1).toSeq
    assert(runAt(3) == runAt(17))
  }

  test("assignCellsHier is invariant to fine-pass salting") {
    // salting must be result-IDENTICAL: each output row depends only
    // on its own (v, nm) and its coarse cell's fine SET, which every
    // salt replica carries in full — so salts=1 (the unsalted r13
    // shape), a non-divisor salt count, and the production default
    // must agree bit-for-bit, including on the (1, 16) shape where
    // most cells take the negative-keyed fallback
    val vs = Similarity.vectors(spark, sf).persist()
    for ((k, coarseK) <- Seq((8, 4), (1, 16))) {
      def runAt(s: Int) =
        Similarity.assignCellsHier(vs, k, coarseK, salts = s)
          .select("vec_id", "cell", "c_cos").collect()
          .map(r => (r.getLong(0), r.getLong(1),
            Option(r.get(2)).map(_.asInstanceOf[Double])))
          .sortBy(_._1).toSeq
      val unsalted = runAt(1)
      assert(runAt(5) == unsalted,
        s"k=$k coarse=$coarseK: salts=5 diverges from unsalted")
      assert(runAt(Similarity.HierFineSalts) == unsalted,
        s"k=$k coarse=$coarseK: default salting diverges from unsalted")
      if (k == 1) assert(unsalted.exists(_._2 < 0),
        "fallback branch not exercised in the salting A/B")
    }
    vs.unpersist()
    ()
  }

  test("salting splits a fully-hot coarse cell into balanced groups") {
    // the r13 skew scenario: a clustered corpus lands one coarse
    // cell's whole population in ONE cogroup task. With salting the
    // task key is (cell, saltOf(vec_id)) — pin that the mixer spreads
    // a hot cell's ids across ALL salts with no group above 2x the
    // balanced share, and that the salted result still matches the
    // unsalted one on this pathological (all-identical-direction)
    // corpus
    import spark.implicits._
    val dir = (0 until 64).map(i => if (i == 0) 1.0 else 1e-6)
    val hot = (0L until 2000L).map(id => (id, dir)).toDF("vec_id", "v")
      .withColumn("nm", Similarity.l2norm(col("v")))
    val s = Similarity.HierFineSalts
    val counts = (0L until 2000L).groupBy(id => Similarity.saltOf(id, s))
    assert(counts.size == s, s"only ${counts.size} of $s salts populated")
    val maxShare = counts.values.map(_.size).max
    assert(maxShare <= 2 * (2000 / s),
      s"hot-cell salt groups unbalanced: max $maxShare of ${2000 / s}")
    def runAt(salts: Int) =
      Similarity.assignCellsHier(hot, 64, 4, salts = salts)
        .select("vec_id", "cell").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(runAt(s) == runAt(1), "salted hot-cell result diverges")
  }

  test("coarseFor: sqrt(K) clamped to [CoarseCells, MaxCoarseCells]") {
    // the r15 lever: assignment work is N*(coarseK + K/coarseK) dots,
    // minimized at coarseK = sqrt(K). Floor 256 = sqrt(FlatAssignMaxK)
    // means NOTHING changes for any K <= 65536 (the flat regime, where
    // the two-level path only runs when forced); ceiling 4096 keeps
    // hashRankedLimit on its cheap TakeOrdered branch and the coarse
    // collect <= ~2 MB while per-group fine matrices stay bounded
    // through K ~ 268M.
    assert(Similarity.coarseFor(1) == Similarity.CoarseCells)
    assert(Similarity.coarseFor(Similarity.FlatAssignMaxK)
      == Similarity.CoarseCells, "floor must equal sqrt(FlatAssignMaxK)")
    assert(Similarity.coarseFor(131072) == 362)
    assert(Similarity.coarseFor(262144) == 512)
    assert(Similarity.coarseFor(524288) == 724)
    // the MaxCellDoublings envelope K = 64 * 2^16 = 4.19M -> 2048
    assert(Similarity.coarseFor(64 << 16) == 2048)
    assert(Similarity.coarseFor(Int.MaxValue) == Similarity.MaxCoarseCells)
    // monotone non-decreasing across the doubling ladder (the adaptive
    // K path only ever moves up it)
    val ladder = (0 to Similarity.MaxCellDoublings).map(j =>
      Similarity.coarseFor(Similarity.NumCentroids << j))
    assert(ladder == ladder.sorted, s"coarseFor not monotone: $ladder")
  }

  test("hierSalts: gate bypass below the floor, occupancy-capped above it") {
    val floor = Similarity.HierSaltMinRows
    // every gate corpus (<= SemDedupGateCap = 32768 << floor) bypasses
    assert(Similarity.hierSalts(Similarity.SemDedupGateCap, 1024) == 1)
    assert(Similarity.hierSalts(floor - 1, 64) == 1)
    // at/above the floor: min(HierFineSalts, occupancy n/k), so the
    // replicated fine table (salts*k rows) never exceeds one
    // corpus-size shuffle even at the adaptive-K occupancy floor
    assert(Similarity.hierSalts(floor, 8192) == 32)
    assert(Similarity.hierSalts(800000L, 8192) == 32,
      "the SALT_SKEW leg shape must stay fully salted")
    assert(Similarity.hierSalts(4992000L, 262144) == 19,
      "occupancy 19 must cap salts at 19 (the r14 ledger gap)")
    assert(Similarity.hierSalts(1L << 30, 10) == Similarity.HierFineSalts)
    assert(Similarity.hierSalts(floor, floor.toInt * 2) == 1,
      "occupancy < 1 must still yield one salt, never zero")
    for (n <- Seq(floor, 10L * floor); k <- Seq(64, 8192, 262144))
      assert(Similarity.hierSalts(n, k).toLong * k <= math.max(n, k.toLong),
        s"fine replicas exceed a corpus shuffle at n=$n k=$k")
  }

  test("null-v rows are tolerated as vectors and excluded as centroids") {
    // the advisor's asymmetry: argmaxBlocked tolerates null v/nm in
    // ROWS, but a null row drawn into a centroid sample would NPE
    // when the matrix is built (driver-side in assignTo, executor-side
    // in the hier cogroup). centroidEligible must keep both paths
    // total: null rows still get assigned (all-skipped fallback, null
    // c_cos), and never serve as centroids
    import spark.implicits._
    val base = Similarity.vectors(spark, sf).select("vec_id", "v", "nm")
    val nulls = Seq(900001L, 900002L).toDF("vec_id")
      .withColumn("v", lit(null).cast("array<double>"))
      .withColumn("nm", lit(null).cast("double"))
    val vs = base.unionByName(nulls)
    val n = base.count() + 2
    for (out <- Seq(Similarity.assignCells(vs, 8),
        Similarity.assignCellsHier(vs, 8, 4))) {
      assert(out.count() == n, "null-v rows dropped instead of assigned")
      // a null-v row can never be its own nearest centroid — it was
      // never sampled — and its cosine is null under the all-skipped
      // fallback (hier carries c_cos; the flat path drops it)
      val bad = out.filter(col("vec_id") >= 900001L)
      assert(bad.count() == 2)
      assert(bad.filter(col("cell") >= 900001L).count() == 0,
        "a null-v row served as a centroid")
    }
    assert(Similarity.assignCellsHier(vs, 8, 4)
      .filter(col("vec_id") >= 900001L && col("c_cos").isNotNull)
      .count() == 0, "null-v row produced a non-null cosine")

    // ALL-null corpus: ZERO eligible centroids with rows present. The
    // flat path must map every row to the single fallback block
    // (cell = -1, null c_cos) — never a silent empty frame (that would
    // be total row loss); the hier path must propagate the negative
    // fallback rather than double-negating it back into id space
    val allNull = Seq(1L, 2L, 3L).toDF("vec_id")
      .withColumn("v", lit(null).cast("array<double>"))
      .withColumn("nm", lit(null).cast("double"))
    val flatAll = Similarity.assignCells(allNull, 8)
    assert(flatAll.count() == 3, "all-null corpus dropped by flat path")
    assert(flatAll.filter(col("cell") === -1L).count() == 3)
    val hierAll = Similarity.assignCellsHier(allNull, 8, 4)
    assert(hierAll.count() == 3, "all-null corpus dropped by hier path")
    assert(hierAll.filter(col("cell") < 0 && col("c_cos").isNull)
      .count() == 3, "all-null hier rows lost the negative fallback")
  }

  test("hashRankedLimit: prefiltered large-k path equals the exact TakeOrdered") {
    // k > 4096 engages the hash-threshold prefilter (the driver-merge
    // fix the k=1248 sim leg forced); it must stay bit-identical to
    // the plain orderBy+limit it replaces
    val df = (0L until 20000L).toDF("vec_id")
    val k = 5000
    val got = Similarity.hashRankedLimit(df, "c_", k)
      .as[Long].collect().toSeq
    val want = df.withColumn("hk", graft.engine.PortableHash.h28(
        concat(lit("c_"), col("vec_id"))))
      .orderBy(col("hk"), col("vec_id")).limit(k)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == want)
    assert(got.size == k)
    // small-k path: exact single-stage plan, same result rule — the
    // prefix of the same ranking
    val small = Similarity.hashRankedLimit(df, "c_", 64)
      .as[Long].collect().toSeq
    assert(small == want.take(64))
  }

  test("semDedupGated: identical to semDedup at or below the cap") {
    // every driver gate SF and the committed sf1 leg sit below
    // SemDedupGateCap — the gated query must be bit-identical there
    val full = Similarity.semDedup(spark, sf)
      .collect().toSeq
    val gated = Similarity.semDedupGated(spark, sf)
      .collect().toSeq
    assert(gated == full)
    assert(Similarity.SemDedupGateCap > 20000L,
      "cap must sit above sf1's 20k vectors (committed artifacts)")
  }

  test("semDedupGated past the cap: hash-ranked subsample, equal to semDedup of that subsample") {
    val dir = java.nio.file.Files.createTempDirectory("graft-embcap").toString
    val subDir = java.nio.file.Files.createTempDirectory("graft-embsub").toString
    // 12 distinct unit-ish vectors with planted copies scattered so the
    // subsample decision (hash rank) actually cuts across dup groups
    val rows = (0L until 12L).map { i =>
      val base = (i % 4).toInt // 4 dup groups of 3
      val v = Seq.tabulate(8)(j =>
        if (j == base) 1.0f
        else if (j == 4 + (i % 4).toInt) 0.01f * i.toFloat
        else 0.0f)
      (i, v, base)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val cap = 6L
    // the declared subset rule: cap smallest (h28('g_'||vec_id), vec_id)
    val subIds = Similarity.vectors(spark, dir)
      .withColumn("gk", graft.engine.PortableHash.h28(
        concat(lit("g_"), col("vec_id"))))
      .orderBy(col("gk"), col("vec_id")).limit(cap.toInt)
      .select("vec_id").as[Long].collect().toSet
    assert(subIds.size == cap)
    val gated = Similarity.semDedupGated(spark, dir, cap = cap)
      .collect().toSeq
    // membership: every output vec_id / keep_id drawn from the subset
    gated.foreach { r =>
      assert(subIds.contains(r.getLong(0)) && subIds.contains(r.getLong(2)))
    }
    // equivalence: identical to the uncapped operator run on a corpus
    // holding exactly the subsample (same rows ⇒ same K ⇒ same cells)
    rows.filter(r => subIds.contains(r._1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$subDir/embeddings.parquet")
    val direct = Similarity.semDedup(spark, subDir).collect().toSeq
    assert(gated == direct)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(subDir))
  }

  test("pcaTop recovers a planted dominant axis from the exact covariance") {
    val dir = java.nio.file.Files.createTempDirectory("graft-emb").toString
    // variance 100 along dim 0 (components ±10), tiny deterministic
    // jitter along dim 1 so the matrix isn't exactly rank-1
    val rows = (0 until 200).map { i =>
      val e = Array.fill(64)(0.0f)
      e(0) = if (i % 2 == 0) 10.0f else -10.0f
      e(1) = (i % 5) * 0.01f
      (i.toLong, e.toSeq, i % 3)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val (lambda, v) = Similarity.pcaTop(spark, dir)
    assert(math.abs(lambda - 100.0) < 1.0, s"eigenvalue $lambda")
    assert(math.abs(v(0)) > 0.999, s"axis ${v.toSeq.take(4)}")
    assert(v(0) > 0, "sign fixed to positive largest component")
    // eigenvector is unit-norm
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("kmeansIterate: spherical objective non-decreasing across rounds") {
    val quality = Similarity.kmeansIterate(spark, sf, 4)
    assert(quality.length == 4)
    // Lloyd monotonicity, up to the 1e-6 fixed-point quantization of
    // the mean update (each round's assignment + renormalized-mean
    // update cannot decrease the mean best-cosine)
    quality.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-4, s"objective dropped: $quality")
    case _ => ()
    }
    // and it genuinely improves over the arbitrary hash-sampled start
    assert(quality.last > quality.head)
  }

  test("dedupEmbedBanded: more bands find a superset of verified pairs") {
    val vs = Similarity.vectors(spark, sf)
    def pairs(bands: Int) =
      Similarity.dedupEmbedBanded(vs, bands, bits = 8, threshold = 0.3)
        .select("a", "b").as[(Long, Long)].collect().toSet
    val one = pairs(1)
    val four = pairs(4)
    assert(one.subsetOf(four), "OR-construction can only add candidates")
    assert(four.nonEmpty)
  }

  test("confusionPred kernel is bit-identical to the declarative form " +
      "(ragged lengths, exact ties, missing positions)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // Adversarial centroid frame: label 1 carries pos 1..3, label 2 only
    // pos 1..2 (a vector's pos-3 term must NOT count against label 2 —
    // the inner-join semantics), label 3 duplicates label 1's means so a
    // 3-component vector ties exactly between labels 1 and 3 and min_by
    // must pick the smaller cl.
    val cents = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1, 1L, 0.0), Row(1, 2L, 0.0), Row(1, 3L, 0.0),
        Row(2, 1L, 0.5), Row(2, 2L, 0.5),
        Row(3, 1L, 0.0), Row(3, 2L, 0.0), Row(3, 3L, 0.0))),
      StructType(Seq(StructField("cl", IntegerType),
        StructField("pos", LongType), StructField("m", DoubleType))))
    // Vectors: ragged lengths (1, 2, 3 components), values that make
    // label 2 win on short vectors and tie 1-vs-3 on the long one.
    val vx = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(10L, 1, Seq(0.5)),                 // closer to label 2
        Row(11L, 2, Seq(0.49, 0.51)),          // near label 2
        Row(12L, 3, Seq(0.01, -0.01, 0.02)),   // ties labels 1 and 3 → 1
        Row(13L, 1, Seq(1000.0, -1000.0)))),   // large magnitudes
      StructType(Seq(StructField("vec_id", LongType),
        StructField("label", IntegerType),
        StructField("v", ArrayType(DoubleType)))))
    val kern = Similarity.confusionPred(vx, cents)
      .orderBy("label", "pred").collect().toSeq
    val decl = Similarity.confusionPredDF(vx, cents)
      .orderBy("label", "pred").collect().toSeq
    assert(kern == decl)
    // the tie case picked the smaller cl
    assert(kern.exists(r => r.getInt(0) == 3 && r.getInt(1) == 1))
  }

  test("confusionPred on an empty-vector row emits nothing, like the " +
      "declarative posexplode") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val cents = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1, 1L, 0.0))),
      StructType(Seq(StructField("cl", IntegerType),
        StructField("pos", LongType), StructField("m", DoubleType))))
    val vx = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 1, Seq.empty[Double]), Row(2L, 1, Seq(0.25)))),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("label", IntegerType),
        StructField("v", ArrayType(DoubleType)))))
    val kern = Similarity.confusionPred(vx, cents).collect().toSeq
    val decl = Similarity.confusionPredDF(vx, cents).collect().toSeq
    assert(kern == decl)
    assert(kern.size == 1)
  }
}
