package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Components, Sources, TextOps}

/** Dev tool: measured scaling evidence for SCALE.md — runs the minhash
  * dedup pipeline on 1×/2×/4× copies of the documents table (doc_ids
  * offset so copies are distinct) and prints wall time per scale. Near-
  * dup pairs stay per-copy (offsets keep the planted dups within one
  * copy), so candidate counts should scale ~linearly, and so should
  * runtime. Usage: sbt "runMain graft.ScaleProbe [sfDir]". */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = Sources.documents(spark, dir).select("doc_id", "text")
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    // per-copy Caesar shift keeps each copy's internal near-dup structure
    // (translate is injective) while making copies textually disjoint —
    // dup DENSITY stays constant as the corpus grows, the honest setting
    def copies(k: Int): DataFrame =
      (0 until k).map { i =>
        val shifted = alpha.drop(i % 26) + alpha.take(i % 26)
        base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          translate(col("text"), alpha, shifted).as("text"))
      }.reduce(_ unionByName _)

    // warm up the whole pipeline once so codegen/JIT doesn't skew ratios
    TextOps.jaccardPairs(copies(1), 0.8).count()

    Seq(1, 2, 4).foreach { k =>
      val t0 = System.nanoTime()
      val pairs = TextOps.jaccardPairs(copies(k), 0.8).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"SCALEPROBE dedup k=$k docs=${5000 * k} pairs=$pairs ${secs}%.2f s")
    }

    // ANN leg: FIXED query set (100 vectors from copy 0), corpus grows —
    // per-query candidates are one LSH bucket (N/2^bits), so total work
    // should scale linearly with corpus size.
    import graft.engine.Similarity
    import org.apache.spark.sql.expressions.Window
    val embBase = Sources.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // per-copy cyclic rotation of the 64 dims — norm-preserving and
    // cosine-invariant WITHIN a copy (same rotation both sides), so each
    // copy keeps the base corpus's near-dup structure, while across
    // copies rotated vectors decorrelate — the same constant-density
    // construction as the text leg's Caesar shift (identical copies
    // would be true near-dups of each other, making pair growth
    // genuinely quadratic and the probe meaningless)
    def embCopies(k: Int): DataFrame =
      (0 until k).map { i =>
        val r = i % 64
        val rot = if (r == 0) col("v")
          else concat(slice(col("v"), r + 1, 64 - r), slice(col("v"), 1, r))
        embBase.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
          rot.as("v"))
      }.reduce(_ unionByName _)
    def annTopK(corpus: DataFrame): (Long, Long) = {
      val n = corpus.count()
      val bits = Similarity.lshBitsFor(n)
      val vs = corpus.withColumn("nm", Similarity.l2norm(col("v")))
        .withColumn("bkt", Similarity.lshBucket(col("v"), bits))
      val q = vs.filter(col("vec_id") % 50 === 0 && col("vec_id") < 10000000L)
        .select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("nm").as("qnm"), col("bkt"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
      val rows = vs.join(broadcast(q), Seq("bkt"))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("cos", Similarity.dot(col("qv"), col("v")) / (col("qnm") * col("nm")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .count()
      (n, rows)
    }
    annTopK(embCopies(1)) // warm
    Seq(1, 2, 4).foreach { k =>
      val t0 = System.nanoTime()
      val (n, rows) = annTopK(embCopies(k))
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"SCALEPROBE ann k=$k corpus=$n topk_rows=$rows ${secs}%.2f s")
    }

    // Embedding near-dup leg: candidate-PAIR counts must grow ~linearly
    // with the corpus — the adaptive LSH bit count (lshBitsFor) bounds
    // expected bucket occupancy, so same-bucket pairs are O(N), where a
    // fixed bit count would give N²/2^bits.
    def embPairs(corpus: DataFrame): (Int, Long, Long) = {
      val n = corpus.count()
      val bits = Similarity.lshBitsFor(n)
      val vs = corpus.withColumn("nm", Similarity.l2norm(col("v")))
        .withColumn("bkt", Similarity.lshBucket(col("v"), bits))
      val x = vs.select(col("bkt"), col("vec_id").as("a"))
      val y = vs.select(col("bkt"), col("vec_id").as("b"))
      val cand = x.join(y, Seq("bkt")).filter(col("a") < col("b")).count()
      (bits, n, cand)
    }
    // 2×/4×/8× straddles a bit-count threshold at every doubling (base
    // corpus 2000, TargetBucket 16 ⇒ thresholds at 4096/8192/16384), so
    // the probe exercises the adaptive mechanism rather than sitting
    // inside one bucket-count plateau where growth is locally quadratic.
    embPairs(embCopies(2)) // warm
    Seq(2, 4, 8).foreach { k =>
      val t0 = System.nanoTime()
      val (bits, n, cand) = embPairs(embCopies(k))
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"SCALEPROBE embdedup k=$k corpus=$n bits=$bits cand_pairs=$cand ${secs}%.2f s")
    }
    // Span-dedup leg: chunk digests → one digest-keyed agg. The Caesar
    // shift keeps repeated spans per-copy, so repeated-span counts and
    // runtime should both scale ~linearly with the corpus.
    def spanPairs(corpus: DataFrame): (Long, Long) = {
      val spans = TextOps.chunkSigs(corpus).groupBy("sig")
        .agg(countDistinct(col("doc_id")).as("n_docs"))
        .filter(col("n_docs") >= 2).count()
      (corpus.count(), spans)
    }
    spanPairs(copies(1)) // warm
    Seq(1, 2, 4).foreach { k =>
      val t0 = System.nanoTime()
      val (n, spans) = spanPairs(copies(k))
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"SCALEPROBE spandedup k=$k docs=$n repeated_spans=$spans ${secs}%.2f s")
    }

    // PQ-encoding leg: FIXED codebook (from copy 0), corpus grows —
    // assignment is O(N·K·dim) map-side, so runtime should scale
    // linearly and the broadcast never grows.
    def pqAssign(corpus: DataFrame): (Long, Long) = {
      val vs = corpus
      val subIdx = (0 until Similarity.PqSubspaces).map { kk =>
        struct(lit(kk.toLong).as("sub"),
          slice(col("v"), kk * Similarity.PqSubDim + 1, Similarity.PqSubDim).as("sv"))
      }
      val wCode = Window.orderBy(col("ck"), col("vec_id"))
      val codebook = vs.filter(col("vec_id") < 10000000L)
        .withColumn("ck", graft.engine.PortableHash.h28(
          concat(lit("pq_"), col("vec_id"))))
        .orderBy(col("ck"), col("vec_id")).limit(Similarity.PqCodebook)
        .withColumn("code", (row_number().over(wCode) - 1).cast("long"))
        .select(col("code"), explode(array(subIdx: _*)).as("cs"))
        .select(col("code"), col("cs.sub").as("sub"), col("cs.sv").as("cv"))
      val corpusSub = vs.select(col("vec_id"), explode(array(subIdx: _*)).as("xs"))
        .select(col("vec_id"), col("xs.sub").as("sub"), col("xs.sv").as("sv"))
      val d2 = aggregate(zip_with(col("sv"), col("cv"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x)
      val wBest = Window.partitionBy(col("vec_id"), col("sub"))
        .orderBy(col("d2"), col("code"))
      val out = corpusSub.join(broadcast(codebook), Seq("sub"))
        .withColumn("d2", d2)
        .withColumn("rk", row_number().over(wBest))
        .filter(col("rk") === 1)
        .count()
      (vs.count(), out)
    }
    pqAssign(embCopies(1)) // warm
    Seq(1, 2, 4).foreach { k =>
      val t0 = System.nanoTime()
      val (n, codes) = pqAssign(embCopies(k))
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"SCALEPROBE pq k=$k corpus=$n codes=$codes ${secs}%.2f s")
    }

    // SemDeDup leg: centroid-cell blocking with K raised ∝ N (the
    // documented occupancy dial — K only grows the broadcast). Cell
    // occupancy, and with it within-cell candidate pairs per vector,
    // should stay ~constant, so pair counts and runtime grow ~linearly;
    // a FIXED K would grow pairs as N²/K (the probe would show 4×/16×).
    def semPairs(corpus: DataFrame, cents: Int): (Long, Long) = {
      val vs = corpus.withColumn("nm", Similarity.l2norm(col("v")))
      val asg = Similarity.assignCells(vs, cents)
        .select(col("cell"), col("vec_id"))
      val cand = asg.select(col("cell"), col("vec_id").as("a"))
        .join(asg.select(col("cell"), col("vec_id").as("b")), Seq("cell"))
        .filter(col("a") < col("b")).count()
      (corpus.count(), cand)
    }
    semPairs(embCopies(1), 64) // warm
    Seq(1, 2, 4).foreach { k =>
      val t0 = System.nanoTime()
      val (n, cand) = semPairs(embCopies(k), 64 * k)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"SCALEPROBE semdedup k=$k corpus=$n cents=${64 * k} cand_pairs=$cand ${secs}%.2f s")
    }

    // Hash-family leg: identical dedup pipeline, MD5-portable h28 vs
    // xxhash64 fast28 — the measured gap behind SCALE.md's "swap for
    // xxhash64 in production" knob. Pair counts differ slightly (a
    // different hash family shuffles LSH buckets); the pipeline and
    // exact-Jaccard verification are identical.
    def timePairs(h: org.apache.spark.sql.Column => org.apache.spark.sql.Column): (Double, Long) = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = TextOps.jaccardPairs(copies(4), 0.8, h).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    import graft.engine.PortableHash
    timePairs(PortableHash.h28) // warm
    timePairs(PortableHash.fast28)
    val (tp, np) = timePairs(PortableHash.h28)
    val (tf, nf) = timePairs(PortableHash.fast28)
    println(f"SCALEPROBE hashfamily portable=$tp%.2f s ($np pairs) fast=$tf%.2f s ($nf pairs)")

    // Corpus-statistics leg: the n-gram familiarity pipeline (explode →
    // gram-keyed count agg → join-back → doc rollup). The Caesar shift
    // multiplies BOTH corpus bigrams and distinct bigrams by k (copies
    // share no grams), so the count table, the join and the rollup all
    // grow linearly — output rows = docs with ≥2 tokens, exactly k×.
    def noveltyRows(corpus: DataFrame): Long =
      TextOps.ngramNoveltyOf(corpus).count()
    noveltyRows(copies(1)) // warm
    Seq(1, 2, 4).foreach { k =>
      val t0 = System.nanoTime()
      val rows = noveltyRows(copies(k))
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"SCALEPROBE novelty k=$k rows=$rows ${secs}%.2f s")
    }
    // Graph leg: triangle counting over the near-dup pair graph. The
    // Caesar shift keeps each copy's dup structure internal, so edges,
    // wedges (Σ in·out, bounded by band-bucket occupancy) and triangles
    // all grow ~linearly with the corpus — the evidence behind
    // Components.triangles' "wedge volume stays O(edges·occupancy)"
    // claim. A super-linear time curve here means a hub formed and the
    // documented degree-ordering fallback is due.
    def triRows(corpus: DataFrame): (Long, Long) = {
      val edges = TextOps.jaccardPairs(corpus, 0.8)
        .select(col("a"), col("b"))
        .persist()
      val nEdges = edges.count()
      val nodes = Components.triangles(edges).count()
      spark.catalog.clearCache() // triangles persists the edge list
      (nEdges, nodes)
    }
    triRows(copies(1)) // warm
    Seq(1, 2, 4).foreach { k =>
      val t0 = System.nanoTime()
      val (edges, nodes) = triRows(copies(k))
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"SCALEPROBE triangles k=$k edges=$edges nodes=$nodes ${secs}%.2f s")
    }

    // LSH-PR ground-truth leg: the df-capped postings self-join behind
    // q_lsh_pr's exact ground truth. The Caesar shift keeps hot shingles
    // hot WITHIN each copy but disjoint ACROSS copies, so kept postings
    // and pairs both grow ~k× — the measured evidence that the
    // LshPrDfCap bound (Σ_{df≤cap} df² ≤ cap·Σdf) holds in practice.
    // A super-linear curve here would mean the cap is not binding.
    def gtPairs(corpus: DataFrame): (Long, Long) = {
      val sets = TextOps.shingleSets(corpus)
        .withColumn("hx", transform(col("s"),
          sh => graft.engine.PortableHash.h28(sh)))
      val posts = TextOps.cappedPosts(sets)
      val pairs = posts.alias("x")
        .join(posts.alias("y"),
          col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id"), col("y.doc_id")).count()
        .count()
      val n = posts.count()
      spark.catalog.clearCache() // cappedPosts persists its postings
      (n, pairs)
    }
    gtPairs(copies(1)) // warm
    Seq(1, 2, 4).foreach { k =>
      val t0 = System.nanoTime()
      val (posts, pairs) = gtPairs(copies(k))
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"SCALEPROBE lshpr_gt k=$k posts=$posts gt_pairs=$pairs ${secs}%.2f s")
    }

    // rankedCum leg: the distributed global rank + running sum behind
    // q_cum_share and q_heaps_law, over a per-doc frame that grows k×.
    // Both passes read one persisted range-partitioned frame; the only
    // unpartitioned piece is the ≤32²-pair offset cross join, so time
    // should scale ~linearly with rows.
    import graft.engine.Layout
    def rankedRows(corpus: DataFrame): (Long, Long) = {
      val perDoc = corpus.select(col("doc_id"),
        (length(col("text")) + lit(1L)).as("w"))
      val r = Layout.rankedCum(perDoc, Seq(col("doc_id")), col("w"))
      val out = r.agg(max(col("r")), max(col("cum"))).collect()(0)
      spark.catalog.clearCache() // rankedCum persists the ranged frame
      (out.getLong(0), out.getLong(1))
    }
    rankedRows(copies(1)) // warm
    Seq(1, 2, 4).foreach { k =>
      val t0 = System.nanoTime()
      val (n, cum) = rankedRows(copies(k))
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"SCALEPROBE rankedcum k=$k rows=$n cum=$cum ${secs}%.2f s")
    }
    spark.stop()
  }
}
