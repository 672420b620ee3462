package graft

import org.apache.spark.sql.functions._
import graft.engine.{Similarity, TextOps}

/** Unit tests for the round-3 operators: chunking, packing, domain
  * capping, funnel report, kNN label vote, PQ encoding. */
class Round3OpsSpec extends SparkSpec {
  import spark.implicits._

  test("chunkDocs covers every token; stride/window geometry holds") {
    val out = TextOps.chunkDocs(spark, sf)
      .select("doc_id", "chunk_id", "n_tok_chunk")
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val docs = Sources()
    out.groupBy(_._1).foreach { case (docId, chunks) =>
      val nTok = docs(docId)
      val ids = chunks.map(_._2).sorted
      // chunk ids are dense 0..m with starts covering [0, nTok)
      assert(ids.head == 0L && ids.last == (nTok - 1) / TextOps.ChunkStride)
      assert(ids.toSeq == (0L to ids.last).toSeq)
      chunks.foreach { case (_, cid, len) =>
        val start = cid * TextOps.ChunkStride
        val expect = math.min(TextOps.ChunkSize.toLong, nTok - start)
        assert(len == expect, s"doc $docId chunk $cid: $len vs $expect")
      }
    }
  }

  private def Sources(): Map[Long, Long] =
    graft.engine.Sources.documents(spark, sf)
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).cast("long"))
      .as[(Long, Long)].collect().toMap

  test("packSeqs: offsets consistent with per-source running sum") {
    val rows = TextOps.packSeqs(spark, sf)
      .select("doc_id", "source", "n_tok", "seq_id", "seq_off")
      .as[(Long, String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (_, g) =>
      var cum = 0L
      g.sortBy(_._1).foreach { case (_, _, nTok, seqId, off) =>
        assert(seqId == cum / TextOps.PackBudget)
        assert(off == cum % TextOps.PackBudget)
        cum += nTok
      }
    }
  }

  test("domainCap keeps at most cap docs per source, hash-ranked") {
    val rows = TextOps.domainCap(spark, sf)
      .select("source", "rk", "doc_id")
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.length <= TextOps.DomainCap)
      assert(g.map(_._2).sorted.toSeq == (1L to g.length).toSeq)
    }
  }

  test("filterFunnel stages are monotone non-increasing and start at all docs") {
    val rows = TextOps.filterFunnel(spark, sf)
      .select("stage", "n_docs", "total_tok")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    val total = graft.engine.Sources.documents(spark, sf).count()
    assert(rows.head._2 == total)
    rows.zip(rows.tail).foreach { case ((_, a, at), (_, b, bt)) =>
      assert(b <= a && bt <= at)
    }
  }

  test("spanDedup only reports spans present in 2+ docs, with first location") {
    val rows = TextOps.spanDedup(spark, sf)
      .select("sig", "n_spans", "n_docs", "first_doc", "first_chunk")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty) // the corpus plants exact dups, so spans repeat
    assert(rows.forall { case (_, n, nd, _, _) => nd >= 2 && n >= nd })
    assert(rows.map(_._1).distinct.length == rows.length)
  }

  test("dedupApply keeps exactly one doc per near-dup cluster") {
    val survivors = TextOps.dedupApply(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    val clusters = TextOps.dupClusters(spark, sf)
      .select("cluster", "n_members").as[(Long, Long)].collect()
    val total = graft.engine.Sources.documents(spark, sf).count()
    // one survivor per cluster: total - sum(members - 1)
    val expected = total - clusters.map(_._2 - 1).sum
    assert(survivors.size == expected)
    // every cluster canonical survives
    clusters.foreach { case (c, _) => assert(survivors.contains(c)) }
  }

  test("edge corpus: empty/1-token/all-repeat docs through repetition, funnel, chunking") {
    val dir = java.nio.file.Files.createTempDirectory("edge-docs").toString
    Seq(
      (1L, "", "en", "src0", 0L),
      (2L, "a", "en", "src0", 1L),
      (3L, "a a a a", "en", "src1", 7L),
      (4L, "x y", "en", "src1", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // repetition: docs without bigrams (1 "token" after split) drop out;
    // the all-repeat doc is graded repetitive with exact counts
    val rep = TextOps.repetitionStats(spark, dir)
      .select("doc_id", "n_tok", "n_uniq", "max_tok", "n_big", "max_big", "grade")
      .as[(Long, Long, Long, Long, Long, Long, String)].collect()
    assert(rep.map(_._1).toSeq == Seq(3L, 4L))
    val d3 = rep.find(_._1 == 3L).get
    assert(d3 == ((3L, 4L, 1L, 4L, 3L, 3L, "repetitive")))
    // a 2-token doc's single bigram is 100% of its bigrams — graded
    // repetitive by top-bigram share, which is precisely why the funnel
    // applies the min-length filter BEFORE the repetition filter
    val d4 = rep.find(_._1 == 4L).get
    assert(d4 == ((4L, 2L, 2L, 1L, 1L, 1L, "repetitive")))

    // funnel: stage 0 sees all four docs; nothing survives min_tokens
    val fun = TextOps.filterFunnel(spark, dir)
      .select("stage", "n_docs").as[(Long, Long)].collect().toMap
    assert(fun(0L) == 4L && fun(1L) == 0L && fun(4L) == 0L)

    // chunking: every doc yields exactly one (short) chunk
    val ch = TextOps.chunkDocs(spark, dir)
      .select("doc_id", "chunk_id", "n_tok_chunk")
      .as[(Long, Long, Long)].collect()
    assert(ch.length == 4 && ch.forall(_._2 == 0L))
    assert(ch.find(_._1 == 1L).get._3 == 1L) // "" splits to one empty token

    // packing: per-source offsets accumulate deterministically
    val pk = TextOps.packSeqs(spark, dir)
      .select("doc_id", "seq_id", "seq_off").as[(Long, Long, Long)].collect()
    assert(pk.length == 4 && pk.forall(_._2 == 0L))
  }

  test("cdcChunks: boundaries are content-defined — an edit only disturbs its own chunk") {
    def words(lo: Int, n: Int) = (lo until lo + n).map(i => s"w$i")
    val original = words(0, 400).mkString(" ")
    // edit deep inside the document: replace one token near the middle
    val edited = (words(0, 200) ++ Seq("EDITED") ++ words(201, 199)).mkString(" ")
    val df = Seq((1L, original), (2L, edited)).toDF("doc_id", "text")
    val sigs = TextOps.cdcChunkSigs(df)
      .select("doc_id", "sig").as[(Long, String)].collect()
    val s1 = sigs.filter(_._1 == 1L).map(_._2).toSet
    val s2 = sigs.filter(_._1 == 2L).map(_._2).toSet
    // the chunks before and after the edited span re-align: most chunk
    // signatures are shared, which is the whole point of content-defined
    // boundaries (fixed windows would shift everything after the edit)
    val shared = (s1 intersect s2).size
    assert(shared >= s1.size - 2 && shared >= 1,
      s"only $shared of ${s1.size} chunks survived a 1-token edit")
    assert(s1 != s2) // the edited chunk itself must differ
    // chunks partition the token stream: lengths sum to n_tok
    val lens = TextOps.cdcChunkSigs(df.filter(col("doc_id") === 1L))
      .select("n_tok_chunk").as[Long].collect()
    assert(lens.sum == 400L && lens.forall(_ > 0))
  }

  test("mixSample: smallest source kept whole, others downsampled toward it") {
    val rows = TextOps.mixSample(spark, sf)
      .select("source", "n_total", "rate_ppm", "n_kept")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val minTotal = rows.map(_._2).min
    rows.foreach { case (src, total, ppm, kept) =>
      assert(ppm == minTotal * TextOps.MixPpm / total)
      assert(kept <= total, s"$src kept $kept of $total")
      if (total == minTotal)
        assert(ppm == TextOps.MixPpm && kept == total,
          s"min source $src must be kept whole")
    }
  }

  test("knnLabel: one prediction per query, votes sum to k") {
    val rows = Similarity.knnLabel(spark, sf)
      .select("q_id", "pred_label", "n_votes")
      .as[(Long, Long, Long)].collect()
    assert(rows.length == Similarity.NumQueries)
    assert(rows.map(_._1).distinct.length == Similarity.NumQueries)
    rows.foreach { case (_, _, v) =>
      assert(v >= 1 && v <= Similarity.KnnK)
    }
  }

  test("simIvfProbe: wider probes never lose recall vs single-probe IVF") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.simTopK(spark, sf, k = 3))
    def hits(df: org.apache.spark.sql.DataFrame): Int =
      pairs(df).count(exact.contains)
    val one = hits(Similarity.simIvf(spark, sf, k = 3))
    val two = hits(Similarity.simIvfProbe(spark, sf, k = 3, nprobe = 2))
    assert(two >= one, s"nprobe=2 recall $two < nprobe=1 recall $one")
  }

  test("pqCodes: one code per (vector, subspace), codes within codebook") {
    val rows = Similarity.pqCodes(spark, sf)
      .select("vec_id", "sub", "code", "d26")
      .as[(Long, Long, Long, Double)].collect()
    val n = graft.engine.Sources.embeddings(spark, sf).count()
    assert(rows.length == n * Similarity.PqSubspaces)
    assert(rows.forall { case (_, s, c, d2) =>
      s >= 0 && s < Similarity.PqSubspaces &&
        c >= 0 && c < Similarity.PqCodebook && d2 >= 0.0
    })
    // a codebook member encodes itself in every subspace with distance 0
    val selfCoded = rows.groupBy(_._1).values
      .count(g => g.forall(_._4 == 0.0))
    assert(selfCoded >= Similarity.PqCodebook)
  }
}
