package graft

import org.apache.spark.sql.functions._
import graft.engine.{Similarity, Sources, TextOps}

/** Unit tests for the corpus-statistics / normalization operators:
  * vocabulary build, top n-grams, n-gram familiarity, dataset card,
  * PII-style scrubbing, embedding dimension stats. */
class TrainOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    Sources.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()

  test("vocabBuild: dense ranks, counts nonincreasing, coverage reaches 1") {
    val rows = TextOps.vocabBuild(spark, sf)
      .select("rk", "tok", "c", "cum_c", "coverage")
      .as[(Long, String, Long, Long, Double)].collect()
    assert(rows.nonEmpty && rows.length <= TextOps.VocabSize)
    assert(rows.map(_._1).toSeq == (1L to rows.length).toSeq)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 >= b._3, s"counts not nonincreasing at rk=${b._1}")
      assert(a._4 < b._4 && a._5 < b._5, "cumulatives not increasing")
    case _ => ()
    }
    // the tiny corpus's distinct tokens fit the vocab, so the cumulative
    // count is the corpus token count and coverage closes at exactly 1.0
    val totalTok = docs.iterator.map(_._2.split(" ", -1).length.toLong).sum
    assert(rows.last._4 == totalTok && rows.last._5 == 1.0)
    // counts match a direct tally
    val tally = docs.iterator.flatMap(_._2.split(" ", -1))
      .foldLeft(Map.empty[String, Long]) { (m, t) =>
        m.updated(t, m.getOrElse(t, 0L) + 1L)
      }
    rows.foreach { case (_, tok, c, _, _) => assert(tally(tok) == c) }
  }

  test("topNgrams: rank order and a direct bigram tally agree") {
    val rows = TextOps.topNgrams(spark, sf)
      .select("rk", "bg", "c", "n_docs")
      .as[(Long, String, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= TextOps.TopNgrams)
    assert(rows.map(_._1).toSeq == (1L to rows.length).toSeq)
    rows.foreach { case (_, _, c, nDocs) => assert(nDocs >= 1 && nDocs <= c) }
    val tally = docs.iterator.flatMap { case (_, t) =>
      val toks = t.split(" ", -1); toks.dropRight(1).lazyZip(toks.drop(1))
        .map(_ + " " + _)
    }.foldLeft(Map.empty[String, Long]) { (m, b) =>
      m.updated(b, m.getOrElse(b, 0L) + 1L)
    }
    rows.foreach { case (_, bg, c, _) => assert(tally(bg) == c) }
    // the retained list IS the global top-K under (c DESC, bg ASC)
    val want = tally.toSeq.sortBy { case (b, c) => (-c, b) }
      .take(rows.length).map(_._1)
    assert(rows.map(_._2).toSeq == want)
  }

  test("ngramNovelty: fam >= 1, lift/grade consistent, n_big = tokens-1") {
    val rows = TextOps.ngramNovelty(spark, sf)
      .select("doc_id", "n_big", "sum_freq", "fam", "lift", "grade")
      .as[(Long, Long, Long, Double, Double, String)].collect()
    val multi = docs.filter(_._2.split(" ", -1).length >= 2)
    assert(rows.length == multi.length)
    val nBig = multi.map { case (id, t) =>
      id -> (t.split(" ", -1).length - 1).toLong
    }.toMap
    rows.foreach { case (id, n, sumFreq, fam, lift, grade) =>
      assert(n == nBig(id))
      assert(sumFreq >= n, "each bigram occurs at least once")
      assert(fam >= 1.0)
      assert((lift >= 1.0) == (grade == "common"))
    }
  }

  test("datasetCard: one row matching direct counts") {
    val r = TextOps.datasetCard(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val full = Sources.documents(spark, sf).collect()
    assert(row.getAs[Long]("n_docs") == full.length.toLong)
    assert(row.getAs[Long]("n_sources") ==
      full.map(_.getAs[String]("source")).distinct.length.toLong)
    assert(row.getAs[Long]("total_chars") ==
      full.map(_.getAs[Long]("n_chars")).sum)
    val uniq = full.map(r0 => r0.getAs[String]("text").trim.toLowerCase)
      .distinct.length.toLong
    assert(row.getAs[Long]("n_uniq_texts") == uniq)
    val dupFrac = row.getAs[Double]("dup_frac")
    assert(dupFrac >= 0.0 && dupFrac < 1.0)
  }

  test("piiScrub matches a per-row reference scrub") {
    val rows = TextOps.piiScrub(spark, sf)
      .select("doc_id", "n_hits", "scrub_len", "sig")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    val pat = TextOps.ScrubPattern.r
    var hitSomewhere = false
    docs.foreach { case (id, text) =>
      val scrubbed = pat.replaceAllIn(text, "<X>")
      val hits = pat.findAllMatchIn(text).length.toLong
      hitSomewhere ||= hits > 0
      val (_, nHits, scrubLen, sig) = rows(id)
      assert(nHits == hits, s"doc $id hit count")
      assert(scrubLen == scrubbed.length.toLong, s"doc $id scrub length")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(scrubbed.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      assert(sig == md, s"doc $id scrub digest")
    }
    assert(hitSomewhere, "dictionary should hit this corpus")
  }

  test("qualitySample: rates per grade, kept counts match a reference sampler") {
    val rows = TextOps.qualitySample(spark, sf)
      .select("grade", "n_total", "rate_ppm", "n_kept", "kept_tok")
      .as[(String, Long, Long, Long, Long)].collect()
    val rates = TextOps.QsRates.toMap
    assert(rows.map(_._1).toSet.subsetOf(rates.keySet))
    rows.foreach { case (g, total, ppm, kept, _) =>
      assert(ppm == rates(g))
      assert(kept <= total)
      if (ppm == TextOps.QsPpm) assert(kept == total, "rate 1.0 keeps all")
    }
    // totals cover the corpus; high-rate strata keep proportionally more
    assert(rows.map(_._2).sum == docs.length.toLong)
    // reference: recompute the whole per-doc decision — grade from
    // qualityScore, hash membership by evaluating h28 per doc — and
    // aggregate independently; a wrong modulus, inverted comparison or
    // rate mis-mapping fails here even when per-grade totals look sane
    val graded = TextOps.qualityScore(spark, sf)
      .select("doc_id", "grade").as[(Long, String)].collect()
    val totals = graded.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    rows.foreach { case (g, total, _, _, _) => assert(totals(g) == total) }
    val hashes = Sources.documents(spark, sf)
      .select(col("doc_id"),
        graft.engine.PortableHash.h28(concat(lit("qs_"), col("doc_id"))))
      .as[(Long, Long)].collect().toMap
    val keptRef = graded.groupBy(_._2).view.mapValues(_.count { case (id, g) =>
      hashes(id) % TextOps.QsPpm < rates(g)
    }.toLong).toMap
    rows.foreach { case (g, _, _, kept, _) =>
      assert(keptRef(g) == kept, s"grade $g kept count vs reference")
    }
  }

  test("bpeStep: pair counts match an occurrence-weighted reference") {
    val rows = TextOps.bpeStep(spark, sf)
      .select("rk", "pair", "c")
      .as[(Long, String, Long)].collect()
    assert(rows.length == TextOps.BpeTopPairs)
    assert(rows.map(_._1).toSeq == (1L to rows.length).toSeq)
    val tally = docs.iterator.flatMap(_._2.split(" ", -1))
      .flatMap(t => t.sliding(2).filter(_.length == 2))
      .foldLeft(Map.empty[String, Long]) { (m, p) =>
        m.updated(p, m.getOrElse(p, 0L) + 1L)
      }
    rows.foreach { case (_, pair, c) => assert(tally(pair) == c, pair) }
    val want = tally.toSeq.sortBy { case (p, c) => (-c, p) }
      .take(rows.length).map(_._1)
    assert(rows.map(_._2).toSeq == want)
  }

  test("bpeTrain: first merge = bpeStep argmax; merges deterministic and effective") {
    val merges = TextOps.bpeTrain(spark, sf, 8)
    assert(merges.length == 8)
    val top = TextOps.bpeStep(spark, sf)
      .select("rk", "pair").as[(Long, String)].collect()
      .find(_._1 == 1L).get._2
    assert(merges.head._1 + merges.head._2 == top,
      "first learned merge must be the bpeStep rank-1 pair")
    assert(TextOps.bpeTrain(spark, sf, 8) == merges, "training must be deterministic")
    // applying the merges shortens the segmentation of a token that
    // contains the first learned pair (guaranteed compressible)
    val pair = merges.head._1 + merges.head._2
    val freqTok = docs.iterator.flatMap(_._2.split(" ", -1))
      .find(_.contains(pair)).get
    var seg = freqTok.split("").toVector
    merges.foreach { case (a, b) =>
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < seg.length) {
        if (i + 1 < seg.length && seg(i) == a && seg(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += seg(i); i += 1 }
      }
      seg = out.result()
    }
    assert(seg.length < freqTok.length,
      s"merges should compress '$freqTok': $seg")
  }

  test("bpeEncodeToken: lowest-rank-first greedy merging, concat-preserving") {
    val rank = Seq(("a", "b"), ("ab", "ab"), ("c", "d")).zipWithIndex.toMap
    assert(TextOps.bpeEncodeToken("abab", rank) == Vector("abab"))
    assert(TextOps.bpeEncodeToken("abcd", rank) == Vector("ab", "cd"))
    // rank order decides: ("b","c") unranked, so "abc" → ["ab","c"]
    assert(TextOps.bpeEncodeToken("abc", rank) == Vector("ab", "c"))
    assert(TextOps.bpeEncodeToken("xyz", rank) == Vector("x", "y", "z"))
    assert(TextOps.bpeEncodeToken("a", rank) == Vector("a"))
    // pieces always concatenate back to the word
    for (w <- Seq("abab", "abcd", "abc", "aabbab", ""))
      assert(TextOps.bpeEncodeToken(w, rank).mkString == w)
  }

  test("bpeEncode: fertility falls monotonically with merge count") {
    val merges = TextOps.bpeTrain(spark, sf, 8)
    // zero merges: every token splits to chars → n_pieces = char count
    val base = TextOps.bpeEncode(spark, sf, Nil)
      .select("doc_id", "n_tok", "n_pieces")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val chars = docs.map { case (id, t) =>
      id -> t.split(" ", -1).map(_.length.toLong).sum }.toMap
    base.foreach { case (id, (_, np)) =>
      assert(np == chars(id), s"doc $id: $np pieces vs ${chars(id)} chars")
    }
    // more merges never increase any document's piece count
    val m4 = TextOps.bpeEncode(spark, sf, merges.take(4))
      .select("doc_id", "n_pieces").as[(Long, Long)].collect().toMap
    val m8 = TextOps.bpeEncode(spark, sf, merges)
      .select("doc_id", "n_pieces").as[(Long, Long)].collect().toMap
    m8.foreach { case (id, np8) =>
      assert(np8 <= m4(id) && m4(id) <= base(id)._2,
        s"doc $id: pieces must shrink with merges")
    }
    // at least one document actually compresses under the trained merges
    assert(m8.exists { case (id, np8) => np8 < base(id)._2 })
  }

  test("exportShards: hash-partitioned write round-trips, stats agree") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    val docs = Sources.documents(spark, sf)
    // same family as the oracle-checked stats report (the writer's
    // default is fast28; the report describes whatever family it's
    // given — agreement requires giving both the same one)
    TextOps.exportShards(docs, dir, hash = graft.engine.PortableHash.h28)
    // Hive-style shard dirs exist and the round-trip loses nothing
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    val dirs = new java.io.File(dir).list().count(_.startsWith("shard="))
    val stats = TextOps.exportShardStats(spark, sf)
      .select("shard", "n_docs")
      .as[(Long, Long)].collect()
    assert(dirs == stats.length, "one directory per occupied shard")
    assert(stats.map(_._2).sum == docs.count())
    // written shard assignment matches the stats query's definition
    val byShard = back.groupBy("shard").count()
      .as[(Long, Long)].collect().toMap
    stats.foreach { case (sh, n) => assert(byShard(sh) == n) }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("exportShards: fast28 default round-trips losslessly and stays sharded") {
    val dir = java.nio.file.Files.createTempDirectory("shards28").toString
    val docs = Sources.documents(spark, sf)
    TextOps.exportShards(docs, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    assert(back.select("doc_id").exceptAll(docs.select("doc_id")).count() == 0)
    val dirs = new java.io.File(dir).list().count(_.startsWith("shard="))
    assert(dirs > 1 && dirs <= TextOps.NumShards)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("int8Quant: codes in range, zero error on degenerate dims, exact sums") {
    val rows = Similarity.int8Quant(spark, sf)
      .select("vec_id", "code_sum", "err6_sum")
      .as[(Long, Long, Long)].collect()
    val vecs = Sources.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    assert(rows.length == vecs.length)
    // reference quantizer per vector
    val dims = (0 until 64).map { p =>
      val xs = vecs.map(_._2(p)); (xs.min, xs.max)
    }
    val byId = vecs.toMap
    rows.foreach { case (id, codeSum, err6Sum) =>
      val v = byId(id)
      val codes = (0 until 64).map { p =>
        val (mn, mx) = dims(p)
        if (mx > mn) math.min(255L, math.floor((v(p) - mn) * 255.0 / (mx - mn)).toLong)
        else 0L
      }
      assert(codes.forall(c => c >= 0 && c <= 255))
      assert(codeSum == codes.sum, s"vec $id code checksum")
      val err6 = (0 until 64).map { p =>
        val (mn, mx) = dims(p)
        math.floor(math.abs(v(p) - (mn + codes(p) * (mx - mn) / 255)) *
          Similarity.KmeansFixedPoint).toLong
      }.sum
      assert(err6Sum == err6, s"vec $id reconstruction error")
      // max per-component error is one cell width: (mx-mn)/255
      val worst = dims.map { case (mn, mx) => (mx - mn) / 255 }.max
      assert(err6Sum <= 64 * worst * Similarity.KmeansFixedPoint + 64)
    }
  }

  test("dimStats: 64 rows, exact fixed-point means inside [mn, mx]") {
    val rows = Similarity.dimStats(spark, sf)
      .select("pos", "n", "sq", "mn", "mx", "m6")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(rows.map(_._1).toSeq == (1L to 64L).toSeq)
    val vecs = Sources.embeddings(spark, sf)
      .select(col("embedding").cast("array<double>"))
      .as[Seq[Double]].collect()
    val fp = Similarity.KmeansFixedPoint
    rows.foreach { case (pos, n, sq, mn, mx, m6) =>
      assert(n == vecs.length.toLong)
      val xs = vecs.map(_(pos.toInt - 1))
      assert(mn == xs.min && mx == xs.max)
      assert(sq == xs.map(x => math.floor(x * fp).toLong).sum)
      // fixed-point quantization floors each component by < 1/fp
      assert(m6 >= mn - 1.0 / fp && m6 <= mx)
    }
  }
}
