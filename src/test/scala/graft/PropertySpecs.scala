package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.engine.{AsOfJoin, Mutations, TextOps}

/** Randomized properties (ScalaCheck) for the algebraic operators —
  * SURVEY.md §5.3. Spark work per case is tiny; case counts are kept
  * low since each evaluation runs real jobs. */
object PropertySpecs extends Properties("graft") {

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val rowsGen: Gen[List[(Long, Long)]] = Gen.listOfN(12,
    Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 20L)))

  /** asofLatest == naive per-row "latest right at-or-before" reference. */
  property("asofLatest matches the naive inequality-join reference") =
    forAll(rowsGen, rowsGen) { (ls, rs) =>
      val lefts = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val rights = rs.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val expected = lefts.map { case (id, k, t) =>
        val cand = rights.filter(r => r._2 == k && r._3 <= t)
        // max (time, rid) — the operator's documented tie-break
        id -> (if (cand.isEmpty) -1L else cand.maxBy(r => (r._3, r._1))._1)
      }.toMap
      val got = AsOfJoin.asofLatest(
          lefts.toDF("id", "k", "t"), rights.toDF("rid", "k", "t"),
          "k", "k", "t", "t", Seq("rid"), Seq("rid"))
        .select("id", "rid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
      Prop(got == expected) :| s"got=$got expected=$expected"
    }

  private val kvGen: Gen[List[(Long, Long)]] = Gen.listOfN(10,
    Gen.zip(Gen.choose(1L, 8L), Gen.choose(0L, 100L)))

  /** upsert post-image keyset = target keys ∪ update keys; matched rows
    * take update values. */
  property("upsert keyset is the union; update values win") =
    forAll(kvGen, kvGen) { (ts, us) =>
      val target = ts.distinctBy(_._1).toDF("k", "v")
      val updates = us.distinctBy(_._1).toDF("k", "v")
      val out = Mutations.upsert(target, updates, Seq("k"))
        .as[(Long, Long)].collect().toMap
      val tm = ts.distinctBy(_._1).toMap
      val um = us.distinctBy(_._1).toMap
      Prop(out.keySet == tm.keySet.union(um.keySet) &&
        um.forall { case (k, v) => out(k) == v } &&
        (tm.keySet -- um.keySet).forall(k => out(k) == tm(k)))
    }

  /** applyUpdates is idempotent for any update set. */
  private val docsGen: Gen[List[String]] = Gen.listOfN(6,
    Gen.listOfN(8, Gen.oneOf("a", "b", "c", "d", "e")).map(_.mkString(" ")))

  /** The stateless (array-HOF) signature equals the explode + groupBy
    * formulation it replaced — same minima over the same multiset. */
  property("stateless minhash signature == explode/groupBy signature") =
    forAll(docsGen) { texts =>
      import org.apache.spark.sql.functions._
      import graft.engine.{PortableHash, TextOps}
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val sets = TextOps.shingleSets(docs)
      // both hash families must agree with their explode/groupBy twin
      val props = Seq[(String, org.apache.spark.sql.Column => org.apache.spark.sql.Column)](
        "h28" -> PortableHash.h28, "fast28" -> PortableHash.fast28
      ).map { case (fam, hash) =>
        val viaAgg = {
          val aggs = (0 until TextOps.NumHashes)
            .map(j => min(PortableHash.minhashJ(col("x"), j)).as(s"h$j"))
          sets.select(col("doc_id"), explode(col("s")).as("sh"))
            .withColumn("x", hash(col("sh")))
            .groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
        }
        val viaRow = TextOps.minhashSignatureFromSets(sets, hash)
        val a = viaAgg.collect().map(_.toSeq).toSet
        val b = viaRow.collect().map(_.toSeq).toSet
        Prop(a == b) :| s"family=$fam agg=$a row=$b"
      }
      props.reduce(_ && _)
    }

  private val docGen: Gen[List[(Long, String)]] = Gen.listOfN(5,
    Gen.zip(Gen.choose(1L, 1000L),
      Gen.choose(1, 150).flatMap(n =>
        Gen.listOfN(n, Gen.choose(0, 40).map(i => s"t$i"))
          .map(_.mkString(" ")))))

  /** Fixed-window chunks tile the token stream: ids dense from 0, each
    * chunk's length matches the window/stride geometry, every token
    * covered. */
  property("chunkSigs geometry covers every token") =
    forAll(docGen) { ds =>
      val docs = ds.distinctBy(_._1)
      val out = TextOps.chunkSigs(docs.toDF("doc_id", "text"))
        .select("doc_id", "chunk_id", "n_tok_chunk")
        .as[(Long, Long, Long)].collect().groupBy(_._1)
      val toks = docs.map { case (id, t) => id -> t.split(" ", -1).length }.toMap
      Prop(docs.forall { case (id, _) =>
        val n = toks(id).toLong
        val chunks = out(id).sortBy(_._2)
        val lastStart = (n - 1) / TextOps.ChunkStride * TextOps.ChunkStride
        chunks.map(_._2).toSeq == (0L to lastStart / TextOps.ChunkStride) &&
          chunks.forall { case (_, cid, len) =>
            len == math.min(TextOps.ChunkSize.toLong,
              n - cid * TextOps.ChunkStride) }
      })
    }

  /** CDC chunks partition the token stream exactly (lengths sum to
    * n_tok, all positive). */
  property("cdcChunkSigs partitions the token stream") =
    forAll(docGen) { ds =>
      val docs = ds.distinctBy(_._1)
      val out = TextOps.cdcChunkSigs(docs.toDF("doc_id", "text"))
        .select("doc_id", "n_tok_chunk").as[(Long, Long)].collect()
        .groupBy(_._1)
      val toks = docs.map { case (id, t) => id -> t.split(" ", -1).length }.toMap
      Prop(docs.forall { case (id, _) =>
        val lens = out(id).map(_._2)
        lens.sum == toks(id).toLong && lens.forall(_ > 0)
      })
    }

  property("applyUpdates twice == once") =
    forAll(kvGen, kvGen) { (ts, us) =>
      val target = ts.distinctBy(_._1).toDF("k", "v")
      val updates = us.distinctBy(_._1).toDF("k", "v")
      val once = Mutations.applyUpdates(target, updates, Seq("k"))
        .as[(Long, Long)].collect().sorted.toSeq
      val twice = Mutations.applyUpdates(
          Mutations.applyUpdates(target, updates, Seq("k")), updates, Seq("k"))
        .as[(Long, Long)].collect().sorted.toSeq
      Prop(once == twice)
    }

  /** seqPattern == a literal Scala reference of its documented
    * semantics — per user: drop null-ts events, sort by (us,
    * event_id coalesced to MaxValue, type-initial coalesced to ""),
    * keep the first SeqPatternMaxEvents, then journey/regex/count.
    * Cases are sized to land on BOTH sides of the cap (a hot user up
    * to ~1.2× the cap), so the truncation itself is exercised, not
    * just the no-op regime. Ties on (us, event_id) with different
    * types are generated too — but with event_id unique per row the
    * (us, event_id) key is total, matching the determinism contract. */
  property("seqPattern matches the capped sort-collapse reference") =
    forAll(
      Gen.choose(0, graft.engine.Events.SeqPatternMaxEvents + 50),
      Gen.choose(2L, 3L),
      Gen.listOfN(25, Gen.zip(Gen.choose(0, 10), // coarse us: forces ties
        Gen.oneOf(Some("view"), Some("purchase"), Some("error"), None)))) {
      (hotN, coldUid, coldEvs) =>
      val base = 1700000000000L // ms
      // hot user 1: hotN dated view events + one final purchase
      val hot = (0 until hotN).map { i =>
        (i.toLong, Some(base + i * 60000L), 1L, Some("view"))
      } :+ ((hotN.toLong, Some(base + hotN * 60000L), 1L, Some("purchase")))
      // cold user: few events, tied timestamps, null types, one null ts
      val cold = coldEvs.zipWithIndex.map { case ((m, et), i) =>
        ((1000 + i).toLong, Some(base + m * 60000L), coldUid, et)
      } :+ ((2000L, Option.empty[Long], coldUid, Some("view")))
      val all = hot ++ cold
      val dir = java.nio.file.Files.createTempDirectory("seqprop").toString
      all.map { case (eid, ts, uid, et) =>
        (eid, ts.map(new java.sql.Timestamp(_)).orNull, uid, et.orNull,
          1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      val expected = all.filter(_._2.isDefined).groupBy(_._3).map {
        case (uid, evs) =>
          val cap = graft.engine.Events.SeqPatternMaxEvents
          val dated = evs.map { case (eid, ts, _, et) =>
            (ts.get * 1000L, eid, et.map(_.take(1)).getOrElse(""))
          }.sortBy(identity)
          val kept = dated.take(cap)
          val j = kept.map(_._3).mkString
          (uid, (kept.size.toLong, j,
            "v.*p".r.findFirstIn(j).isDefined, j.count(_ == 'e').toLong,
            dated.size > cap))
      }
      val got = graft.engine.Events.seqPattern(spark, dir)
        .as[(Long, Long, String, Boolean, Long, Boolean)].collect()
        .map(t => t._1 -> ((t._2, t._3, t._4, t._5, t._6))).toMap
      Prop(got == expected) :| s"got=$got expected=$expected"
    }

  /** rankedCum == the single global window it replaces, on arbitrary
    * inputs (including empty, single-row, heavily tied values, and
    * sizes straddling partition counts) — the r7 persist/pid-alignment
    * rework must never change values, only execution shape. The sort
    * key (id) is unique, per the operator's tie-free contract. */
  property("rankedCum matches the global-window rank/cumsum reference") =
    forAll(Gen.choose(0, 40).flatMap(n =>
        Gen.listOfN(n, Gen.choose(-5L, 5L)))) { vs =>
      import org.apache.spark.sql.functions._
      val rows = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val df = rows.toDF("id", "v")
      val got = graft.engine.Layout
        .rankedCum(df, Seq(col("id")), col("v"), parts = 4)
        .select("id", "r", "cum", "n_rows")
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      spark.catalog.clearCache() // rankedCum persists its ranged frame
      val expected = rows.sortBy(_._1).zipWithIndex.map {
        case ((id, _), i) =>
          (id, (i + 1).toLong, rows.sortBy(_._1).take(i + 1).map(_._2).sum,
            rows.size.toLong)
      }
      Prop(got == expected) :| s"got=$got expected=$expected"
    }
}
