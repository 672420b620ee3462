package graft

import java.sql.Timestamp
import graft.engine.{Events, TextOps}

/** Unit tests for sequence-pattern matching, the A/B z read-out,
  * day-grain rolling windows, and quantile binning. */
class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._

  private def eventsDir(rows: Seq[(Long, Timestamp, Long, String, Double, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("anly").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  private def ts(day: Int, h: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  test("seqPattern: journey is ordered by time, regex flags conversion") {
    val dir = eventsDir(Seq(
      // user 1: view → error → purchase (converted, 1 error)
      (3L, ts(1, 3), 1L, "purchase", 1.0, "{}"),
      (1L, ts(1, 1), 1L, "view", 1.0, "{}"),
      (2L, ts(1, 2), 1L, "error", 1.0, "{}"),
      // user 2: purchase then view — NOT converted (order matters)
      (4L, ts(1, 1), 2L, "purchase", 1.0, "{}"),
      (5L, ts(1, 2), 2L, "view", 1.0, "{}")))
    val got = Events.seqPattern(spark, dir)
      .as[(Long, Long, String, Boolean, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, "vep", true, 1L, false),
      (2L, 2L, "pv", false, 0L, false)))
  }

  test("seqPattern: hot user's journey is capped at SeqPatternMaxEvents") {
    val n = Events.SeqPatternMaxEvents + 44
    // hot user 1: n sequential views, then a purchase AFTER the cap —
    // the journey must stop at the cap and the late purchase must NOT
    // flip `converted`; cold user 2 is untouched by the cap
    val hot = (1 to n).map { i =>
      (i.toLong, new Timestamp(86400000L + i * 60000L), 1L, "view", 1.0, "{}")
    } :+ ((n + 1).toLong, new Timestamp(86400000L + (n + 1) * 60000L),
      1L, "purchase", 1.0, "{}")
    val dir = eventsDir(hot :+ ((9000L, ts(1, 1), 2L, "view", 1.0, "{}")))
    val got = Events.seqPattern(spark, dir)
      .as[(Long, Long, String, Boolean, Long, Boolean)].collect().toSeq
    val u1 = got.find(_._1 == 1L).get
    assert(u1._2 == Events.SeqPatternMaxEvents.toLong)
    assert(u1._3 == "v" * Events.SeqPatternMaxEvents)
    assert(!u1._4, "purchase beyond the cap must not count as converted")
    assert(u1._6, "truncated journey must carry the capped flag")
    val u2 = got.find(_._1 == 2L).get
    assert(u2._2 == 1L)
    assert(!u2._6, "complete journey must not be flagged capped")
  }

  test("seqPattern: one-timestamp pile-up straddling the cap cuts by event_id") {
    val cap = Events.SeqPatternMaxEvents
    val t = ts(1, 1)
    // cap+4 events ALL on one timestamp: rn is decided purely by the
    // event_id tie-break. The only purchase sits at event_id cap+1 —
    // rn=cap+1, exactly the probe row — so converted stays false,
    // n_events stays cap, and capped flips true.
    val rows = (1 to cap + 4).map { i =>
      (i.toLong, t, 1L, if (i == cap + 1) "purchase" else "view", 1.0, "{}")
    }
    val got = Events.seqPattern(spark, eventsDir(rows))
      .as[(Long, Long, String, Boolean, Long, Boolean)].collect().toSeq
    assert(got == Seq((1L, cap.toLong, "v" * cap, false, 0L, true)))
  }

  test("seqPattern: purchase exactly AT the cap converts; no flag at exactly cap events") {
    val cap = Events.SeqPatternMaxEvents
    val rows = (1 to cap).map { i =>
      (i.toLong, new Timestamp(86400000L + i * 1000L), 1L,
        if (i == cap) "purchase" else "view", 1.0, "{}")
    }
    val got = Events.seqPattern(spark, eventsDir(rows))
      .as[(Long, Long, String, Boolean, Long, Boolean)].collect().toSeq
    assert(got == Seq((1L, cap.toLong, "v" * (cap - 1) + "p", true, 0L, false)))
  }

  test("seqPattern: same-timestamp ties break by event_id") {
    val t = ts(1, 1)
    val dir = eventsDir(Seq(
      (2L, t, 1L, "purchase", 1.0, "{}"),
      (1L, t, 1L, "view", 1.0, "{}")))
    val got = Events.seqPattern(spark, dir)
      .as[(Long, Long, String, Boolean, Long, Boolean)].collect().toSeq
    assert(got.head._3 == "vp")
    assert(got.head._4)
    assert(!got.head._6)
  }

  test("abTest: hand-computed z on a constructed split") {
    // 4 users: 0,2 (variant 0) and 1,3 (variant 1); conversion needs
    // >= AbConvMin purchases, so give user 1 exactly that many and the
    // rest none — c0=0, c1=1
    val buys = (1 to Events.AbConvMin.toInt).map { i =>
      (100L + i, ts(2, i % 24), 1L, "purchase", 1.0, "{}")
    }
    val views = Seq(0L, 1L, 2L, 3L).map { u =>
      (u + 1, ts(1, 1), u, "view", 1.0, "{}")
    }
    val dir = eventsDir(views ++ buys)
    val got = Events.abTest(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    val (n0, c0, n1, c1, p0, p1, z6) = got
    assert((n0, c0, n1, c1) == (2L, 0L, 2L, 1L))
    assert(p0 == 0L && p1 == 500000L)
    // z = (0.5 - 0) / sqrt(0.25*0.75*(1/2+1/2)) = 0.5/sqrt(0.1875)
    val z = 0.5 / math.sqrt(0.25 * 0.75 * 1.0)
    assert(z6 == math.floor(z * 1e6).toLong, s"z6=$z6 expected≈${z * 1e6}")
  }

  test("abTest: all-or-none conversion pins z to 0") {
    val dir = eventsDir(Seq(
      (1L, ts(1, 1), 0L, "view", 1.0, "{}"),
      (2L, ts(1, 1), 1L, "view", 1.0, "{}")))
    val got = Events.abTest(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(got._7 == 0L)
  }

  test("abTest: an empty variant yields zeros, not a division error") {
    val dir = eventsDir(Seq(
      (1L, ts(1, 1), 2L, "view", 1.0, "{}"))) // one even-id user only
    val got = Events.abTest(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(got == ((1L, 0L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("rolling7d: trailing window sums the last 7 days only") {
    // one event per day for 10 consecutive days
    val dir = eventsDir((1 to 10).map { d =>
      (d.toLong, ts(d, 0), 1L, "view", 1.0, "{}")
    })
    val got = Events.rolling7d(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.length == 10)
    // day k (1-based): ev_7d = min(k, 7), ev_cum = k
    got.zipWithIndex.foreach { case ((_, n, u, ev7, cum), i) =>
      assert(n == 1L && u == 1L)
      assert(ev7 == math.min(i + 1, 7).toLong, s"day $i ev_7d=$ev7")
      assert(cum == (i + 1).toLong)
    }
  }

  test("skyline: dominated orders drop, frontier and exact ties survive") {
    val dir = java.nio.file.Files.createTempDirectory("sky").toString
    Seq(
      // (key, price, date): 1 dominates 2 (cheaper, earlier);
      // 3 survives (earliest among expensive); 4 exact-ties 1 — kept;
      // 5 same price as 1 but later — dominated
      (1L, 10L, "2024-01-05"), (2L, 20L, "2024-01-06"),
      (3L, 20L, "2024-01-01"), (4L, 10L, "2024-01-05"),
      (5L, 10L, "2024-01-07"))
      .map { case (k, p, dt) =>
        (k, 1L, "O", p.toDouble, Timestamp.valueOf(dt + " 00:00:00"), "P1")
      }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    val got = graft.engine.Relational.skyline(spark, dir)
      .as[(String, Long, Long, Long)].collect().map(_._2).toSet
    assert(got == Set(1L, 3L, 4L), s"frontier keys: $got")
  }

  test("ttcHist: gap measured first-view to first-purchase-after only") {
    val dir = eventsDir(Seq(
      // user 1: purchase BEFORE first view is ignored; the qualifying
      // purchase is 2h after the first view
      (1L, ts(1, 0), 1L, "purchase", 1.0, "{}"),
      (2L, ts(1, 3), 1L, "view", 1.0, "{}"),
      (3L, ts(1, 5), 1L, "purchase", 1.0, "{}"),
      // user 2: views but never purchases — contributes nothing
      (4L, ts(1, 1), 2L, "view", 1.0, "{}")))
    val got = Events.ttcHist(spark, dir)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((2L, 1L)))
  }

  test("volumeSpike: flags the planted anomaly day; constant series pin to 0") {
    // 'view': 1/day for 9 days then 10 on day 10 (the spike);
    // 'click': exactly 2 every day (zero variance → z6 = 0)
    val views = (1 to 9).map(dd => (dd.toLong, ts(dd, 0), 1L, "view", 1.0, "{}")) ++
      (0 until 10).map(i => (100L + i, ts(10, i), 1L, "view", 1.0, "{}"))
    val clicks = (1 to 10).flatMap(dd => Seq(
      (200L + dd, ts(dd, 1), 1L, "click", 1.0, "{}"),
      (300L + dd, ts(dd, 2), 1L, "click", 1.0, "{}")))
    val dir = eventsDir(views ++ clicks)
    val got = Events.volumeSpike(spark, dir)
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    val (vDay, vC, vZ) = got("view")
    assert(vC == 10L, s"spike count $vC")
    // mean 1.9, std sqrt((119-36.1)/9)=sqrt(9.2111); z=(10-1.9)/3.035≈2.669
    assert(vZ > 2000000L && vZ < 3500000L, s"z6=$vZ")
    assert(got("click")._3 == 0L)
    // the spike day is the 10th distinct day of the view series
    val viewDays = views.map(_._2.getTime / 86400000L).distinct.sorted
    assert(vDay == viewDays.last)
  }

  test("quantileBins: bins are equal-frequency and ordered") {
    val dir = java.nio.file.Files.createTempDirectory("qbins").toString
    // 20 docs in one source, n_chars = 1..20 → 10 bins of exactly 2
    (1L to 20L).map(i => (i, "x", "en", "s0", i))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = TextOps.quantileBins(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.length == 10)
    assert(got.forall(_._3 == 2L))
    // bins partition the value range in order: bin k holds {2k-1, 2k}
    got.zipWithIndex.foreach { case ((_, bin, _, lo, hi, tot), i) =>
      assert(bin == (i + 1).toLong)
      assert(lo == 2L * i + 1 && hi == 2L * i + 2 && tot == lo + hi)
    }
  }
}
