package graft

import graft.engine.{InMemoryRefreshHook, Log}

class RefreshHookSpec extends SparkSpec {

  test("refresh triggers when last status is terminal") {
    val h = new InMemoryRefreshHook("Completed")
    assert(h.refresh().get)
    assert(h.triggered == 1)
  }

  test("refresh is idempotent while in progress (pbi.py:177-183 guard)") {
    val h = new InMemoryRefreshHook("Completed")
    assert(h.refresh().get)        // → Unknown (in progress)
    assert(!h.refresh().get)       // guarded: skipped
    assert(h.triggered == 1)
    h.complete(ok = true)          // → Completed
    assert(h.refresh().get)
    assert(h.triggered == 2)
  }

  test("refreshHistoryFrame ingests the REST payload's value array (pbi.py:89-119)") {
    val payload =
      """{"value": [
        |  {"requestId": "r1", "status": "Completed", "refreshType": "ViaApi"},
        |  {"requestId": "r2", "status": "Failed", "refreshType": "Scheduled"}
        |]}""".stripMargin
    val df = graft.engine.RefreshHook.refreshHistoryFrame(spark, payload)
    assert(df.count() == 2)
    assert(df.columns.sorted.toSeq == Seq("refreshType", "requestId", "status"))
    assert(df.filter(org.apache.spark.sql.functions.col("status") === "Failed")
      .count() == 1)
  }

  test("log color map covers the reference's five statuses (log.py:17-29)") {
    Seq("regular", "fail", "success", "warning", "info").foreach { st =>
      Log(s"msg-$st", st).printMessage() // must not throw
    }
    Log("detail", "info").printMessage("extra detail")
  }
}
