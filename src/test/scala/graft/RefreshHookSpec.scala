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

  test("log color map covers the reference's five statuses (log.py:17-29)") {
    Seq("regular", "fail", "success", "warning", "info").foreach { st =>
      Log(s"msg-$st", st).printMessage() // must not throw
    }
    Log("detail", "info").printMessage("extra detail")
  }
}
