package graft.engine

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Extraction-progress observability, the Spark analog of the reference's
  * per-chunk progress callback (`sql.py:146-156` reports cumulative rows
  * and MB after each fetched chunk).
  *
  * Chunks are partitions here, so the natural boundary is task
  * completion: a [[SparkListener]] accumulates records/bytes read and
  * invokes the callback — same contract (cumulative rows, cumulative
  * bytes), but fed by every executor instead of a single fetch loop.
  */
final class ProgressReporter(callback: (Long, Long) => Unit) extends SparkListener {
  private val rows = new AtomicLong(0)
  private val bytes = new AtomicLong(0)

  def totalRows: Long = rows.get()
  def totalBytes: Long = bytes.get()

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      val r = rows.addAndGet(m.inputMetrics.recordsRead)
      val b = bytes.addAndGet(m.inputMetrics.bytesRead)
      if (m.inputMetrics.recordsRead > 0) callback(r, b)
    }
  }
}

object ProgressReporter {

  /** Run `body` with a progress listener attached; detach afterwards.
    * Returns (result, rowsRead, bytesRead). */
  def withProgress[T](spark: SparkSession)(callback: (Long, Long) => Unit)(
      body: => T): (T, Long, Long) = {
    val rep = new ProgressReporter(callback)
    spark.sparkContext.addSparkListener(rep)
    try {
      val out = body
      // listener bus is async; give queued task-end events a beat to drain
      val deadline = System.nanoTime() + 5000000000L
      while (System.nanoTime() < deadline && rep.totalRows == 0) Thread.sleep(20)
      (out, rep.totalRows, rep.totalBytes)
    } finally spark.sparkContext.removeSparkListener(rep)
  }
}
