package graft

import graft.streaming.StreamOps

class FileStreamSpec extends SparkSpec {

  test("readEventStream consumes the real events parquet dir end-to-end") {
    // copy the (ns-timestamped) events parquet into a watched dir
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    graft.engine.Sources.events(spark, sf)
      .write.mode("overwrite").parquet(s"$dir/in")
    val stream = StreamOps.readEventStream(spark, s"$dir/in")
    StreamOps.runToMemory(StreamOps.hourlyCounts(stream), "fs_hourly",
      org.apache.spark.sql.streaming.OutputMode.Append)
    // append mode + watermark: rows emit only when the watermark passes,
    // so assert the stream ran and produced a table (possibly pending)
    assert(spark.table("fs_hourly").columns.contains("hour_start"))
    // complete-mode count over the same source must see all input rows
    val q = StreamOps.hourlyCounts(stream)
    val qq = q.writeStream.format("memory").queryName("fs_hourly2")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete).start()
    qq.processAllAvailable(); qq.stop()
    val total = spark.table("fs_hourly2")
      .agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
    assert(total == graft.engine.Sources.events(spark, sf).count())
  }
}
