package graft.streaming

import graft.etl.TestSpark
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Watermark semantics pin: an event arriving AFTER the watermark has
  * passed its window must be dropped, not double-counted — the
  * exactly-once-per-window contract the 2-hour watermark in
  * [[EventStream.hourlyCounts]] buys, and the reason its state store
  * stays O(active windows) instead of growing forever. */
class WatermarkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  test("an event later than the watermark is dropped from its closed window") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, Long, String, Double, String)]
    // hourlyCounts expects the µs-TimestampType `ts` readEvents yields
    val out = EventStream.hourlyCounts(input.toDF()
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.col("ts"))))
      .writeStream.outputMode("append")
      .format("memory").queryName("late_sink").start()
    try {
      val h = 3600L * 1000 * 1000 // one hour in micros
      val t0 = 1000000L * h       // an aligned hour
      // batch 1: one event in the t0 window, one 10h later — the
      // watermark advances to t0+8h, far past the t0 window's close
      input.addData((1L, t0, 1L, "click", 1.0, ""),
        (2L, t0 + 10 * h, 1L, "click", 1.0, ""))
      out.processAllAvailable()
      // batch 2: a LATE event for the t0 window (3 — beyond the
      // watermark, must be dropped) plus a fresh one to keep advancing
      input.addData((3L, t0 + 1000L, 1L, "click", 1.0, ""),
        (4L, t0 + 11 * h, 1L, "click", 1.0, ""))
      out.processAllAvailable()
      input.addData((5L, t0 + 13 * h, 1L, "click", 1.0, ""))
      out.processAllAvailable()
      val counts = spark.table("late_sink").collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      val t0Epoch = t0 / (1000L * 1000)
      assert(counts.get(t0Epoch).contains(1L),
        s"the closed t0 window must count only the on-time event: $counts")
    } finally out.stop()
  }
}
