package graft.streaming

import graft.etl.TestSpark
import graft.ops.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming ≡ batch on the same static input: the tumbling
  * window aggregation must produce identical (window, type, count) rows
  * whether run as an availableNow stream or a batch query. */
class EventStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  test("availableNow stream matches batch hourly counts") {
    val streamed = EventStream.runAvailableNow(spark, sf, "es_spec_sink")
      .select("hour_epoch", "event_type", "n_events")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").cast("long"), col("event_type"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("availableNow native session windows match the e10 batch query") {
    val streamed = EventStream.runSessionsAvailableNow(spark, sf, "es_sess_sink")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    val batch = graft.ops.Events.queries("e10_session_window")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }
}
