package graft.streaming

import graft.etl.TestSpark
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval join ≡ the batch interval join (e09) on the
  * same static input — the stream≡batch contract every operator in
  * `streaming/` pins. */
class JoinStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  test("availableNow stream-stream join matches the batch interval join") {
    val streamed = JoinStream.runAvailableNow(spark, sf, "js_spec_sink")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    val batch = graft.ops.Events.queries("e09_interval_join")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    assert(batch.nonEmpty, "fixture must produce at least one attribution")
    assert(streamed == batch)
  }
}
