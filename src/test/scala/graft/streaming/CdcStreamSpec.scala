package graft.streaming

import graft.etl.TestSpark
import graft.ops.{Events, Tables}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The stateful streaming CDC materialization must agree with the batch
  * rank-then-filter compaction (e17) on the same static changelog. */
class CdcStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  private def e17: Set[(Long, Long, Long, Double)] =
    Events.queries("e17_cdc_merge")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet

  test("flatMapGroupsWithState compaction matches batch e17") {
    val streamed = CdcStream.runAvailableNow(spark, sf, "cdc_spec_sink")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed.nonEmpty)
    assert(streamed == e17)
  }

  test("compaction also runs as a plain batch Dataset operation, tombstones erase") {
    val batchDs = CdcStream.compact(Tables.events(spark, sf))
      .collect().map(c => (c.user_id, c.last_event_id, c.last_us, c.last_value))
      .toSet
    assert(batchDs == e17)
    // some key must be missing entirely (trailing tombstone), else the
    // delete path is untested on this data
    val allUsers = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(batchDs.size < allUsers, "no key ended on a tombstone")
  }
}
