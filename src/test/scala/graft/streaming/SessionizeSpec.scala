package graft.streaming

import graft.etl.TestSpark
import graft.ops.{Events, Tables}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The stateful-streaming sessionizer must agree with the batch
  * window-function sessionization (e02) on the same static input. */
class SessionizeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  test("flatMapGroupsWithState sessionize matches batch e02") {
    val streamed = Sessionize.runAvailableNow(spark, sf, "sess_spec_sink")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Events.queries("e02_sessionize")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("sessionize also runs as a plain batch Dataset operation") {
    val batchDs = Sessionize.sessionize(Tables.events(spark, sf))
      .collect().map(u => (u.user_id, u.n_sessions, u.n_events)).toSet
    val e02 = Events.queries("e02_sessionize")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batchDs == e02)
  }
}
