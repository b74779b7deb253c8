package graft.streaming

import graft.etl.TestSpark
import graft.ops.Sketches
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The streaming HLL must land on bit-identical registers (hence a
  * bit-identical estimate) to the batch sketch of the same input —
  * register max is idempotent and mergeable, so micro-batching cannot
  * change the fixpoint. */
class SketchStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  test("availableNow streaming registers equal the batch sketch bit-for-bit") {
    val streamed = SketchStream.runAvailableNow(spark, sf, "hll_stream_sink")
    val streamedRegs = streamed.collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val batchRegs = Sketches.hllRegisters(
        graft.ops.Tables.documents(spark, sf).select("doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(streamedRegs == batchRegs)

    val streamedEst = Sketches.hllEstimate(streamed).collect().head.getDouble(1)
    val batchEst = Sketches.hllDistinct(
        graft.ops.Tables.documents(spark, sf).select("doc_id"), "doc_id")
      .collect().head.getDouble(1)
    assert(streamedEst == batchEst)
  }

  test("availableNow streaming AMS sketch row equals the batch Z bit-for-bit") {
    val streamed = SketchStream.runAmsAvailableNow(spark, sf, "ams_stream_sink")
      .collect().head
    val batch = Sketches.amsZ(
      graft.ops.Tables.events(spark, sf), "user_id").collect().head
    val r = Sketches.AmsR
    assert((0 until r).map(streamed.getLong) == (0 until r).map(batch.getLong),
      "streamed AMS atoms must equal the batch sketch")
    // linearity across the stream/batch seam: a standing batch Z plus
    // the streamed delta Z is the Z of the union — priced without
    // touching either input again
    import spark.implicits._
    val zs = Sketches.amsZ(graft.ops.Tables.events(spark, sf)
      .unionByName(graft.ops.Tables.events(spark, sf)), "user_id")
      .collect().head
    assert((0 until r).map(i => 2 * batch.getLong(i)) ==
      (0 until r).map(zs.getLong))
  }

  test("availableNow sliding-HLL readout equals batch x12 bit-for-bit") {
    val streamed = SketchStream
      .runSlidingHllAvailableNow(spark, sf, "sliding_hll_sink")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val batch = Sketches.hllSlidingDistinct(
        graft.ops.Tables.events(spark, sf), "ts", "user_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("availableNow streaming CMS cells equal the batch sketch bit-for-bit") {
    val streamed = SketchStream.runCmsAvailableNow(spark, sf, "cms_stream_sink")
    val streamedCells = streamed.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batchCells = Sketches.cmsCells(
        graft.ops.Tables.documents(spark, sf), "text")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamedCells == batchCells)
    // and the probe read-out over the streamed cells matches batch x02
    val streamedEst = Sketches.cmsProbe(streamed, graft.ops.TextOps.Stopwords)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batchEst = Sketches.cmsFrequencies(
        graft.ops.Tables.documents(spark, sf), "text", graft.ops.TextOps.Stopwords)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamedEst == batchEst)
  }
}
